package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY.md §2 J4, the one operator row
  * deferred out of round-1 scope: attach to every left row the LATEST
  * right row with `right.ts <= left.ts` for the same key (events joined
  * to the state snapshot in force at their time).
  *
  * Spark has no ASOF JOIN operator, and the naive range join
  * (`l.ts >= r.ts` + window-max per left row) degenerates to a per-key
  * cartesian. The scalable composition (brief's preference (a): compose
  * existing ops) is the union-and-fill pattern:
  *
  *   1. union right rows (payload, marker 1) and left rows (payload null,
  *      marker 0) on (key, ts);
  *   2. one window per key ordered by (ts, marker DESC) — marker DESC puts
  *      a same-timestamp right row BEFORE the left rows it must be visible
  *      to, giving `<=` semantics exactly;
  *   3. `last(payload, ignoreNulls)` over unbounded-preceding rows carries
  *      the latest snapshot forward; keep the left rows.
  *
  * One shuffle + one in-partition sort over |left| + |right| rows — no
  * row-pair blowup, AQE-balanced across keys. A single pathological key
  * (one user holding a whole partition's events) serializes that key's
  * window task — the same bound as any per-key ordered computation; chunk
  * such keys upstream if they exist.
  *
  * `right` must be unique per (key, ts) — pre-aggregate ties (e.g.
  * `max_by` on a sequence column) or results would depend on row order;
  * the left row count is always preserved (left-outer semantics: rows
  * before any snapshot get nulls).
  */
object AsOf {

  private val Reserved = Seq("_k", "_ts", "_isq", "_q", "_l", "_last")

  /** Left-outer as-of join: every `left` row plus `rightCols` of the
    * latest `right` row with `right.ts <= left.ts` on `key`, each
    * renamed with `prefix` (null when no snapshot precedes). Right rows
    * with a null key or null ts match nothing (DuckDB ASOF semantics);
    * left rows are always preserved. Column names listed in [[Reserved]]
    * and prefixed output names must be free in the inputs (checked).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one payload column")
    val clash = (left.columns ++ right.columns).filter(Reserved.contains)
    require(clash.isEmpty, s"inputs use reserved column names: ${clash.mkString(",")}")
    val outClash = left.columns.filter(c =>
      c != key && c != ts && rightCols.map(prefix + _).contains(c))
    require(outClash.isEmpty,
      s"left columns collide with prefixed output names: ${outClash.mkString(",")}")
    import org.apache.spark.sql.types.StructType
    // key and ts ride ONCE, as the top-level _k/_ts sort columns — only the
    // remaining left columns struct into the carried row
    val rest = left.columns.filterNot(c => c == key || c == ts).toSeq
    val qType = new StructType(
      rightCols.map(c => right.schema(c).copy(nullable = true)).toArray)
    val lType = new StructType(
      rest.map(c => left.schema(c).copy(nullable = true)).toArray)
    val r2 = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("_k"), col(ts).as("_ts"),
        lit(1).as("_isq"), struct(rightCols.map(col): _*).as("_q"),
        lit(null).cast(lType).as("_l"))
    val l2 = left.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(0).as("_isq"), lit(null).cast(qType).as("_q"),
      struct(rest.map(col): _*).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_isq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_last", last(col("_q"), ignoreNulls = true).over(w))
      .filter(col("_isq") === 0)
      .select(Seq(col("_k").as(key), col("_ts").as(ts)) ++
        rest.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_last.$c").as(prefix + c)): _*)
  }

  /** Interval (range-containment) join: one output row per (point,
    * interval) pair with the same key and `startSec <= tsSec <= endSec`
    * (inclusive bounds, epoch-second columns). The J4 "range join" leg.
    *
    * A raw range predicate would plan a per-key cartesian. The scalable
    * composition buckets time: each interval is exploded to the coarse
    * buckets it covers (`sequence` — intervals are short relative to the
    * bucket in a sessionized workload, so the fan-out is small and
    * executor-side), points carry their single bucket, and the match is a
    * plain (key, bucket) equi-join + exact containment filter. A
    * (point, interval) pair can only meet in the point's own bucket, so
    * no dedup is needed.
    *
    * Picking `bucketSec`: aim near the TYPICAL interval length (p50–p90) —
    * larger buckets mean fewer interval copies but more false-candidate
    * pairs for the filter; smaller buckets the reverse. The fan-out per
    * interval is `(end-start)/bucketSec + 1` copies, so a pathological
    * months-long interval against a seconds-scale bucket would silently
    * explode thousands of rows before the filter sees them —
    * `maxBucketsPerInterval` makes that contract explicit: any interval
    * fanning out beyond the cap fails the job loudly (executor-side
    * `raise_error`, no driver pre-scan) instead of quietly degrading the
    * join. Raise the cap or coarsen `bucketSec` if long intervals are
    * legitimate in the workload.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
      tsSec: String, startSec: String, endSec: String,
      bucketSec: Long, maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketSec > 0, s"bucketSec=$bucketSec must be positive")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval=$maxBucketsPerInterval must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet) - key
    require(shared.isEmpty,
      s"points and intervals share non-key columns (rename them): ${shared.mkString(",")}")
    require(!points.columns.contains("_b") && !intervals.columns.contains("_b"),
      "column name _b is reserved by intervalJoin")
    val b0 = floor(col(startSec) / bucketSec)
    val b1 = floor(col(endSec) / bucketSec)
    val iv = intervals
      // an inverted interval (corrupt row) would make sequence() count
      // DOWNWARD and explode |start-end|/bucket rows before the containment
      // filter rejects them all — drop it up front instead
      .filter(col(endSec) >= col(startSec))
      // fan-out guard: fail loudly on the offending ROW (cap doc above)
      .withColumn("_b",
        explode(sequence(b0,
          when(b1 - b0 < maxBucketsPerInterval, b1).otherwise(raise_error(
            concat(lit(s"intervalJoin: interval covers > $maxBucketsPerInterval" +
                s" buckets of $bucketSec s (start="), col(startSec),
              lit(", end="), col(endSec),
              lit(") — coarsen bucketSec or raise maxBucketsPerInterval")))))))
    val pt = points.withColumn("_b", floor(col(tsSec) / bucketSec))
    pt.join(iv, pt(key) === iv(key) && pt("_b") === iv("_b"))
      .filter(pt(tsSec) >= iv(startSec) && pt(tsSec) <= iv(endSec))
      .drop(iv(key)).drop(pt("_b")).drop(iv("_b"))
  }
}
