package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic uniform k-sample per group — "take 10k docs per language
  * for the eval set". Membership is a pure function of (id, salt): the
  * kept rows are exactly the k smallest (salted-md5 bucket, id) pairs per
  * group, so re-running, re-sharding, or growing other groups never
  * changes a group's sample (same leakage-safety contract as [[Splits]]).
  *
  * The naive plan — `row_number` over a per-group window ordered by the
  * hash — serializes every group through ONE task: a hot group (80 % of a
  * crawl in one language) becomes the straggler. This implementation
  * splits the selection:
  *
  *   1. bucket every row (`buckets` salted-md5 bins) and aggregate a
  *      (group × bucket) histogram — map-side combined, bounded output;
  *   2. per group, choose the threshold bucket where the cumulative count
  *      reaches k — computed DISTRIBUTIVELY on the aggregated histogram
  *      (a per-group running sum over ≤ `buckets` rows each), reduced to
  *      one (group, threshold, boundary-take) row per group;
  *   3. the plan table is collected (bounded: `limit(maxGroups + 1)`
  *      caps the transfer BEFORE it reaches the driver, and an
  *      over-cardinality group column fails loudly instead of OOMing)
  *      and broadcast-joined back — a flat plan at any group count, in
  *      contrast to inlining per-group literals, which blows Catalyst's
  *      expression-tree/codegen limits near 10³–10⁴ groups;
  *   4. every row strictly under its group's threshold bucket is kept
  *      outright with a plain filter (no window anywhere); only the
  *      BOUNDARY bucket's rows (≈ groupSize/buckets of the group) go
  *      through the per-group ranking window to take the remainder — the
  *      hot group's window input shrinks by the bucket factor.
  *
  * Result is EXACTLY the k smallest (bucket, id) per group — byte-equal
  * to the naive window formulation, which is what the DuckDB oracle runs.
  * Rows with a NULL group are excluded (a sample of "no group" is
  * meaningless; filter upstream if needed).
  */
object GroupSample {

  def sampleKPerGroup(docs: DataFrame, idCol: String, groupCol: String,
      k: Int, salt: String, buckets: Int = 4096,
      maxGroups: Int = 10000): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(buckets > 1, s"buckets=$buckets must be > 1")
    require(maxGroups > 0, s"maxGroups=$maxGroups must be positive")
    val reserved = Seq("_sb", "_rn", "_gsg", "_thr", "_take")
    val clash = docs.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"column names ${clash.mkString(",")} are reserved by GroupSample")
    val withB = docs.filter(col(groupCol).isNotNull)
      .withColumn("_sb", Splits.bucket(col(idCol), salt, buckets))
    // (group, bucket) histogram -> per-group cumulative counts. The window
    // runs on the AGGREGATED histogram (≤ buckets rows per group), never
    // on the data itself.
    val hist = withB.groupBy(col(groupCol).as("_gsg"), col("_sb"))
      .agg(count(lit(1)).as("_c"))
    val cum = hist.withColumn("_cum",
      sum("_c").over(Window.partitionBy("_gsg").orderBy("_sb")))
    // per group: first bucket whose cumulative count reaches k (struct-min
    // => smallest bucket; _cum - _c = count strictly below it), or "keep
    // everything" (threshold past the last bucket) when the group has <= k
    // rows in total
    val planDf = cum.groupBy("_gsg").agg(
        min(when(col("_cum") >= k,
          struct(col("_sb").as("b"), (col("_cum") - col("_c")).as("cb"))))
          .as("_bnd"),
        max(col("_cum")).as("_total"))
      .select(col("_gsg"),
        when(col("_total") <= k, lit(buckets.toLong))
          .otherwise(col("_bnd.b")).as("_thr"),
        when(col("_total") <= k, lit(0L))
          .otherwise(lit(k.toLong) - col("_bnd.cb")).as("_take"))
    // bounded control-plane collect: limit() caps the driver transfer even
    // when the group column is unexpectedly high-cardinality (a URL passed
    // as the group) — fail loudly, never OOM silently
    val planRows = planDf.limit(maxGroups + 1).collect()
    require(planRows.length <= maxGroups,
      s"sampleKPerGroup: group column '$groupCol' has more than $maxGroups " +
        "distinct values — the per-group selection plan is a broadcast " +
        "control table bounded by O(groups); raise maxGroups if the " +
        "cardinality is intentional, or group on a coarser column")
    val planLit = broadcast(docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(planRows: _*), planDf.schema))
    val withP = withB.join(planLit, col(groupCol) === col("_gsg")).drop("_gsg")
    val under = withP.filter(col("_sb") < col("_thr"))
    // boundary bucket: ≈ groupSize/buckets rows per group reach the window
    val boundary = withP.filter(col("_sb") === col("_thr"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(idCol))))
      .filter(col("_rn") <= col("_take"))
      .drop("_rn")
    under.unionByName(boundary).drop("_sb", "_thr", "_take")
  }
}
