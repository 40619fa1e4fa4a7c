package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
  *      (group × bucket) histogram — map-side combined, bounded output
  *      (the control-plane collect is O(groups × buckets); group
  *      cardinality is expected bounded — domains, languages — the same
  *      contract as [[Mixing]]'s rate map);
  *   2. per group, choose the threshold bucket where the cumulative count
  *      reaches k: every row UNDER it is kept outright with a plain
  *      filter (no window anywhere);
  *   3. only the BOUNDARY bucket's rows (≈ groupSize/buckets of the
  *      group) go through the per-group ranking window to take the
  *      remainder — the hot group's window input shrinks by the bucket
  *      factor.
  *
  * Result is EXACTLY the k smallest (bucket, id) per group — byte-equal
  * to the naive window formulation, which is what the DuckDB oracle runs.
  * Rows with a NULL group are excluded (a sample of "no group" is
  * meaningless; filter upstream if needed).
  */
object GroupSample {

  def sampleKPerGroup(docs: DataFrame, idCol: String, groupCol: String,
      k: Int, salt: String, buckets: Int = 4096): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(buckets > 1, s"buckets=$buckets must be > 1")
    require(!docs.columns.contains("_sb") && !docs.columns.contains("_rn"),
      "column names _sb and _rn are reserved by GroupSample")
    val withB = docs.filter(col(groupCol).isNotNull)
      .withColumn("_sb", Splits.bucket(col(idCol), salt, buckets))
    // bounded control-plane histogram: (group, bucket) -> count
    val hist = withB.groupBy(col(groupCol).as("g"), col("_sb"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    // per group: threshold bucket + how many boundary rows to take
    val plans: Map[Any, (Long, Long)] = hist.groupBy(_._1).map {
      case (g, rows) =>
        val inOrder = rows.map(r => (r._2, r._3)).sortBy(_._1)
        val total = inOrder.map(_._2).sum
        if (total <= k) (g, (buckets.toLong, 0L)) // whole group kept
        else {
          val cums = inOrder.scanLeft(0L)(_ + _._2).tail
          val i = cums.indexWhere(_ >= k)
          val cumBefore = if (i == 0) 0L else cums(i - 1)
          (g, (inOrder(i)._1, k - cumBefore))
        }
    }
    def perGroup(f: ((Long, Long)) => Long): Column =
      plans.toSeq.sortBy(_._1.toString).foldLeft(lit(-1L)) {
        case (acc, (g, plan)) => when(col(groupCol) === lit(g), lit(f(plan))).otherwise(acc)
      }
    val tCol = perGroup(_._1)
    val takeCol = perGroup(_._2)
    val under = withB.filter(col("_sb") < tCol)
    // boundary bucket: ≈ groupSize/buckets rows per group reach the window
    val boundary = withB.filter(col("_sb") === tCol)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(idCol))))
      .filter(col("_rn") <= takeCol)
      .drop("_rn")
    under.unionByName(boundary).drop("_sb")
  }
}
