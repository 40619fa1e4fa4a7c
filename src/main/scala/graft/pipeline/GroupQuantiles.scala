package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete percentiles without a per-group sort —
  * "p50/p90/p99 tokens per domain" over a crawl. The naive plan
  * (`percentile` / sort-within-group) routes every row of a hot group
  * through one task and `approx_percentile` is nondeterministic; here the
  * data reduces to a per-(group, value) histogram in one map-side-combined
  * aggregation, and the percentile selection runs on the HISTOGRAM (one
  * cumulative window over ≤ |distinct values| rows per group — for
  * integer metrics like token counts, a few hundred rows, never the data).
  *
  * Semantics (exact, type-1 discrete): p-th percentile of a group of N
  * non-null values = the smallest value v whose cumulative count reaches
  * rank ⌈N·p/100⌉; ranks are computed as `floor((N·p + 99)/100)` — integer
  * ceiling-division arithmetic that both engines evaluate identically, so
  * the oracle replays it bit-for-bit (no libm percentile, no
  * interpolation). NULL values are excluded (the [[QuantileGate]] rule);
  * for continuous doubles, quantize first ([[QuantileGate.bucketOf]]) —
  * on raw doubles the histogram is only as bounded as the value domain.
  */
object GroupQuantiles {

  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate percentiles: $pcts")
    val reserved = Set("_gq_v", "_gq_c", "_gq_cum", "_gq_n")
    require(df.columns.toSet.intersect(reserved).isEmpty,
      s"column names ${reserved.mkString(",")} are reserved by GroupQuantiles")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("_gq_v"))
      .agg(count(lit(1)).as("_gq_c"))
    val byG = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("_gq_cum", sum("_gq_c").over(byG.orderBy("_gq_v")))
      .withColumn("_gq_n", sum("_gq_c").over(byG))
    val sels = pcts.map(p =>
      min(when(col("_gq_cum") >= floor((col("_gq_n") * p + 99) / 100),
        col("_gq_v"))).as(s"p$p"))
    cum.groupBy(col(groupCol)).agg(sels.head, sels.tail: _*)
  }
}
