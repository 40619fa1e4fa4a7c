package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantile gate — "keep the top `keepFraction` of the
  * corpus by score" (the percentile-based quality filter every curation
  * pipeline runs after scoring).
  *
  * `approx_percentile` would make the cut nondeterministic and
  * engine-specific; a global sort + row_number would serialize the corpus
  * through one task. Instead the score is quantized onto a FIXED bounded
  * domain (`qb = floor(score × quantScale)`), reduced to a histogram in
  * one map-side-combined aggregation, and the threshold bucket is picked
  * on the driver from that bounded histogram (≤ quantScale+1 rows — a
  * documented control-plane collect, the same bound class as IVF's
  * centroid table). The gate is then a plain literal comparison, pushed
  * into the scan pipeline.
  *
  * Semantics (exact and deterministic): with k = ceil(keepFraction × N),
  * the threshold is the LARGEST bucket b such that |{qb ≥ b}| ≥ k, and
  * every row with qb ≥ threshold is kept — at least k rows, with the
  * whole boundary bucket included (ties resolve by CONTENT, never by row
  * order or partitioning, so re-sharding cannot change the kept set).
  * Precision is 1/quantScale of the score unit; scores are expected in a
  * bounded range (e.g. [0,1] quality scores) so the histogram stays
  * bounded.
  */
object QuantileGate {

  /** Quantized score bucket (the gate's comparison key). */
  def bucketOf(score: Column, quantScale: Long): Column =
    floor(score * quantScale).cast("long")

  /** Threshold bucket for `keepFraction`, or None when no row has a
    * non-null score (empty or all-null input).
    */
  def threshold(docs: DataFrame, scoreCol: String, keepFraction: Double,
      quantScale: Long = 10000L): Option[Long] = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction=$keepFraction must be in (0, 1]")
    require(quantScale > 0, s"quantScale=$quantScale must be positive")
    // NULL scores are excluded up front: a null score quantizes to a null
    // bucket whose count would silently unbox to 0/phantom rows, inflate
    // the total, and shift the threshold while the final null-propagating
    // gate drops the rows anyway — keepFraction is defined over SCORED
    // rows only (filter upstream if nulls should be errors)
    val hist = docs.filter(col(scoreCol).isNotNull)
      .groupBy(bucketOf(col(scoreCol), quantScale).as("qb"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val total = hist.map(_._2).sum
    if (total == 0L) None
    else {
      val k = math.ceil(keepFraction * total).toLong
      val cums = hist.scanLeft(0L)(_ + _._2).tail
      Some(hist(cums.indexWhere(_ >= k))._1)
    }
  }

  /** Rows whose quantized score reaches the `keepFraction` threshold
    * (≥ ceil(keepFraction·N) rows over the non-null-scored N; whole
    * boundary bucket kept; null-score rows are never kept — the gate
    * comparison null-propagates, matching the histogram's exclusion).
    */
  def keepTopFraction(docs: DataFrame, scoreCol: String, keepFraction: Double,
      quantScale: Long = 10000L): DataFrame =
    threshold(docs, scoreCol, keepFraction, quantScale) match {
      case Some(t) => docs.filter(bucketOf(col(scoreCol), quantScale) >= t)
      case None => docs.filter(col(scoreCol).isNotNull) // empty/all-null → empty
    }
}
