package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted dataset mixing — the domain-reweighting step of a
  * pre-training data pipeline (e.g. "web ×0.6, books ×2.5, code ×1.0,
  * junk ×0"). Like [[Splits]], membership and copy count are pure functions
  * of (id, salt): re-sharding, re-running, or growing the corpus never
  * changes an existing document's fate, and any engine with md5 reproduces
  * the mix bit-for-bit (no sampling RNG, no `rand()`).
  *
  * Rates are per-mille, so one integer expresses both down-sampling
  * (600 = keep 60 %) and up-sampling (2500 = 2 copies + a 50 % chance of a
  * third, decided by the same salted bucket). Up-sampled copies carry a
  * `copy` index (0-based) so downstream shuffling/packing can treat them as
  * distinct rows.
  *
  * Scale shape: copy count is a per-row Column expression and the fan-out
  * an executor-side `explode` — ZERO exchanges end to end (a pure
  * projection + generate over the scan), so the operator composes under
  * any upstream partitioning and pushes its domain filters into the scan.
  * Rate maps are mixture configs (a handful of domains), inlined as a
  * literal map lookup.
  */
object Mixing {

  /** Copies for one row: `rate/1000` guaranteed + 1 more iff the row's
    * salted bucket falls below `rate mod 1000`. Buckets reuse
    * [[Splits.bucket]], so mixing and split assignment can share or
    * decorrelate via the salt.
    */
  def copies(id: Column, ratePerMille: Column, salt: String): Column =
    (ratePerMille / 1000).cast("int") +
      when(Splits.bucket(id, salt, 1000) < ratePerMille % 1000, 1).otherwise(0)

  /** One output row per kept copy: all input columns plus `copy`
    * (0-based copy index). Domains absent from `ratesPerMille` keep
    * `defaultPerMille` (1000 = pass through unchanged); rate 0 drops the
    * domain entirely.
    */
  def sampleWeighted(docs: DataFrame, idCol: String, domainCol: String,
      ratesPerMille: Map[String, Int], salt: String,
      defaultPerMille: Int = 1000): DataFrame = {
    require(ratesPerMille.values.forall(_ >= 0) && defaultPerMille >= 0,
      "per-mille rates must be >= 0")
    require(!docs.columns.contains("copy"),
      "column name copy is reserved by Mixing.sampleWeighted")
    val rate = ratesPerMille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (dom, r)) =>
        when(col(domainCol) === dom, lit(r)).otherwise(acc)
      }
    val n = copies(col(idCol), rate, salt)
    // sequence(0, -1) counts DOWNWARD (the inverted-interval trap from
    // AsOf.intervalJoin) — a rate-0 row must explode to zero rows, not two
    docs.withColumn("copy",
      explode(when(n > 0, sequence(lit(0), n - 1)).otherwise(array())))
  }
}
