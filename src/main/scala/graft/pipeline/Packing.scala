package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence chunking (training-batch packing).
  *
  * Exact greedy bin packing is inherently sequential — each bin's close
  * decision depends on every earlier doc — so a distributed pipeline uses
  * the order-stable prefix-sum rule instead: within a shard, docs are
  * taken in stable id order and doc d goes to bin
  * `floor(tokens_before_d / budget)`. Every bin holds at least `budget`
  * tokens' worth of prefix (except the shard's last) and overshoots by at
  * most one document — the same bound greedy first-fit gives — while
  * being a pure window expression: deterministic, re-runnable,
  * oracle-checkable row by row.
  *
  * Scale shape: the window partitions by `shardCol`, so shards pack in
  * parallel with no global ordering (a single global prefix sum would
  * serialize the corpus through one window partition). Shards are
  * whatever unit batch locality matters for — an id range, a source
  * bucket, a language.
  */
object Packing {

  /** Adds a `bin` column: floor(prefix-sum of tokensCol before this row,
    * within shardCol ordered by idCol, / budget).
    */
  def tokenBudgetBins(docs: DataFrame, idCol: String, tokensCol: String,
      shardCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("bin",
      floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / budget))
  }
}
