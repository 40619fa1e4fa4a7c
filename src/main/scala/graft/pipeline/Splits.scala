package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Train/val/test membership must be a pure function of a stable key — not
  * of row order, partitioning, or sampling RNG — so that re-sharding the
  * corpus, re-running the job, or growing the corpus never moves an
  * existing document across the split boundary (the classic leakage bug:
  * `randomSplit` reassigns on every re-run). The assignment here hashes
  * `"<id>:<salt>"` with md5 and buckets the first 8 hex chars per-mille:
  * content-independent, salt-keyed (a new salt re-rolls the whole split),
  * and engine-portable — any system with md5 reproduces it bit-for-bit,
  * which is also what lets the DuckDB oracle verify every row.
  */
object Splits {

  /** Salted per-mille-style bucket in [0, buckets): integer value of the
    * first 8 md5 hex chars of "<id>:<salt>", mod buckets. Pure Column
    * expression — codegen'd, no UDF, usable straight in a partition filter.
    */
  def bucket(id: Column, salt: String, buckets: Int): Column = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))
      .cast("binary")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Adds (bucket, split) columns: bucket in [0,1000), split = "train" for
    * bucket < trainPerMille, "val" for the next valPerMille buckets,
    * "test" for the rest.
    */
  def assign(docs: DataFrame, idCol: String, salt: String,
      trainPerMille: Int, valPerMille: Int): DataFrame = {
    require(trainPerMille >= 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille <= 1000, "per-mille weights must fit in [0,1000]")
    docs.withColumn("bucket", bucket(col(idCol), salt, 1000))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }
}
