package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler for driver-contract queries: runs ONE named query `reps`
  * times at Bench's session settings, printing per-iteration wall time —
  * isolates a query from Bench's suite ordering/cache interplay so a
  * regression can be pinned to a plan change vs harness noise. Pass
  * `explain` to print the formatted physical plan first.
  *
  * `runMain graft.ProfileQuery <queryName> [reps] [explain]`
  * (env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR — as in [[Bench]]).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // JVM/codegen warm-up, as in Bench
    spark.range(1000000).selectExpr("count(xxhash64(id))").collect()
    if (args.contains("explain"))
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    (1 to reps).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
