package graft

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: time one driver-contract query (cold, then
  * `reps-1` warm repeats with a cache sweep between runs, mirroring
  * `Bench`'s measurement discipline). Usage:
  * {{{
  * SPARK_GRAFT_CPUS=32 scripts/run.sh graft.QueryTimer dedup_clusters 3 [sfDir]
  * }}}
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000).selectExpr("count(xxhash64(id))").collect()
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val times = (1 to reps).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[qtimer] $name run $i: $sec%.2f s ($n rows)")
      sec
    }
    println(f"[qtimer] $name min=${times.min}%.2f median=${times.sorted.apply(times.size / 2)}%.2f")
    spark.stop()
  }
}
