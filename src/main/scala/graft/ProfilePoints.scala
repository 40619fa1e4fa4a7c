package graft

import graft.rollup.Rollups
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the rollup points phase (the 2→8 scaling limiter):
  * times cube-decode, points fold, and the partitioned write separately at
  * one parallelism level. `runMain graft.ProfilePoints <cores> <segsPath>`.
  */
object ProfilePoints {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val segsPath = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile $cores] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    val raw = spark.read.parquet(segsPath).drop("pday")
    println(s"[profile $cores] scan partitions: ${raw.rdd.getNumPartitions}")
    val segs0 = if (args.length > 2 && args(2) == "repart")
      raw.repartition(cores * 4) else raw
    val segs = segs0.as[Segment]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("segments load+cache")(segs.count())
    println(s"[profile $cores] cached partitions: ${segs.rdd.getNumPartitions}")
    val cube = Rollups.cubeFromSegments(segs, Tier.Minute)
    timed("cube decode+agg (count)")(cube.count())
    val cubeP = cube.persist()
    timed("cube persist")(cubeP.count())
    // profile the JOB's actual path: streamed fold + pinned salted write
    val pts = Rollups.pointsStreamed(cubeP, "1m")
    timed("streamed points fold (count)")(pts.count())
    val out = "/tmp/graft_profile_out"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val withDay = pts.withColumn("pday",
      date_format(timestamp_seconds(col("bucket")), "yyyy-MM-dd"))
    val salt = pmod(xxhash64(col("conv_id")), lit(8))
    timed("salted repartition+write") {
      withDay.repartition(cores * 4, col("pday"), salt)
        .write.partitionBy("tier", "pday")
        .mode("overwrite").parquet(out)
      0L
    }
    spark.stop()
  }
}

object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", args.headOption.getOrElse("false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val turns = graft.gen.Synth.turns(spark, 200, 50, 3)
    val segs = graft.pivot.SeriesPivot.segmentsSorted(turns, graft.Tier.Day, graft.RollupConfig("", ""))
      .persist()
    segs.count()
    val cube = graft.rollup.Rollups.cubeFromSegments(segs, graft.Tier.Minute)
    cube.persist().count()
    val pts = graft.rollup.Rollups.points(cube, "1m")
    pts.count()
    val plan = pts.queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).size
    println(s"[plancheck canChange=${args.headOption.getOrElse("false")}] exchanges in points plan: $n")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
