package graft

import graft.gen.Synth
import graft.io.ParquetTableIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling benchmark (BASELINE.json metric: "scaling
  * efficiency ≥0.8 from N to 4N executors"; sandbox proxy per BASELINE.md:
  * same job, same input, local[8] vs local[32] on the 32-core host).
  *
  * Runs the FULL pipeline (pivot → segments → 1m/1h/1d cascade → lineage)
  * at both parallelism levels, verifies the outputs are identical
  * (parallelism invariance at scale), and writes BENCH/BASELINE.md with
  * throughput at both levels + efficiency = (thr@4N / thr@N) / 4.
  *
  * {{{ runMain graft.BenchScaling [nConvs] [baseTurns] [hotFactor] }}}
  */
object BenchScaling {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // local bench inputs are a handful of ~13 MB files; default 128 MB
      // bin-packing would cap scan parallelism at ~4 tasks
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Order-insensitive table checksum (maps → sorted entries → json). */
  private def checksum(spark: SparkSession, path: String): Long = {
    val df = ParquetTableIO.read(spark, path)
    val canon = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          d.withColumn(f.name, array_sort(map_entries(col(f.name))))
        case _ => d
      }
    }
    canon.select(xxhash64(to_json(struct(canon.columns.sorted.map(col): _*)))
        .cast("decimal(38,0)").as("h"))
      .agg(sum("h")).head().getDecimal(0).longValue()
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toInt else 5000
    val baseTurns = if (args.length > 1) args(1).toInt else 400
    val hot = if (args.length > 2) args(2).toInt else 20
    val work = sys.env.getOrElse("GRAFT_BENCH_DIR", "/tmp/graft_bench")
    val input = s"$work/input"

    // ---- generate the input once (32 cores) ----
    var spark = session(32)
    val t0 = System.nanoTime()
    Synth.turns(spark, nConvs, baseTurns, hot).write.mode("overwrite").parquet(input)
    val inputRows = spark.read.parquet(input).count()
    println(f"[gen] $inputRows rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()

    // ---- run the full pipeline at each parallelism ----
    val levels = sys.env.getOrElse("GRAFT_BENCH_LEVELS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    require(levels.size == 2 && levels(1) == levels(0) * 4,
      s"levels must be N,4N — got $levels")
    val results = levels.map { cores =>
      spark = session(cores)
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      val out = s"$work/out$cores"
      val cfg = RollupConfig(inputPath = input, outputRoot = out,
        writeMode = "o", runId = s"bench-$cores")
      // warm-up pass: JIT-compile the whole pipeline in this JVM so both
      // levels are measured equally warm, then the measured pass
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      RollupJob.run(spark, cfg.copy(runId = s"warmup-$cores"))
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val start = System.nanoTime()
      val report = RollupJob.run(spark, cfg)
      val sec = (System.nanoTime() - start) / 1e9
      val thr = report.inputRows / sec
      println(f"[bench] local[$cores]: $sec%.1f s, $thr%.0f turns/s")
      spark.stop()
      (cores, sec, thr)
    }

    // ---- invariance + compression accounting ----
    spark = session(32)
    val ptsHash = levels.map(c => checksum(spark, s"$work/out$c/points"))
    val segHash = levels.map(c => checksum(spark, s"$work/out$c/segments"))
    val invariant = ptsHash.distinct.size == 1 && segHash.distinct.size == 1
    println(s"[bench] parallelism-invariant outputs: $invariant")

    val segStats = ParquetTableIO.read(spark, s"$work/out${levels(1)}/segments")
      .agg(sum("n").as("points"),
        sum(length(col("tsBlob")) + length(col("idxBlob")) +
          length(col("roleBlob")) + length(col("toolBlob"))).as("metaBytes"),
        sum(length(col("textBlob"))).as("textBytes"))
      .head()
    val points = segStats.getLong(0)
    val metaBpp = segStats.getLong(1).toDouble / points
    val textBpp = segStats.getLong(2).toDouble / points
    val rawBytes = spark.read.parquet(input)
      .agg(sum(length(col("text")) + lit(8 + 8 + 10 + 5)).as("raw")).head().getLong(0)
    val segBytes = segStats.getLong(1) + segStats.getLong(2)
    spark.stop()

    val Seq((n1, sec1, thr1), (n4, sec4, thr4)) = results
    val eff = (thr4 / thr1) / 4.0
    val json = f"""{"metric":"scaling","turns":$inputRows,"n":$n1,"sec_n":$sec1%.2f,"sec_4n":$sec4%.2f,"thr_n":$thr1%.0f,"thr_4n":$thr4%.0f,"efficiency":$eff%.3f,"invariant":$invariant,"metaBytesPerPoint":$metaBpp%.2f,"textBytesPerPoint":$textBpp%.2f}"""
    println(json)

    Files.createDirectories(Paths.get("BENCH"))
    val md =
      f"""# BENCH/BASELINE — measured scaling + compression
         |
         |Full pipeline (read → sort-based pivot → compressed segments →
         |1m/1h/1d rollup cascade → lineage commits) on the deterministic
         |synthetic transcript table (`graft.gen.Synth`, seed 42, skewed conv
         |sizes, gap patterns). Sandbox proxy for N vs 4N executors per
         |BASELINE.md: `local[$n1]` vs `local[$n4]`, same input, same code,
         |fresh session per level, one JIT warm-up pass per level before the
         |measured pass (32-core host; no real cluster available).
         |
         || quantity | value |
         || --- | --- |
         || input turns | $inputRows |
         || wall sec @ local[$n1] | $sec1%.1f |
         || wall sec @ local[$n4] | $sec4%.1f |
         || throughput @ local[$n1] | $thr1%.0f turns/s |
         || throughput @ local[$n4] | $thr4%.0f turns/s |
         || **scaling efficiency (thr@4N/thr@N)/4** | **$eff%.3f** (target ≥ 0.8) |
         || outputs byte-identical across parallelism | $invariant |
         || segment metadata (ts+idx+role+tool) | $metaBpp%.2f bytes/point |
         || segment text (deflate) | $textBpp%.2f bytes/point |
         || total segment bytes vs raw row bytes | $segBytes / $rawBytes (${100.0 * segBytes / rawBytes}%.1f%%) |
         |
         |Reproduce: `GRAFT_BENCH_LEVELS=$n1,$n4 scripts/run.sh graft.BenchScaling $nConvs $baseTurns $hot`
         |(or via `sbt -batch "runMain ..."`). JSON: `$json`
         |""".stripMargin
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println("wrote BENCH/BASELINE.md")
  }
}
