package graft

import graft.ckpt.Checkpoint
import graft.io.{ParquetTableIO, TableIO}
import graft.pivot.SeriesPivot
import graft.retain.Retention
import graft.rollup.Rollups
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end job orchestration — the analog of the reference's
  * `s2srun` → `create_reshaper` → `convert` → `print_diagnostics` lifecycle
  * (SURVEY.md §3 E1), run via `spark-submit --class graft.RollupMain`.
  *
  * Per run: read transcript turns → compressed per-series segments (the
  * pivot) → tier rollup cascade 1m→1h→1d → per-partition lineage commits →
  * retention pass → metrics. Resumable per write mode (Checkpoint).
  */
object RollupJob {

  case class TierReport(tier: String, written: Long, skipped: Long)
  case class RunReport(runId: String, inputRows: Long,
      tiers: Seq[TierReport], segmentsWritten: Long,
      retention: Map[String, String])

  private def pdayCol = date_format(timestamp_seconds(col("bucket")), "yyyy-MM-dd")

  /** Run the full pipeline. `asOfSec` drives retention (None = max input
    * bucket, deterministic — never wall-clock).
    */
  def run(spark: SparkSession, cfg: RollupConfig,
      io: TableIO = ParquetTableIO, asOfSec: Option[Long] = None): RunReport = {
    import spark.implicits._
    val pointsPath = s"${cfg.outputRoot}/points"
    val segmentsPath = s"${cfg.outputRoot}/segments"

    // ---- wmode 'w': error-if-exists (reshaper _inspect_output_files) ----
    if (cfg.writeMode == "w" && io.exists(spark, pointsPath))
      sys.error(s"output $pointsPath exists and write mode is 'w'")

    val turnsAll = io.read(spark, cfg.inputPath).as[Turn]

    // ---- wmode 'a': prune input below the committed high-water mark ----
    val turns = if (cfg.writeMode == "a") {
      val hw = Checkpoint.highWater(spark, io, cfg.outputRoot)
      hw.values.minOption match {
        case Some(minHw) =>
          // partition-prunable predicate in prod (ts maps to table partition)
          turnsAll.filter(date_format(col("ts"), "yyyy-MM-dd") > minHw)
        case None => turnsAll
      }
    } else turnsAll

    // committed (tier, pday) partitions — anti-joined against planned
    // output (J3; broadcast: partition count is tiny relative to data)
    val resume = cfg.writeMode == "s" || cfg.writeMode == "a"
    val committed: DataFrame =
      if (resume) Checkpoint.committed(spark, io, cfg.outputRoot).cache()
      else spark.emptyDataFrame

    val fingerprint = s"${cfg.inputPath}@${cfg.runId}"
    val sorted = cfg.tiers.sortBy(_.bucketSec)

    // ---- segments (the pivot) at the finest tier ----
    val segTier = sorted.head
    val segs = SeriesPivot.segmentsSalted(turns, segTier, cfg)
      .toDF().withColumn("pday", pdayCol)
    val segsToWrite =
      if (resume) segs.join(
        broadcast(committed.filter(col("tier") === s"seg-${segTier.name}")
          .select("pday")), Seq("pday"), "left_anti")
      else segs
    io.write(segsToWrite, segmentsPath, Seq("tier", "pday"), "overwrite")
    Checkpoint.commit(spark, io, cfg.outputRoot, cfg.runId,
      segsToWrite.select(concat(lit("seg-"), col("tier")).as("tier"), col("pday")),
      fingerprint)
    val segsWritten = segsToWrite.count()

    // ---- rollup cascade: finest cube from raw, coarser from finer ----
    var finerCube: DataFrame = null
    val cubes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val reports = sorted.map { tier =>
      val cube =
        if (finerCube == null) Rollups.cube(turns, tier)
        else Rollups.cascadeCube(finerCube, tier)
      cube.persist()
      cubes += cube
      finerCube = cube
      val points = Rollups.points(cube, tier.name).withColumn("pday", pdayCol)
      val (toWrite, skipped) =
        if (resume) {
          val done = committed.filter(col("tier") === tier.name).select("pday")
          (points.join(broadcast(done), Seq("pday"), "left_anti"), done.count())
        } else (points, 0L)
      io.write(toWrite, pointsPath, Seq("tier", "pday"), "overwrite")
      Checkpoint.commit(spark, io, cfg.outputRoot, cfg.runId,
        toWrite.select("tier", "pday"), fingerprint)
      TierReport(tier.name, toWrite.count(), skipped)
    }

    // ---- retention ----
    val asOf = asOfSec.getOrElse {
      turns.select(max(unix_timestamp(col("ts")))).as[Long].head()
    }
    val retained = Retention(spark, io, pointsPath, cfg.tiers, asOf)
    // segments expire with the finest tier's policy
    Retention(spark, io, segmentsPath, Seq(segTier), asOf)

    val inputRows = turns.count()
    cubes.foreach(_.unpersist())
    Checkpoint.recordMetrics(spark, io, cfg.outputRoot, cfg.runId, "run",
      Map("input_rows" -> inputRows.toDouble,
        "segments_written" -> segsWritten.toDouble) ++
        reports.map(r => s"points_${r.tier}" -> r.written.toDouble))
    RunReport(cfg.runId, inputRows, reports, segsWritten, retained)
  }
}

/** spark-submit entry point:
  * {{{
  * spark-submit --class graft.RollupMain app.jar \
  *   <inputPath> <outputRoot> [writeMode=o] [runId=run-0]
  * }}}
  */
object RollupMain {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val output = args(1)
    val mode = if (args.length > 2) args(2) else "o"
    val runId = if (args.length > 3) args(3) else "run-0"
    val builder = SparkSession.builder()
      .appName("graft-rollup")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    // under spark-submit the master comes from --master (spark.master prop);
    // standalone runs fall back to local mode
    if (!sys.props.contains("spark.master")) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      builder.master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = RollupJob.run(spark,
      RollupConfig(inputPath = input, outputRoot = output,
        writeMode = mode, runId = runId))
    println(report)
    spark.stop()
  }
}
