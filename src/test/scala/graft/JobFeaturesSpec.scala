package graft

import graft.gen.Synth
import graft.io.ParquetTableIO
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** RollupJob orchestration features: dims table (once-file analog O3),
  * output limit (X3), metric include-list (P2), multi-config run (O2).
  */
class JobFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-feats").toString
  private lazy val inputPath = {
    val p = s"$tmp/input"
    Synth.tiny(spark).write.parquet(p)
    p
  }

  test("run() pins the session time zone to the UTC pday contract") {
    // pdays are UTC day strings and the wmode-'a' high-water predicate
    // compares ts against UTC day boundaries — a caller embedding run() in
    // a non-UTC session must not silently get disagreeing day math
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val out = s"$tmp/tzpin"
      RollupJob.run(spark, RollupConfig(inputPath, out, writeMode = "o",
        runId = "tz-1"))
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("connector seam: the whole job runs on ORC and matches parquet output") {
    import graft.io.OrcTableIO
    val pOut = s"$tmp/io-parquet"
    val oOut = s"$tmp/io-orc"
    // end-to-end ORC: the connector reads the input too, so give it an ORC
    // copy of the same table
    val orcIn = s"$tmp/input-orc"
    spark.read.parquet(inputPath).write.orc(orcIn)
    RollupJob.run(spark, RollupConfig(inputPath, pOut, writeMode = "o",
      runId = "io-p"))
    RollupJob.run(spark, RollupConfig(orcIn, oOut, writeMode = "o",
      runId = "io-o"), io = OrcTableIO)
    // the orc table is really orc
    val orcFiles = new java.io.File(s"$oOut/points").listFiles()
    assert(orcFiles != null && orcFiles.nonEmpty)
    // identical rolled-up points through either connector
    val p = ParquetTableIO.read(spark, s"$pOut/points")
      .selectExpr("tier", "conv_id", "bucket", "turns",
        "array_sort(map_entries(byRole)) AS br")
    val o = OrcTableIO.read(spark, s"$oOut/points")
      .selectExpr("tier", "conv_id", "bucket", "turns",
        "array_sort(map_entries(byRole)) AS br")
    assertSameRows(p, o, "parquet vs orc points")
  }

  test("dims table: one row per conversation with exact totals") {
    val out = s"$tmp/dims"
    RollupJob.run(spark, RollupConfig(inputPath, out, runId = "r"))
    val dims = ParquetTableIO.read(spark, s"$out/dims")
    val want = spark.read.parquet(inputPath)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("turns_total"),
        sum(length(col("text"))).as("text_len_total"))
    assertSameRows(dims.select("conv_id", "turns_total", "text_len_total"),
      want, "dims totals")
  }

  test("outputLimit caps the processed conversations") {
    val out = s"$tmp/limit"
    val r = RollupJob.run(spark,
      RollupConfig(inputPath, out, runId = "r", outputLimit = Some(5)))
    val convs = ParquetTableIO.read(spark, s"$out/points")
      .select("conv_id").distinct().as[String].collect().sorted
    val expected = spark.read.parquet(inputPath).select("conv_id").distinct()
      .orderBy("conv_id").limit(5).as[String].collect().sorted
    assert(convs.toSeq == expected.toSeq)
    assert(r.inputRows < Synth.tiny(spark).count())
  }

  test("metricsInclude projects points and rejects unknown names") {
    val out = s"$tmp/metrics"
    RollupJob.run(spark, RollupConfig(inputPath, out, runId = "r",
      metricsInclude = Some(Seq("turns", "textLen"))))
    val cols = ParquetTableIO.read(spark, s"$out/points").columns.toSet
    assert(cols.contains("turns") && cols.contains("textLenSum"))
    assert(!cols.contains("byRole") && !cols.contains("byTool"))
    intercept[IllegalArgumentException] {
      RollupJob.run(spark, RollupConfig(inputPath, s"$tmp/bad", runId = "r",
        metricsInclude = Some(Seq("nope"))))
    }
  }

  test("runAll executes multiple configs (MultiSpec analog)") {
    val reports = RollupJob.runAll(spark, Seq(
      RollupConfig(inputPath, s"$tmp/multi1", runId = "m1"),
      RollupConfig(inputPath, s"$tmp/multi2", runId = "m2",
        tiers = Seq(Tier.Hour, Tier.Day))))
    assert(reports.size == 2)
    assert(reports(0).tiers.map(_.tier) == Seq("1m", "1h", "1d"))
    assert(reports(1).tiers.map(_.tier) == Seq("1h", "1d"))
  }
}
