package graft

import graft.gen.Synth
import graft.rollup.Rollups
import graft.streaming.StreamingRollup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured-Streaming ingest (SURVEY.md §2.10): the streamed 1m rollup
  * must equal the batch 1m cube stats once all input is processed.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed 1m rollup equals batch rollup after processing all input") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val turns = Synth.tiny(spark)
    turns.write.parquet(s"$dir/in")

    val stream = StreamingRollup.rollupStream(spark, s"$dir/in",
      turns.schema, Tier.Minute)
    val q = StreamingRollup.toMemorySink(stream, "stream_1m")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()

    val got = spark.table("stream_1m")
      .select("conv_id", "bucket", "turns", "textLenSum", "textLenMin", "textLenMax")
    val want = Rollups.cube(turns, Tier.Minute)
      .groupBy("conv_id", "bucket")
      .agg(sum("c").as("turns"), sum("lenSum").as("textLenSum"),
        min("lenMin").as("lenMinI"), max("lenMax").as("lenMaxI"))
      .select(col("conv_id"), col("bucket"), col("turns"), col("textLenSum"),
        col("lenMinI").as("textLenMin"), col("lenMaxI").as("textLenMax"))
    assertSameRows(got, want, "stream == batch")
  }

  test("streaming session windows equal a batch session_window aggregation") {
    val dir = Files.createTempDirectory("graft-sess").toString
    // events ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP — the session
    // TZ is pinned UTC everywhere, so the cast is the identity mapping
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    events.write.parquet(s"$dir/in")

    val stream = StreamingRollup.sessionStream(spark, s"$dir/in",
      events.schema, "user_id", "ts")
    val q = StreamingRollup.toMemorySink(stream, "stream_sessions")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()

    val got = spark.table("stream_sessions")
    // batch session_window shares the merging rule bit-for-bit
    val want = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .cast("long").as("duration_sec"))
      .select(col("user_id"), unix_timestamp(col("sw.start")).as("session_start"),
        col("n_events"), col("duration_sec"))
    assertSameRows(got, want, "streaming sessions == batch session_window")
    // sanity: multi-event sessions exist (the merge path is exercised)
    assert(got.filter($"n_events" > 1).count() > 0)
  }

  test("streaming M4 equals the batch downsampler, ties included") {
    val dir = Files.createTempDirectory("graft-stream-m4").toString
    val rng = new scala.util.Random(99)
    // tie-heavy series across several 1m windows and keys
    val rows = (1 to 300).map { _ =>
      (s"u${rng.nextInt(4)}", 1700000000L + rng.nextInt(300),
        math.floor(rng.nextDouble() * 10) / 2.0)
    }
    val df = rows.toDF("user_id", "off", "value")
      .select($"user_id", expr("timestamp_seconds(off)").as("ts"), $"value")
    df.write.parquet(s"$dir/in")

    val stream = StreamingRollup.m4Stream(spark, s"$dir/in",
      df.schema, "user_id", "ts", "value", Tier.Minute)
    val q = StreamingRollup.toMemorySink(stream, "stream_m4")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()

    val got = spark.table("stream_m4")
    val want = graft.rollup.Downsample.m4(
      df.select($"user_id",
        unix_micros($"ts".cast("timestamp")).as("ts_us"), $"value"),
      "user_id", "ts_us", "value", bucketWidth = 60L * 1000000L)
      // batch bucket = floor(us / 60e6); stream bucket = window start sec
      .withColumn("bucket", col("bucket") * 60)
    assertSameRows(got, want, "stream m4 == batch m4")
  }

  test("parquet-sink dedup survives a restart: no loss, no duplication, state intact") {
    val dir = Files.createTempDirectory("graft-restart-dedup").toString
    def doc(id: Long, text: String, tsOff: Long) = (id, text, tsOff)
    def writeBatch(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "off")
        .select($"doc_id", $"text",
          expr("timestamp_seconds(1700000000 + off)").as("ts"))
        .write.mode("append").parquet(s"$dir/in")

    writeBatch(Seq(doc(1, "alpha", 0), doc(2, "beta", 5), doc(3, "alpha", 10)))
    val schema = spark.read.parquet(s"$dir/in").schema
    def runOnce(): Unit = {
      val q = StreamingRollup.toParquetSink(
        StreamingRollup.dedupStream(spark, s"$dir/in", schema, "doc_id", "text", "ts"),
        s"$dir/out", s"$dir/ckpt").start()
      q.awaitTermination()
    }
    runOnce() // run 1: alpha kept once, beta kept; then the "job dies"

    // batch 2 lands within the watermark horizon: a cross-restart duplicate
    // of alpha (must be dropped — state survived) and a new text (kept)
    writeBatch(Seq(doc(4, "alpha", 30), doc(5, "gamma", 35)))
    runOnce() // resume from the same checkpoint

    val out = spark.read.parquet(s"$dir/out")
    // exactly one survivor per distinct text across the restart boundary:
    // a lost checkpoint would re-emit batch-1 rows (duplication) or keep
    // doc 4 (state loss); both surface here
    assert(out.count() == 3, s"expected 3 survivors, got ${out.count()}")
    assert(out.groupBy("text").count().filter($"count" =!= 1).count() == 0,
      "some text emitted zero or multiple times across the restart")
    assert(out.filter($"doc_id" === 4).count() == 0,
      "cross-restart duplicate not dropped — dedup state lost on restart")
  }

  test("parquet-sink windowed rollup merges state across a restart (append mode)") {
    val dir = Files.createTempDirectory("graft-restart-rollup").toString
    def writeBatch(rows: Seq[(String, Int, Long)]): Unit =
      rows.toDF("conv_id", "turn_idx", "off")
        .select($"conv_id", $"turn_idx", lit("user").as("role"),
          concat(lit("txt-"), $"turn_idx").as("text"),
          lit(null).cast("string").as("tool"),
          expr("timestamp_seconds(1700000000 + off)").as("ts"))
        .write.mode("append").parquet(s"$dir/in")

    // batch 1: two convs in the same minute window; window NOT emitted yet
    // (watermark can't pass it in a finite run over batch 1 alone)
    writeBatch(Seq(("c1", 0, 10L), ("c2", 0, 15L)))
    val schema = spark.read.parquet(s"$dir/in").schema
    def runOnce(): Unit = {
      val q = StreamingRollup.toParquetSink(
        StreamingRollup.rollupStream(spark, s"$dir/in", schema, Tier.Minute),
        s"$dir/out", s"$dir/ckpt").start()
      q.awaitTermination()
    }
    runOnce()

    // batch 2: one more c1 turn in the SAME minute (merges into restored
    // window state) + a sentinel an hour later that pushes the watermark
    // past every real window so append mode flushes them
    writeBatch(Seq(("c1", 1, 20L), ("zz-sentinel", 0, 7200L)))
    runOnce()

    val sentinelBucket = (1700000000L + 7200L) / 60 * 60
    val got = spark.read.parquet(s"$dir/out").filter($"bucket" < sentinelBucket)
    val want = Seq(
      ("c1", 1700000000L / 60 * 60, 2L), // turns from BOTH runs, one window
      ("c2", 1700000000L / 60 * 60, 1L))
      .toDF("conv_id", "bucket", "turns")
    assertSameRows(got.select("conv_id", "bucket", "turns"), want,
      "windows merged across restart, each emitted exactly once")
  }

  test("streaming dedup drops in-horizon duplicates, keeps one survivor per text") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"),
        // deterministic event time within one watermark horizon
        expr("timestamp_seconds(1700000000 + doc_id % 60)").as("ts"))
    // corpus: originals + exact copies of every 10th doc (different ids)
    val corpus = docs.unionByName(
      docs.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 10000).as("doc_id"), $"text", $"ts"))
    corpus.write.parquet(s"$dir/in")

    val stream = StreamingRollup.dedupStream(spark, s"$dir/in",
      corpus.schema, "doc_id", "text", "ts")
    val q = StreamingRollup.toAppendMemorySink(stream, "stream_dedup")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()

    val got = spark.table("stream_dedup")
    val nDocs = docs.count()
    assert(got.count() == nDocs,
      s"expected one survivor per distinct text (= $nDocs), got ${got.count()}")
    // exactly one row per text, never zero or two
    assert(got.groupBy("text").count().filter($"count" =!= 1).count() == 0)
  }

  test("streaming curation applies the batch gates at ingest") {
    val dir = Files.createTempDirectory("graft-stream-curate").toString
    val en = "the model was trained on the data and it is the case that " +
      "they have a result for this run and that it was not a surprise " +
      "to them at all in the end"
    val benchText = "the secret benchmark question about the seven golden owls"
    val docs = Seq(
      (1L, en), // kept: English, >=30 tokens, clean
      (2L, "too short to pass the gate"), // dropped: quality
      (3L, "uno dos tres quatro cinco seis siete ocho nueve diez " * 4), // dropped: not 'en'
      (4L, en + " " + benchText) // dropped: contaminated (bench 5-grams)
    ).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/in")
    val bench = Seq((99L, benchText)).toDF("doc_id", "text")

    val stream = StreamingRollup.curateStream(spark, s"$dir/in",
      docs.schema, "doc_id", "text", bench, "doc_id", "text")
    val q = StreamingRollup.toAppendMemorySink(stream, "stream_curate")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()

    val got = spark.table("stream_curate")
      .select("doc_id", "tokens", "bucket", "split")
      .as[(Long, Long, Long, String)].collect()
    assert(got.map(_._1).toSet == Set(1L), s"got ${got.toSeq}")
    // split parity with the deterministic batch assignment
    val batch = graft.pipeline.Splits
      .assign(Seq(1L).toDF("doc_id"), "doc_id", "curate-v1", 800, 100)
      .select("bucket", "split").as[(Long, String)].head()
    assert(got.head._3 == batch._1 && got.head._4 == batch._2)
  }
}
