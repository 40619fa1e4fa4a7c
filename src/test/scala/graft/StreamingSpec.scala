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
}
