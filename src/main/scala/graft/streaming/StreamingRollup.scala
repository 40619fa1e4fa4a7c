package graft.streaming

import graft.Tier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingest of the transcript table (SURVEY.md §2.10).
  *
  * The PRODUCTION path of this engine is batch (`RollupJob` via
  * spark-submit, resumable from checkpoint) — the reference is strictly
  * batch and north_rule asks for batch jobs. This module exists for the
  * continuous-ingest variant: the same 1-minute base rollup expressed as a
  * streaming aggregation with event-time windows and a watermark for late
  * data; coarser tiers still cascade in batch from the streamed base (the
  * standard lambda-free pattern: stream the finest grain, re-aggregate
  * downstream).
  */
object StreamingRollup {

  /** Streaming 1m rollup: event-time tumbling window per conv_id with a
    * watermark bounding state. Output schema matches the batch cube at
    * (conv_id, bucket) grain with count/len stats (role/tool maps stay in
    * the batch path — streaming state stays lean).
    */
  def rollupStream(spark: SparkSession, inputDir: String, schema: StructType,
      tier: Tier = Tier.Minute, watermark: String = "10 minutes"): DataFrame = {
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"),
        window(col("ts"), s"${tier.bucketSec} seconds").as("w"))
      .agg(
        count(lit(1)).as("turns"),
        sum(length(col("text"))).as("textLenSum"),
        min(length(col("text"))).as("textLenMin"),
        max(length(col("text"))).as("textLenMax"))
      .select(col("conv_id"),
        unix_timestamp(col("w.start")).as("bucket"),
        col("turns"), col("textLenSum"), col("textLenMin"), col("textLenMax"))
  }

  /** Session-window aggregation at ingest — the streaming twin of the
    * batch lag/running-sum sessionizer, on Spark's native MERGING session
    * state: `session_window(ts, gap)` extends each event to [ts, ts+gap)
    * and the state store merges overlapping windows per key, so late
    * events BRIDGE two open sessions into one — semantics a pair of batch
    * windows can't express incrementally. State is one (start, end,
    * aggregates) tuple per open session per key (fixed width, no row
    * lists); with a watermark + append mode, sessions emit and free state
    * once the watermark passes their close. Boundary rule: events exactly
    * `gap` apart start a NEW session (the window is half-open) — the
    * batch [[graft.queries.Queries.sessionize]] keeps gap == threshold in
    * the same session, so parity is asserted against a batch
    * `session_window` aggregation, which shares this rule exactly.
    */
  def sessionStream(spark: SparkSession, inputDir: String, schema: StructType,
      keyCol: String, tsCol: String, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .cast("long").as("duration_sec"))
      .select(col(keyCol),
        unix_timestamp(col("sw.start")).as("session_start"),
        col("n_events"), col("duration_sec"))

  /** Streaming M4 downsampling — live dashboard previews at ingest: the
    * same first/last/min/max-per-pixel-bucket operator as
    * [[graft.rollup.Downsample.m4]] expressed as an event-time windowed
    * aggregation with a watermark (state = one ≤4-point sketch per open
    * (key, window); min_by/max_by are declarative aggregates, so the
    * state store holds fixed-width buffers, never row lists). Identical
    * tie rule to the batch operator — equality asserted in StreamingSpec.
    * `bucket` is the window start in epoch seconds (the batch operator's
    * `bucket × bucketWidth` in its time unit); ts_* are epoch micros.
    */
  def m4Stream(spark: SparkSession, inputDir: String, schema: StructType,
      keyCol: String, tsCol: String, valueCol: String,
      tier: Tier = Tier.Minute, watermark: String = "10 minutes"): DataFrame = {
    val tsUs = unix_micros(col(tsCol).cast("timestamp"))
    val v = col(valueCol)
    val byTime = struct(tsUs.as("t"), v.as("v"))
    val byValue = struct(v.as("v"), tsUs.as("t"))
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol),
        window(col(tsCol), s"${tier.bucketSec} seconds").as("w"))
      .agg(
        min_by(byTime, byTime).as("_f"),
        max_by(byTime, byTime).as("_l"),
        min_by(byTime, byValue).as("_mn"),
        max_by(byTime, byValue).as("_mx"),
        count(lit(1)).as("n"))
      .select(col(keyCol),
        unix_timestamp(col("w.start")).as("bucket"),
        col("_f.t").as("ts_first"), col("_f.v").as("v_first"),
        col("_l.t").as("ts_last"), col("_l.v").as("v_last"),
        col("_mn.t").as("ts_min"), col("_mn.v").as("v_min"),
        col("_mx.t").as("ts_max"), col("_mx.v").as("v_max"),
        col("n"))
  }

  /** Streaming exact dedup at ingest: drop rows whose normalized content
    * fingerprint ([[graft.text.TextAnalysis.fingerprint]]) was already
    * seen within the watermark horizon — `dropDuplicatesWithinWatermark`
    * keys state on TWO independent 64-bit fingerprints of the normalized
    * text (128 collision bits — silent loss of a distinct doc needs a
    * double collision, ~2^-128 per pair), so state is bounded by
    * (distinct docs within horizon) × ~24 bytes rather than by text size.
    * Note the dedup key is the NORMALIZED content (lowercased, whitespace
    * collapsed — [[graft.text.TextAnalysis.fingerprint]]): docs differing
    * only in case/whitespace are conflated by design, matching the batch
    * analog [[graft.dedup.Dedup.exact]]. The watermark bound is the
    * streaming trade: an exact duplicate arriving later than the horizon
    * is NOT dropped (document-level dedup of a crawl feed, not a
    * total-history guarantee — run the batch pass for that).
    */
  def dedupStream(spark: SparkSession, inputDir: String, schema: StructType,
      idCol: String, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("_fp", graft.text.TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_fp2", graft.text.TextAnalysis.fingerprint2(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_fp", "_fp2")
      .drop("_fp", "_fp2")
  }

  /** Ingest-time curation: the batch `curate` gates applied as the docs
    * stream in. Quality gate (token count), language gate, and salted
    * split assignment are pure Column expressions — stateless, they
    * compose on a stream unchanged. Decontamination is the one stage that
    * can't stay declarative on a stream: "this doc shares NO gram with
    * the benchmark" needs a per-doc aggregate over join matches, which a
    * stream-static anti-join can't express without stateful aggregation.
    * The benchmark gram set is small by the same assumption the batch
    * path broadcasts it under (eval suites vs a crawl), so it is
    * collected once at stream construction and shipped as a broadcast
    * set; a scalar predicate checks each doc's gram-id array against it
    * executor-side (the standard Bloom/set ingest-gate design — and the
    * one documented UDF in the engine, justified because no built-in can
    * consult a broadcast collection per row). Chain [[dedupStream]]
    * upstream for within-horizon exact dedup.
    */
  def curateStream(spark: SparkSession, inputDir: String, schema: StructType,
      idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 5, minTokens: Int = 30, lang: String = "en",
      salt: String = "curate-v1"): DataFrame = {
    import graft.text.TextAnalysis
    val benchIds = graft.dedup.Dedup
      .shingleIds(bench, benchIdCol, benchTextCol, n)
      .select("shingle").distinct()
      .collect().map(_.getLong(0)).toSet
    val bset = spark.sparkContext.broadcast(benchIds)
    val contaminated = udf((grams: Seq[Long]) =>
      grams != null && grams.exists(bset.value.contains))
    val gated = spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("_t", TextAnalysis.tokens(col(textCol)))
      .withColumn("tokens", size(col("_t")).cast("long"))
      .filter(col("tokens") >= minTokens)
      .filter(TextAnalysis.langIdScored(col(textCol), col("_t")) === lang)
      .filter(!contaminated(graft.dedup.Dedup.gramIdArray(col("_t"), n)))
      .drop("_t")
    graft.pipeline.Splits.assign(gated, idCol, salt,
      trainPerMille = 800, valPerMille = 100)
  }

  /** Write the stream to an in-memory table (tests/demos) or extend with a
    * parquet/Iceberg sink in prod. Complete mode here because a finite
    * AvailableNow run never advances the watermark past the final windows
    * (append mode would hold them back); a continuous prod sink would use
    * append mode and let the watermark flush windows as it passes them.
    */
  def toMemorySink(df: DataFrame, name: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())

  /** Append-mode memory sink for row streams (dedup etc.). */
  def toAppendMemorySink(df: DataFrame, name: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())

  /** PROD-shaped sink: append-mode parquet table + checkpoint. The file
    * sink's manifest log gives exactly-once output files across restarts;
    * source offsets and operator state (window aggregates, dedup
    * fingerprints) live under `checkpointDir`, so a killed run resumed with
    * the same checkpoint neither loses nor duplicates rows — asserted by
    * StreamingSpec's kill-and-resume cases. For windowed aggregations
    * append mode emits each window exactly once, when the watermark passes
    * its end: the continuous-ingest contract (a finite AvailableNow run
    * flushes only windows already behind the watermark; later input
    * advances it). Readers use `spark.read.parquet(path)` — or TableIO —
    * and see only committed files.
    */
  def toParquetSink(df: DataFrame, path: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
}
