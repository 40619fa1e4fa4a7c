package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns plus a typed metadata struct; feature extraction runs
  * batched per partition.
  *
  * The Spark-side plumbing (schema, partition-batched execution, feature
  * shape) is real and tested; the actual media DECODE is stubbed behind
  * [[FakeCodec]] — this container ships no image/audio libraries, so the
  * stub is a clearly-marked deterministic byte-level featurizer with the
  * same signature a libjpeg/ffmpeg-backed decoder would have. Swap
  * [[FakeCodec.decodeFeatures]] for the real thing in prod; nothing else
  * changes.
  *
  * In PySpark this stage would be `mapInPandas` (arrow-batched); the Scala
  * analog used here is `mapPartitions` over a typed Dataset — same batch
  * shape (an iterator per partition, vectorizable inside), no per-row UDF
  * dispatch.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata (the schema a real
    * ingest — e.g. parquet files of image bytes — would carry).
    */
  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int,
      payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** STUB media decoder — deterministic, dependency-free. A real
    * implementation decodes the payload (JPEG/PNG/WAV/frame-sampled video)
    * and emits model-ready features; this one emits a normalized 16-bin
    * byte histogram so the pipeline shape, determinism, and tests are real.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) / FeatureDim) += 1f
        i += 1
      }
      val n = math.max(1, payload.length).toFloat
      hist.map(_ / n)
    }
  }

  /** Synthesize a deterministic media table from any text corpus (payload =
    * UTF-8 bytes; width/height derived) — stands in for real binary ingest.
    */
  def mediaFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      (pmod(xxhash64(col(textCol)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(1080)) + 1).cast("int").as("height"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched feature extraction: partition-parallel, no shuffle — the
    * decode stage of a multimodal training-data pipeline.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          FakeCodec.decodeFeatures(r.payload))
      }
    }
  }

  case class FrameFeatures(media_id: Long, frame_idx: Int, n_bytes: Long,
      features: Array[Float])

  /** Frame sampling for video-kind payloads: treat the payload as
    * `nFrames` contiguous byte slices (the stand-in for real frame decode)
    * and featurize every `stride`-th frame — one output row per sampled
    * frame. Partition-parallel flatMap, no shuffle; the 1→N row expansion
    * happens executor-side, which is the shape a real ffmpeg-backed frame
    * sampler needs (a video row must never inflate on the driver or across
    * the shuffle as raw frames).
    */
  def sampleFrames(media: DataFrame, nFrames: Int, stride: Int): Dataset[FrameFeatures] = {
    require(nFrames > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val frameLen = math.max(1, r.payload.length / nFrames)
      (0 until nFrames by stride).iterator.map { f =>
        val from = math.min(f * frameLen, r.payload.length)
        val until =
          if (f == nFrames - 1) r.payload.length
          else math.min(r.payload.length, from + frameLen)
        val slice = java.util.Arrays.copyOfRange(r.payload, from, math.max(from, until))
        FrameFeatures(r.media_id, f, slice.length.toLong,
          FakeCodec.decodeFeatures(slice))
      }
    }
  }

  /** "Resize" a feature vector by average-pooling adjacent bins (the
    * histogram stand-in for image resizing): `newDim` must divide the
    * input dim. Pure Column expression — stays inside codegen.
    */
  def resizeFeatures(features: org.apache.spark.sql.Column, oldDim: Int,
      newDim: Int): org.apache.spark.sql.Column = {
    require(newDim > 0 && oldDim % newDim == 0,
      s"newDim=$newDim must divide oldDim=$oldDim")
    val k = oldDim / newDim
    transform(sequence(lit(0), lit(newDim - 1)), i =>
      (aggregate(slice(features, i * k + 1, lit(k)), lit(0.0f),
        (acc, v) => acc + v) / k).cast("float"))
  }
}
