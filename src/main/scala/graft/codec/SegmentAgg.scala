package graft.codec

import graft.Turn
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Encoded blobs of one transcript segment (before attaching key columns). */
case class SegBlobs(
    seq_no: Int,
    n: Int,
    tsBlob: Array[Byte],
    idxBlob: Array[Byte],
    roleBlob: Array[Byte],
    toolBlob: Array[Byte],
    textBlob: Array[Byte])

/** Order-tolerant aggregation buffer: parallel column vectors of the turns
  * seen so far, in ARBITRARY arrival order. `finish` sorts by turn_idx and
  * encodes — so the result is identical at any parallelism / input order
  * (SURVEY.md §7.4.1,3: merge step restores turn_idx order).
  */
case class SegBuf(
    idx: Vector[Int],
    ts: Vector[Long],
    role: Vector[String],
    tool: Vector[String],
    text: Vector[String])

object SegBuf { val empty: SegBuf = SegBuf(Vector.empty, Vector.empty, Vector.empty, Vector.empty, Vector.empty) }

/** The engine's one custom aggregate (SURVEY.md §2.9 C1, §2.4 A4): builds a
  * compressed per-(conv_id, bucket) segment from turns. Typed
  * `Aggregator` — Spark plans it with map-side partial aggregation
  * (`reduce`/`merge` run distributed; only `finish` pays the encode).
  *
  * The analog of the reference's per-variable write loop
  * (`reshaper.py :: Slice2SeriesReshaper.convert` slab writes via
  * `iobackend.py :: NCVariable.__setitem__`) — but as a shuffle-native
  * aggregate instead of per-rank file IO.
  *
  * `maxPoints` caps points per sub-segment (the analog of chunked IO,
  * `s2srun -c`): finish splits the sorted buffer into chunks with
  * consecutive seq_no, keeping any single output row's memory bounded.
  */
class SegmentAgg(deflateLevel: Int, maxPoints: Int)
    extends Aggregator[Turn, SegBuf, Seq[SegBlobs]] with Serializable {

  override def zero: SegBuf = SegBuf.empty

  override def reduce(b: SegBuf, t: Turn): SegBuf =
    SegBuf(b.idx :+ t.turn_idx, b.ts :+ SegmentAgg.toMicros(t.ts),
      b.role :+ t.role, b.tool :+ t.tool, b.text :+ t.text)

  override def merge(a: SegBuf, b: SegBuf): SegBuf =
    SegBuf(a.idx ++ b.idx, a.ts ++ b.ts, a.role ++ b.role,
      a.tool ++ b.tool, a.text ++ b.text)

  override def finish(b: SegBuf): Seq[SegBlobs] = {
    val order = b.idx.indices.sortBy(b.idx(_)) // restore turn_idx order
    order.grouped(maxPoints).zipWithIndex.map { case (chunk, seqNo) =>
      SegBlobs(
        seq_no = seqNo,
        n = chunk.length,
        tsBlob = Gorilla.encodeTimestamps(chunk.map(b.ts(_)).toArray),
        idxBlob = Gorilla.encodeTimestamps(chunk.map(i => b.idx(i).toLong).toArray),
        roleBlob = Gorilla.encodeStrings(chunk.map(b.role(_)).toArray),
        toolBlob = Gorilla.encodeStrings(chunk.map(b.tool(_)).toArray),
        textBlob = Gorilla.encodeTexts(chunk.map(b.text(_)).toArray, deflateLevel))
    }.toSeq
  }

  override def bufferEncoder: Encoder[SegBuf] = Encoders.product[SegBuf]
  override def outputEncoder: Encoder[Seq[SegBlobs]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SegBlobs]]()
}

object SegmentAgg {
  /** Epoch MICROseconds — full Spark TimestampType precision (getTime alone
    * truncates to millis, which would break the per-turn equality invariant
    * on µs-resolution inputs).
    */
  def toMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}

/** Numeric-series variant: (tsMillis, value) → DoD + Gorilla-XOR blobs.
  * Used for metric series (e.g. the events table's `value` column).
  *
  * `leastSignificantDigit` is the engine's analog of the reference's lossy
  * truncation knob (`specification.py :: Specifier` least_significant_digit
  * on the netcdf4c path): when set to d, values are quantized to the
  * power-of-two grid just finer than 10^-d before XOR encoding — the
  * netCDF4 bit-grooming rule `rint(v·2^ceil(d·log2(10))) / 2^…` — which
  * zeroes trailing mantissa bits so the XOR codec's meaningful-bit windows
  * collapse. Deliberately LOSSY (error ≤ 0.5·10^-d); default None is the
  * lossless path.
  */
case class ValuePoint(ts: Long, value: Double)
case class ValueBuf(ts: Vector[Long], value: Vector[Double])
case class ValueBlobs(n: Int, tsBlob: Array[Byte], valBlob: Array[Byte])

class ValueSegAgg(leastSignificantDigit: Option[Int] = None)
    extends Aggregator[ValuePoint, ValueBuf, ValueBlobs] with Serializable {
  private val scaleOpt: Option[Double] = leastSignificantDigit.map { d =>
    math.pow(2.0, math.ceil(d * (math.log(10.0) / math.log(2.0))))
  }
  private def quantize(v: Double): Double = scaleOpt match {
    case Some(s) => math.rint(v * s) / s // NaN/Inf pass through unchanged
    case None => v
  }
  override def zero: ValueBuf = ValueBuf(Vector.empty, Vector.empty)
  override def reduce(b: ValueBuf, p: ValuePoint): ValueBuf =
    ValueBuf(b.ts :+ p.ts, b.value :+ p.value)
  override def merge(a: ValueBuf, b: ValueBuf): ValueBuf =
    ValueBuf(a.ts ++ b.ts, a.value ++ b.value)
  override def finish(b: ValueBuf): ValueBlobs = {
    val order = b.ts.indices.sortBy(i => (b.ts(i), b.value(i)))
    ValueBlobs(order.length,
      Gorilla.encodeTimestamps(order.map(b.ts(_)).toArray),
      Gorilla.encodeValues(order.map(i => quantize(b.value(i))).toArray))
  }
  override def bufferEncoder: Encoder[ValueBuf] = Encoders.product[ValueBuf]
  override def outputEncoder: Encoder[ValueBlobs] = Encoders.product[ValueBlobs]
}
