package graft

import graft.gen.Synth
import graft.pivot.SeriesPivot

/** The PyReshaper-analog slice-to-series equivalence invariant
  * (BASELINE.json input_hint; SURVEY.md §5.1): pivot → decode must
  * reproduce the input exactly — per-turn text equality under stable
  * (conv_id, turn_idx) ordering, both directions (no loss, no
  * duplication, no reorder).
  */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val turns = Synth.tiny(spark).cache()
  private val cfg = RollupConfig(inputPath = "", outputRoot = "")

  test("synth fixture is non-trivial and deterministic") {
    val n = turns.count()
    assert(n > 500, s"fixture too small: $n")
    // re-generation yields identical rows (pure hash-based, no RNG state)
    assertSameRows(Synth.tiny(spark).toDF(), turns.toDF(), "synth determinism")
    // skew present: hottest conversation >> median
    val counts = turns.groupBy("conv_id").count().collect().map(_.getLong(1)).sorted
    assert(counts.last > counts(counts.length / 2) * 5, "expected skewed conv sizes")
  }

  test("pivot → decode reproduces input exactly (1h tier)") {
    val segs = SeriesPivot.segments(turns, Tier.Hour, cfg)
    val decoded = SeriesPivot.decode(segs)
    assertSameRows(decoded.toDF(), turns.toDF(), "pivot roundtrip 1h")
  }

  test("pivot → decode reproduces input exactly (1d tier)") {
    val segs = SeriesPivot.segments(turns, Tier.Day, cfg)
    assertSameRows(SeriesPivot.decode(segs).toDF(), turns.toDF(), "pivot roundtrip 1d")
  }

  test("all three pivot strategies produce byte-identical segments") {
    def canon(ds: org.apache.spark.sql.Dataset[Segment]) =
      ds.map(s => (s.conv_id, s.bucket, s.seq_no, s.n, s.tsBlob.toSeq,
        s.idxBlob.toSeq, s.roleBlob.toSeq, s.toolBlob.toSeq, s.textBlob.toSeq))
    val direct = canon(SeriesPivot.segments(turns, Tier.Hour, cfg))
    val salted = canon(SeriesPivot.segmentsSalted(turns, Tier.Hour, cfg))
    val sorted = canon(SeriesPivot.segmentsSorted(turns, Tier.Hour, cfg))
    assertSameRows(direct.toDF(), salted.toDF(), "salted == direct")
    assertSameRows(direct.toDF(), sorted.toDF(), "sorted == direct")
  }

  test("sorted pivot → decode reproduces input exactly") {
    val segs = SeriesPivot.segmentsSorted(turns, Tier.Hour, cfg)
    assertSameRows(SeriesPivot.decode(segs).toDF(), turns.toDF(),
      "sorted pivot roundtrip")
  }

  test("sorted pivot respects maxPointsPerSegment") {
    val smallCap = cfg.copy(maxPointsPerSegment = 7)
    val segs = SeriesPivot.segmentsSorted(turns, Tier.Day, smallCap).cache()
    assert(segs.filter(_.n > 7).count() == 0, "segment over cap")
    assertSameRows(SeriesPivot.decode(segs).toDF(), turns.toDF(),
      "sorted split roundtrip")
  }

  test("pivot is input-partitioning invariant") {
    val shuffled = turns.repartition(7) // arbitrary re-partitioning/order
    val a = SeriesPivot.decode(SeriesPivot.segments(shuffled, Tier.Hour, cfg))
    assertSameRows(a.toDF(), turns.toDF(), "partitioning invariance")
  }

  test("segment split respects maxPointsPerSegment with consecutive seq_no") {
    val smallCap = cfg.copy(maxPointsPerSegment = 7)
    val segs = SeriesPivot.segments(turns, Tier.Day, smallCap).cache()
    assert(segs.filter(_.n > 7).count() == 0, "segment over cap")
    assertSameRows(SeriesPivot.decode(segs).toDF(), turns.toDF(), "split roundtrip")
  }

  test("compression: metadata blobs beat raw encoding on dense series") {
    // dense fixture: few conversations with many turns → long segments
    val dense = Synth.turns(spark, nConvs = 3, baseTurns = 4000, hotFactor = 1)
    val segs = SeriesPivot.segments(dense, Tier.Day, cfg)
    val stats = SeriesPivot.compressionStats(segs).collect()(0)
    val tsBpp = stats.getAs[Double]("tsBytesPerPoint")
    val metaBpp = stats.getAs[Double]("metaBytesPerPoint")
    // raw encoding: 8B ts + 8B idx + ~5B role + ~2B tool ≈ 23 B/point
    assert(tsBpp < 4.0, s"ts bytes/point $tsBpp")
    assert(metaBpp < 8.0, s"metadata bytes/point $metaBpp")
  }

  test("compression golden: exact blob bytes on the pinned dense fixture") {
    // segment_stats has no SQL oracle (blob-byte accounting isn't
    // SQL-expressible), so this is its correctness anchor: EXACT per-blob
    // byte totals on a pinned deterministic fixture, verified
    // parallelism-invariant (same totals at local[4]/16 parts and
    // local[13]/7 parts when recorded). Any unintended codec change —
    // bit layout, deflate level, dictionary order, split boundaries —
    // moves at least one of these numbers.
    val dense = Synth.turns(spark, nConvs = 3, baseTurns = 4000, hotFactor = 1)
    val segs = SeriesPivot.segments(dense, Tier.Day, cfg)
    import org.apache.spark.sql.functions._
    val r = segs.toDF().agg(
      sum("n"), count(lit(1)),
      sum(length(col("tsBlob"))), sum(length(col("idxBlob"))),
      sum(length(col("roleBlob"))), sum(length(col("toolBlob"))),
      sum(length(col("textBlob")))).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
    val golden = (9166L, 9L, 10628L, 1941L, 9373L, 9332L, 187989L)
    assert(got == golden,
      s"(points, segs, ts, idx, role, tool, text) bytes drifted: $got != $golden")
  }
}
