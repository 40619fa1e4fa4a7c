package graft

import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextAnalysis
import graft.multimodal.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: dedup family (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), similarity search (brute-force + SRP-LSH), text
  * analysis, multimodal plumbing.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  /** documents + exact copies (id+10000) and near-copies (id+20000, one
    * word appended) of every 10th doc.
    */
  private lazy val corpus: DataFrame = docs.select("doc_id", "text")
    .unionByName(docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text"))
    .unionByName(docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" zzzuniquetoken")).as("text")))
    .cache()

  test("exact dedup keeps min-id survivor per duplicate group") {
    val kept = Dedup.exact(corpus, "doc_id", "text")
    assert(kept.count() == corpus.count() - docs.filter($"doc_id" % 10 === 0).count())
    // every kept id for a duplicated text is the original (min) id
    assert(kept.filter($"doc_id" >= 10000 && $"doc_id" < 20000).count() == 0)
    // near-copies (different text) survive
    assert(kept.filter($"doc_id" >= 20000).count() ==
      docs.filter($"doc_id" % 10 === 0).count())
  }

  test("n-gram Jaccard finds exact and near duplicates with correct scores") {
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      minJaccard = 0.7).cache()
    val exactPairs = pairs.filter($"id_a" < 10000 && $"id_b" === $"id_a" + 10000)
    assert(exactPairs.count() == docs.filter($"doc_id" % 10 === 0).count())
    assert(exactPairs.filter($"jaccard" =!= 1.0).count() == 0,
      "exact copies must have jaccard 1.0")
    // near-copies share all but the trailing shingles
    val nearPairs = pairs.filter($"id_b" === $"id_a" + 20000)
    assert(nearPairs.count() > 0)
    assert(nearPairs.filter($"jaccard" >= 1.0).count() == 0)
  }

  test("MinHash+LSH dedup matches exact Jaccard at high similarity") {
    // r=2, 16 bands: detection prob at s>=0.85 is 1 - (1-s^2)^16 > 0.999
    val lsh = Dedup.minhashDupPairs(corpus, "doc_id", "text",
      n = 3, k = 32, bands = 16, minJaccard = 0.85)
      .select("id_a", "id_b", "jaccard")
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      minJaccard = 0.85).select("id_a", "id_b", "jaccard")
    assertSameRows(lsh, exact, "lsh-verified == exact at tau=0.85")
  }

  test("SimHash: identical docs collide, near-dup pairs found") {
    val sigs = Dedup.simhash(corpus, "doc_id", "text")
    val joined = sigs.as("a").join(sigs.as("b"),
      col("a.id") < 10000 && col("a.id") + 10000 === col("b.id"))
    assert(joined.filter(col("a.simhash") =!= col("b.simhash")).count() == 0,
      "identical text must produce identical simhash")
    val pairs = Dedup.simhashDupPairs(corpus, "doc_id", "text", maxHamming = 3)
    val exactDupPairs = pairs.filter($"id_a" < 10000 && $"id_b" === $"id_a" + 10000)
    assert(exactDupPairs.count() ==
      docs.filter($"doc_id" % 10 === 0).count())
    assert(exactDupPairs.filter($"hamming" =!= 0).count() == 0)
  }

  test("ANN: brute-force top-k is exact; LSH returns true sims and finds planted dup") {
    val planted = emb.select("vec_id", "embedding")
      .unionByName(emb.filter($"vec_id" === 7)
        .select(lit(99999L).as("vec_id"), $"embedding"))
    val brute = Ann.bruteForceTopK(planted, "vec_id", "embedding", 7, 10).cache()
    assert(brute.count() == 10)
    // the planted identical vector has cosine 1 → must be the first row
    // (orderBy().limit() preserves order on collect)
    assert(brute.select("vec_id").as[Long].head() == 99999L)

    val lsh = Ann.lshTopK(planted, "vec_id", "embedding", 7, 10,
      nPlanes = 8, dim = 64).cache()
    // identical vector hashes to the identical bucket → always probed
    assert(lsh.select("vec_id").as[Long].head() == 99999L)
    // every LSH sim equals the exact sim computed by brute scoring
    val bruteAll = planted.filter($"vec_id" =!= 7).crossJoin(
      broadcast(planted.filter($"vec_id" === 7).select($"embedding".as("q"))))
      .select($"vec_id", Ann.cosine($"embedding", $"q").as("sim_exact"))
    val bad = lsh.join(bruteAll, "vec_id")
      .filter(abs($"sim" - $"sim_exact") > 1e-12).count()
    assert(bad == 0, "LSH sims must be exact cosine values")
  }

  test("LSH top-k recall on genuinely-similar neighbors (planted near-dups)") {
    // LSH's contract is recall of SIMILAR items, not of the global top-k of
    // near-uniform noise (where sims are ~0 and bucketing can't help). Plant
    // 12 deterministic near-copies of the query vector (per-coordinate
    // ±0.6% scaling → cosine ≈ 0.99999, same-or-adjacent SRP bucket) and
    // require the multi-probe scan to recover most of them.
    val base = emb.select("vec_id", "embedding")
    val planted = (1 to 12).map { i =>
      base.filter($"vec_id" === 0).select(
        lit(100000L + i).as("vec_id"),
        transform($"embedding",
          (x, j) => x * (lit(1.0f) + lit(0.001f) * pmod(lit(i) + j, lit(7))))
          .as("embedding"))
    }.reduce(_ unionByName _).unionByName(base)
    val brute = Ann.bruteForceTopK(planted, "vec_id", "embedding", 0, 12)
      .select("vec_id").as[Long].collect().toSet
    assert(brute.forall(_ > 100000L), "planted near-dups must be the exact top-12")
    val lsh = Ann.lshTopK(planted, "vec_id", "embedding", 0, 12,
      nPlanes = 8, dim = 64).select("vec_id").as[Long].collect().toSet
    val recall = lsh.count(_ > 100000L).toDouble / 12
    assert(recall >= 0.75, s"planted-neighbor recall too low: $recall")
  }

  test("stop-shingle cap bounds candidates without changing verified pairs") {
    // inject a hot shingle: the same 3-word boilerplate prefix on EVERY doc
    val hot = corpus.select($"doc_id",
      concat(lit("common header boilerplate "), $"text").as("text"))
    val uncapped = Dedup.minhashDupPairs(hot, "doc_id", "text",
      n = 3, k = 32, bands = 16, minJaccard = 0.85)
      .select("id_a", "id_b", "jaccard")
    val capped = Dedup.minhashDupPairs(hot, "doc_id", "text",
      n = 3, k = 32, bands = 16, minJaccard = 0.85,
      maxShingleDf = corpus.count().toInt / 2)
      .select("id_a", "id_b", "jaccard")
    assertSameRows(capped, uncapped, "cap must not change verified pairs")
    // and the hot shingle really is excluded from banding: posting list of
    // the boilerplate shingle exceeds the cap
    val df = Dedup.wordShingles(hot, "doc_id", "text", 3)
      .groupBy("shingle").count()
      .filter($"shingle" === "common header boilerplate")
      .select("count").as[Long].head()
    assert(df > corpus.count() / 2, "injected shingle must be hot")
  }

  test("IVF top-k: planted near-dups recovered, sims exact, cell pruning real") {
    val base = emb.select("vec_id", "embedding")
    val planted = (1 to 12).map { i =>
      base.filter($"vec_id" === 0).select(
        lit(100000L + i).as("vec_id"),
        transform($"embedding",
          (x, j) => x * (lit(1.0f) + lit(0.001f) * pmod(lit(i) + j, lit(7))))
          .as("embedding"))
    }.reduce(_ unionByName _).unionByName(base)
    val ivf = Ann.ivfTopK(planted, "vec_id", "embedding", 0, 12,
      nlist = 8, nprobe = 2).cache()
    val recall = ivf.select("vec_id").as[Long].collect().count(_ > 100000L) / 12.0
    assert(recall >= 0.75, s"planted-neighbor IVF recall too low: $recall")
    // sims are exact cosines
    val exact = planted.filter($"vec_id" =!= 0).crossJoin(
      broadcast(planted.filter($"vec_id" === 0).select($"embedding".as("q"))))
      .select($"vec_id", Ann.cosine($"embedding", $"q").as("sim_exact"))
    assert(ivf.join(exact, "vec_id")
      .filter(abs($"sim" - $"sim_exact") > 1e-9).count() == 0)
    // the probe really prunes: assignment spreads vectors over >1 cell
    val cents = Ann.ivfCentroids(base, "vec_id", "embedding", 8)
    val cells = base.select(Ann.ivfCell($"embedding", cents).as("c"))
      .distinct().count()
    assert(cells > 1, "all vectors in one IVF cell — no pruning possible")
  }

  test("knn join equals per-query lshTopK; guard trips on shared buckets") {
    // same probe rule, same tie-break: the join restricted to one query id
    // must reproduce lshTopK's rows exactly, for several query ids
    val e = emb.select("vec_id", "embedding")
    val knn = Ann.knnJoin(e.filter($"vec_id".isin(0L, 7L, 23L)), e,
      "vec_id", "embedding", k = 10)
      .select($"id", $"neighbor_id", $"sim").as[(Long, Long, Double)]
      .collect().groupBy(_._1)
      .view.mapValues(_.map(r => (r._2, r._3)).sortBy(x => (-x._2, x._1)).toSeq).toMap
    for (q <- Seq(0L, 7L, 23L)) {
      val single = Ann.lshTopK(e, "vec_id", "embedding", q, 10)
        .as[(Long, Double)].collect().toSeq
      assert(knn(q) == single, s"query $q: join != single-query top-k")
    }
    // 30 planted copies of one vector share every probe bucket
    val dupVecs = e.filter($"vec_id" === 0)
      .select(explode(sequence(lit(1000L), lit(1029L))).as("vec_id"),
        $"embedding")
    val eGuard = intercept[Exception] {
      Ann.knnJoin(dupVecs, dupVecs, "vec_id", "embedding", k = 3,
        maxBucket = 10).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(eGuard).flatMap(c => Option(c.getMessage)).mkString
      .contains("knnJoin"), s"wrong error: $eGuard")
  }

  test("embedding cosine near-dup pairs find planted duplicates") {
    val planted = emb.select("vec_id", "embedding")
      .unionByName(emb.filter($"vec_id" % 50 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val pairs = Ann.cosineDupPairs(planted, "vec_id", "embedding",
      minSim = 0.999999, nPlanes = 12, dim = 64)
    val expected = emb.filter($"vec_id" % 50 === 0).count()
    assert(pairs.filter($"id_b" === $"id_a" + 100000).count() == expected,
      "identical vectors share every SRP bucket, so recall must be total")
  }

  test("language ID classifies obvious samples") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy with this", "en"),
      ("der hund ist nicht mit der katze auf dem sofa", "de"),
      ("le chat est dans la maison avec les enfants pour la nuit", "fr"),
      ("el perro es un animal que vive en la casa con su familia", "es"),
      ("我不是他们的人但是这个地方很大", "zh"),
      ("zxqv blorp fnord", "und")).toDF("text", "expected")
    val got = samples.withColumn("pred", TextAnalysis.langId($"text"))
    assert(got.filter($"pred" =!= $"expected").count() == 0,
      got.collect().mkString(", "))
  }

  test("quality scoring orders garbage below prose") {
    val rows = Seq(
      ("good", "The quick brown fox jumps over the lazy dog and runs into the forest with a friend of the family."),
      ("punct", "!!!??? ... ;;; !!! ??? !!!! ,,,, ;;; ::: !!!"),
      ("tiny", "x")).toDF("kind", "text")
    val q = rows.select($"kind", TextAnalysis.quality($"text").as("q"))
      .select($"kind", $"q.quality".as("score"))
      .as[(String, Double)].collect().toMap
    assert(q("good") > q("punct"), s"$q")
    assert(q("good") > q("tiny"), s"$q")
  }

  test("fingerprint is whitespace/case-normalized") {
    val df = Seq("Hello  World", "hello world", "hello\tworld ", "other")
      .toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("fp"))
    assert(df.distinct().count() == 2)
  }

  test("multimodal: binary plumbing + deterministic stub features") {
    val media = Multimodal.mediaFromDocs(docs, "doc_id", "text")
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == docs.count())
    val f = feats.filter($"media_id" === feats.select(min("media_id"))
      .as[Long].head()).head()
    assert(f.features.length == Multimodal.FakeCodec.FeatureDim)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram normalized")
    // determinism: re-extraction yields identical features
    val again = Multimodal.extractFeatures(media)
    assert(feats.select("media_id", "features").exceptAll(
      again.select("media_id", "features")).count() == 0)
  }

  test("multimodal frame sampling: per-frame rows, byte-complete at stride 1") {
    val media = Multimodal.mediaFromDocs(docs, "doc_id", "text").cache()
    val frames = Multimodal.sampleFrames(media, nFrames = 8, stride = 2).cache()
    // every media row expands to ceil(8/2) sampled frames
    assert(frames.count() == docs.count() * 4)
    assert(frames.select("frame_idx").distinct().as[Int].collect().sorted
      .sameElements(Array(0, 2, 4, 6)))
    // stride=1 covers the full payload: frame bytes sum to payload bytes
    val full = Multimodal.sampleFrames(media, nFrames = 8, stride = 1)
      .groupBy("media_id").agg(sum("n_bytes").as("b"))
    val mismatch = full.join(
      media.select($"media_id", length($"payload").cast("long").as("p")), "media_id")
      .filter($"b" =!= $"p").count()
    assert(mismatch == 0, "stride-1 frames must partition the payload")
  }

  test("dup components: transitive chains merge, isolated docs stay singleton") {
    // edges: 1-2, 2-3 (a chain — transitivity required), 5-6; 4 and 7 isolated
    val nodes = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (5L, 6L, 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val got = graft.dedup.Dedup.dupComponents(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L), s"got $got")
    // survivors = one per cluster, the min id
    assert(got.filter { case (id, c) => id == c }.keySet == Set(1L, 4L, 5L, 7L))
  }

  test("collapsed dup components equal the uncollapsed labels") {
    def pairsOf(d: DataFrame) = Dedup.minhashDupPairs(d, "doc_id", "text",
      n = 3, k = 32, bands = 16, minJaccard = 0.8)
    val collapsed = Dedup.dupComponentsCollapsed(corpus, "doc_id",
      TextAnalysis.fingerprint($"text"), pairsOf)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.dupComponents(corpus, "doc_id", pairsOf(corpus))
      .as[(Long, Long)].collect().toMap
    assert(collapsed == full, "collapse must not change any cluster label")
  }

  test("a 10k-copy duplicate class runs O(m) through the collapsed path") {
    // 10,000 identical copies of one page: uncollapsed LSH banding would
    // enumerate ~5x10^7 candidate pairs. Collapsed, the class contributes
    // ONE representative — proven by maxBandBucket=8, which would raise on
    // any band bucket of >8 docs reaching the self-join.
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val viral = (0L until 10000L).map(i =>
      (i, "the same viral boilerplate page text repeated across the crawl"))
    val rest = Seq((20000L, base), (20001L, base + " thirteen"),
      (30000L, "another unrelated text mentioning stars planets comets orbits"))
    val docs10k = (viral ++ rest).toDF("doc_id", "text")
    val labels = Dedup.dupComponentsCollapsed(docs10k, "doc_id",
      TextAnalysis.fingerprint($"text"),
      reps => Dedup.minhashDupPairs(reps, "doc_id", "text",
        n = 3, k = 32, bands = 16, minJaccard = 0.8, maxBandBucket = 8))
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 10003)
    assert((0L until 10000L).forall(labels(_) == 0L),
      "every copy must join the representative's cluster (min id 0)")
    // near-dup family (J = 10/11) still clusters; isolated doc stays put
    assert(labels(20000L) == 20000L && labels(20001L) == 20000L)
    assert(labels(30000L) == 30000L)
  }

  test("band/bucket fan-out guards fail loudly on uncollapsed dup classes") {
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    def msg(t: Throwable): String =
      causes(t).flatMap(c => Option(c.getMessage)).mkString
    val viral = (0L until 50L)
      .map(i => (i, "the same text here repeated again and again"))
      .toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      Dedup.minhashDupPairs(viral, "doc_id", "text", n = 3, k = 32,
        bands = 16, minJaccard = 0.8, maxBandBucket = 10).count()
    }
    assert(msg(e1).contains("lshCandidatePairs"), s"wrong error: $e1")
    val e2 = intercept[Exception] {
      Dedup.simhashDupPairs(viral, "doc_id", "text", maxHamming = 3,
        maxBandBucket = 10).count()
    }
    assert(msg(e2).contains("simhashDupPairs"), s"wrong error: $e2")
    // 30 planted copies of one embedding share their SRP bucket
    val dupVecs = emb.filter($"vec_id" === 0)
      .select(explode(sequence(lit(1000L), lit(1029L))).as("vec_id"),
        $"embedding")
    val e3 = intercept[Exception] {
      Ann.cosineDupPairs(dupVecs, "vec_id", "embedding", minSim = 0.9,
        maxBucket = 10).count()
    }
    assert(msg(e3).contains("cosineDupPairs"), s"wrong error: $e3")
    // exact jaccard: the posting self-join guards its hot shingles too
    val e4 = intercept[Exception] {
      Dedup.jaccardPairs(viral, "doc_id", "text", n = 3, minJaccard = 0.8,
        maxPostingList = 10).count()
    }
    assert(msg(e4).contains("jaccardPairs"), s"wrong error: $e4")
    // the same corpora pass under the default cap
    assert(Dedup.minhashDupPairs(viral, "doc_id", "text", 3, 32, 16, 0.8)
      .count() == 50L * 49L / 2L)
  }

  test("collapsed components equal uncollapsed on random duplicated corpora") {
    // randomized check of the central equivalence claim behind
    // dupComponentsCollapsed: random docs from a tiny vocabulary (organic
    // near-dups), plus injected exact-copy classes of random size — the
    // collapse must reproduce the uncollapsed labels bit-for-bit
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (round <- 0 until 3) {
      val base = (0L until 40L).map { i =>
        val n = 4 + rnd.nextInt(12)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val copies = base.filter(_ => rnd.nextBoolean()).flatMap { case (i, t) =>
        (1 to 1 + rnd.nextInt(3)).map(c => (i + 100L * c + 1000L * round, t))
      }
      val df = (base ++ copies).toDF("doc_id", "text")
      def pairsOf(d: DataFrame) = Dedup.minhashDupPairs(d, "doc_id", "text",
        n = 2, k = 16, bands = 8, minJaccard = 0.7)
      val collapsed = Dedup.dupComponentsCollapsed(df, "doc_id",
        TextAnalysis.fingerprint($"text"), pairsOf)
        .as[(Long, Long)].collect().toMap
      val full = Dedup.dupComponents(df, "doc_id", pairsOf(df))
        .as[(Long, Long)].collect().toMap
      assert(collapsed == full, s"round $round: collapse changed labels")
    }
    // null-key docs (null text -> null fingerprint) become singleton
    // clusters instead of vanishing through the null-rejecting equi-joins
    val withNull = Seq((1L, "a b c"), (2L, "a b c"),
      (9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val labels = Dedup.dupComponentsCollapsed(withNull, "doc_id",
      TextAnalysis.fingerprint($"text"),
      d => Dedup.minhashDupPairs(d, "doc_id", "text", 2, 16, 8, 0.7))
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 9L -> 9L), s"got $labels")
  }

  test("substring dedup matches hand-computed spans (k=4)") {
    import graft.dedup.SubstringDedup
    // d1/d2 share "a b c d" and "b c d e" (cross-doc, overlapping windows
    // merge into one span); d3 repeats its own 4-gram "p q r s" at a gap
    // > k (two spans, within-doc); d4 is shorter than k (present, zero)
    val docs4 = Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d e w"),
      (3L, "p q r s t u p q r s"),
      (4L, "short one two")
    ).toDF("doc_id", "text")
    val got = SubstringDedup.repeatedSpans(docs4, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((6L, 5L, 1L)),   // starts {0,1}: tokens a..e covered
      2L -> ((7L, 5L, 1L)),   // starts {1,2}: tokens a..e covered
      3L -> ((10L, 8L, 2L)),  // starts {0,6}: two disjoint 4-token spans
      4L -> ((3L, 0L, 0L))), s"got $got")
  }

  test("substring cut removes covered spans, keeps order, empties survive") {
    import graft.dedup.SubstringDedup
    val docs4 = Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d e w"),
      (3L, "p q r s t u p q r s"),
      (4L, "short one two"),
      (5L, "a b c d e a b c d e") // entirely covered -> empty text_clean
    ).toDF("doc_id", "text")
    val got = SubstringDedup.cutSpans(docs4, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((6L, 1L, "f")),
      2L -> ((7L, 2L, "z w")),
      3L -> ((10L, 2L, "t u")),
      4L -> ((3L, 3L, "short one two")),
      5L -> ((10L, 0L, ""))), s"got $got")
  }

  test("substring dedup matches a reference coverage implementation") {
    import graft.dedup.SubstringDedup
    // reference computes MATERIALIZED covered-position sets and counts
    // maximal runs — independent of the engine's gap-arithmetic formula
    val k = 4
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus6 = (0L until 60L).map { i =>
      val n = 3 + rnd.nextInt(30)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val counts = corpus6.flatMap { case (_, t) =>
      val tk = t.split(" ").toSeq
      (0 to tk.size - k).map(p => tk.slice(p, p + k).mkString(" "))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val expected = corpus6.map { case (id, t) =>
      val tk = t.split(" ").toSeq
      val ps = (0 to tk.size - k)
        .filter(p => counts(tk.slice(p, p + k).mkString(" ")) >= 2)
      val covered = ps.flatMap(p => p until p + k).toSet
      val runs =
        if (covered.isEmpty) 0
        else 1 + covered.toSeq.sorted.sliding(2)
          .count { case Seq(a, b) => b > a + 1; case _ => false }
      id -> ((tk.size.toLong, covered.size.toLong, runs.toLong))
    }.toMap
    val got = SubstringDedup
      .repeatedSpans(corpus6.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
  }

  test("decontaminate flags n-gram overlap with the benchmark set only") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corp = Seq(
      (1L, "x alpha beta gamma delta epsilon y"), // one 5-gram overlap
      (2L, "alpha beta gamma delta epsilon zeta"), // full leak: 2 grams
      (3L, "totally different words here none shared"),
      (4L, "short")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corp, "doc_id", "text",
      bench, "doc_id", "text", n = 5).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), s"got $got")
  }

  test("line dedup drops corpus-frequent lines, keeps order, empties survive") {
    val pages = Seq(
      (1L, "HEADER\nunique one\nshared body\nTAIL"),
      (2L, "HEADER\nshared body\nunique two\nTAIL"),
      (3L, "HEADER\nTAIL"), // all lines boilerplate -> empty
      (4L, "solo page line\nrepeat\nrepeat") // in-doc repeat: df=1, kept
    ).toDF("page_id", "text")
    val got = Dedup.dropDuplicateLines(pages, "page_id", "text", minDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 3L, "unique one")))
    assert(got(2L) == ((1L, 3L, "unique two")))
    assert(got(3L) == ((0L, 2L, "")))
    assert(got(4L) == ((3L, 0L, "solo page line\nrepeat\nrepeat")))
  }

  test("hash split is deterministic, salt-keyed, and respects thresholds") {
    val ids = spark.range(2000).toDF("doc_id")
    val a = graft.pipeline.Splits.assign(ids, "doc_id", "s1", 800, 100)
      .select("doc_id", "bucket", "split").as[(Long, Long, String)].collect()
    assert(a.forall { case (_, b, s) =>
      b >= 0 && b < 1000 &&
        s == (if (b < 800) "train" else if (b < 900) "val" else "test")
    })
    // stable across recomputation
    val a2 = graft.pipeline.Splits.assign(ids, "doc_id", "s1", 800, 100)
      .select("doc_id", "bucket", "split").as[(Long, Long, String)].collect()
    assert(a.sortBy(_._1).sameElements(a2.sortBy(_._1)))
    // a different salt re-rolls a substantial fraction
    val b = graft.pipeline.Splits.assign(ids, "doc_id", "s2", 800, 100)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val moved = a.count { case (id, bk, _) => b(id) != bk }
    assert(moved > 1000, s"only $moved buckets moved under a new salt")
    // split sizes near 80/10/10 (binomial tolerance)
    val frac = a.count(_._3 == "train").toDouble / a.length
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac")
  }

  test("token-budget packing: prefix-sum bins, per-shard independence") {
    val docs = Seq(
      (1L, 0L, 600L), (2L, 0L, 600L), (3L, 0L, 600L), (4L, 0L, 600L),
      (10L, 1L, 2000L), (11L, 1L, 100L), (12L, 1L, 5000L), (13L, 1L, 10L)
    ).toDF("doc_id", "shard", "tokens")
    val got = graft.pipeline.Packing
      .tokenBudgetBins(docs, "doc_id", "tokens", "shard", budget = 1024)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // shard 0: prefix-before 0,600,1200,1800 -> bins 0,0,1,1
    // shard 1: prefix-before 0,2000,2100,7100 -> bins 0,1,2,6 (restarts per shard)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      10L -> 0L, 11L -> 1L, 12L -> 2L, 13L -> 6L), s"got $got")
  }

  test("dup components match a reference union-find on random graphs") {
    val rng = new scala.util.Random(4242)
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (trial <- 1 to 8) {
      val n = 10 + rng.nextInt(30)
      val nEdges = rng.nextInt(n)
      val edges = Seq.fill(nEdges) {
        val a = rng.nextInt(n); val b = rng.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val nodes = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.dupComponents(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, edges), s"trial $trial n=$n edges=$edges")
    }
    // a 12-node chain: diameter 11 forces many propagation rounds
    val chain = (0L until 11L).map(i => (i, i + 1))
    val got = Dedup.dupComponents((0L to 11L).toDF("doc_id"), "doc_id",
      chain.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L) && got.size == 12)
  }

  test("line dedup matches a reference implementation on random corpora") {
    val rng = new scala.util.Random(777)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "nav", "footer")
    def randLine() = Seq.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 5) {
      val docs = (1L to (3 + rng.nextInt(6)).toLong).map { id =>
        (id, Seq.fill(1 + rng.nextInt(5))(randLine()).mkString("\n"))
      }
      // reference: df = distinct docs per line; keep lines with df < 2
      val df = docs.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val want = docs.map { case (id, t) =>
        val kept = t.split("\n", -1).filter(l => df(l) < 2)
        (id, kept.length.toLong, (t.split("\n", -1).length - kept.length).toLong,
          kept.mkString("\n"))
      }.toSet
      val got = Dedup.dropDuplicateLines(docs.toDF("doc_id", "text"),
        "doc_id", "text", minDf = 2)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == want, s"trial $trial docs=$docs")
    }
  }

  test("exact dedup collapses physically duplicated rows to one survivor") {
    val docs = Seq((1L, "same text"), (1L, "same text"), (2L, "same text"),
      (3L, "other text")).toDF("doc_id", "text")
    val kept = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, String)].collect().sorted
    assert(kept.toSeq == Seq((1L, "same text"), (3L, "other text")), s"got ${kept.toSeq}")
  }

  test("weighted mixing matches a reference md5 implementation exactly") {
    import graft.pipeline.Mixing
    val rates = Map("web" -> 600, "code" -> 1000, "books" -> 2500, "junk" -> 0)
    val input = docs.select($"doc_id",
      element_at(array(lit("web"), lit("code"), lit("books"), lit("junk")),
        ($"doc_id" % 4 + 1).cast("int")).as("domain"))
    val got = Mixing.sampleWeighted(input, "doc_id", "domain", rates, "mix-v1")
      .select($"doc_id", $"domain", $"copy").as[(Long, String, Int)]
      .collect().toSet
    // reference: same salted md5 bucket + copies rule in plain Scala
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"$id:mix-v1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1000
    }
    val domains = Vector("web", "code", "books", "junk")
    val expected = docs.select($"doc_id").as[Long].collect().flatMap { id =>
      val dom = domains((id % 4).toInt)
      val r = rates(dom)
      val n = r / 1000 + (if (bucket(id) < r % 1000) 1 else 0)
      (0 until n).map(c => (id, dom, c))
    }.toSet
    assert(got == expected)
    // the mix exercises all four behaviors on this corpus
    val byDom = got.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val inDom = docs.select(($"doc_id" % 4).as("d")).groupBy("d").count()
      .as[(Long, Long)].collect().toMap
    assert(!byDom.contains("junk"))
    assert(byDom("code") == inDom(1L).toInt)          // pass-through
    assert(byDom("web") < inDom(0L))                  // down-sampled
    assert(byDom("books") > 2 * inDom(2L).toInt)      // up-sampled >2x
  }

  test("tf-idf top terms match a hand-computed corpus") {
    val tiny = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    val got = graft.text.Tfidf.topTerms(tiny, "doc_id", "text", nDocs = 3, k = 2)
      .select($"id", $"term", $"tf", $"df", $"tf_idf", $"rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSet
    // df: apple 2, banana 2, cherry 1; idf = 3/df
    val expected = Set(
      (1L, "apple", 2L, 2L, 3.0, 1), (1L, "banana", 1L, 2L, 1.5, 2),
      (2L, "cherry", 1L, 1L, 3.0, 1), (2L, "banana", 1L, 2L, 1.5, 2),
      (3L, "apple", 1L, 2L, 1.5, 1))
    assert(got == expected, s"got $got")
  }

  test("hot n-grams report document frequencies with deterministic top-k") {
    val tiny = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown dog"),
      (3L, "the quick brown cat"), (4L, "lazy dog sleeps here")
    ).toDF("doc_id", "text")
    val got = graft.text.Tfidf.hotNgrams(tiny, "doc_id", "text",
      n = 3, minDf = 2, k = 5).as[(String, Long)].collect().toSeq
    assert(got == Seq(("the quick brown", 3L)), s"got $got")
  }

  test("pii scrub redacts emails, ipv4, and phones; clean text untouched") {
    import graft.text.Scrub
    val t = Seq(
      (1L, "mail a.b+c@ex-ample.org now 192.168.1.255 call +4915512345678 end"),
      (2L, "no pii here, just 3.14 and v1.2.3 version strings")
    ).toDF("id", "text")
    val rows = t.select($"id", Scrub.scrub($"text").as("c"),
        Scrub.piiCounts($"text").as("p"))
      .select($"id", $"c", $"p.emails", $"p.ips", $"p.phones")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows(0) == ((1L, "mail <EMAIL> now <IP> call <PHONE> end", 1L, 1L, 1L)),
      s"got ${rows(0)}")
    // version strings / decimals are NOT ipv4 (needs 4 dotted groups)
    assert(rows(1)._2 == "no pii here, just 3.14 and v1.2.3 version strings" &&
      rows(1)._3 == 0 && rows(1)._4 == 0 && rows(1)._5 == 0, s"got ${rows(1)}")
  }

  test("token chunks cover the doc with the configured stride and overlap") {
    import graft.pipeline.Chunking
    val t = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "")).toDF("id", "text")
    val got = Chunking.tokenChunks(t, "id", "text", chunkTokens = 4, strideTokens = 3)
      .select("id", "chunk_idx", "start_tok", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 9L, 1L, "t9")), s"got $got")
    // empty doc -> zero chunks, not a downward-counting explode
    assert(got.forall(_._1 == 1L))
  }

  test("group sample equals the naive per-group rank (skew + small groups)") {
    import graft.pipeline.{GroupSample, Splits}
    import org.apache.spark.sql.expressions.Window
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (1000L to 1029L).map(i => (i, "tiny"))).toDF("id", "g")
    val got = GroupSample.sampleKPerGroup(df, "id", "g", k = 50, salt = "s1")
      .select("id", "g").as[(Long, String)].collect().toSet
    val ref = df.withColumn("sb", Splits.bucket($"id", "s1", 4096))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"sb", $"id")))
      .filter($"rn" <= 50).select("id", "g").as[(Long, String)].collect().toSet
    assert(got == ref)
    // exact k from the big group; the whole under-k group
    assert(got.count(_._2 == "big") == 50 && got.count(_._2 == "tiny") == 30)
    // null-group rows are excluded, not sampled
    val withNull = df.unionByName(
      Seq((5000L, null.asInstanceOf[String])).toDF("id", "g"))
    assert(GroupSample.sampleKPerGroup(withNull, "id", "g", 50, "s1")
      .filter($"g".isNull).count() == 0)
  }

  test("group sample stays a flat broadcast-plan join at 10^4 groups") {
    import graft.pipeline.GroupSample
    // 10^4 distinct groups × 3 rows: the former per-group literal
    // when-chain hit Catalyst expression-tree/codegen limits here; the
    // broadcast plan-table join must both COMPLETE and keep the selection
    // exact (k=2 of 3 per group)
    val df = (0L until 30000L).map(i => (i, s"g${i % 10000}")).toDF("id", "g")
    val sampled = GroupSample.sampleKPerGroup(df, "id", "g", k = 2, salt = "s2")
    assert(sampled.count() == 20000L)
    assert(sampled.groupBy("g").count().filter($"count" =!= 2).count() == 0)
    // the guard fails loudly (bounded limit-collect, never a driver OOM)
    val e = intercept[IllegalArgumentException] {
      GroupSample.sampleKPerGroup(df, "id", "g", 2, "s2", maxGroups = 100)
    }
    assert(e.getMessage.contains("maxGroups") ||
      e.getMessage.contains("distinct values"), e.getMessage)
  }

  test("group percentiles equal a naive sorted reference; nulls excluded") {
    import graft.pipeline.GroupQuantiles
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (50 + rnd.nextInt(100))
    } yield (g, rnd.nextInt(40).toLong)
    val pcts = Seq(1, 25, 50, 90, 99, 100)
    val got = GroupQuantiles.percentiles(rows.toDF("g", "v"), "g", "v", pcts)
      .collect().map(r => r.getString(0) ->
        pcts.indices.map(i => r.getLong(i + 1)).toSeq).toMap
    val ref = rows.groupBy(_._1).view.mapValues { vs =>
      val sorted = vs.map(_._2).sorted
      pcts.map(p => sorted(((sorted.size.toLong * p + 99L) / 100L).toInt - 1))
    }.toMap
    assert(got == ref, s"got $got\nref $ref")
    // null values drop out of the histogram and the rank denominator
    val withNull = rows.toDF("g", "v").unionByName(
      Seq(("a", null.asInstanceOf[java.lang.Long])).toDF("g", "v"))
    val got2 = GroupQuantiles.percentiles(withNull, "g", "v", Seq(100))
      .filter($"g" === "a").select("p100").as[Long].head()
    assert(got2 == ref("a").last)
  }

  test("edge cases: substring minCount, knn small pools, empty quantiles") {
    import graft.dedup.SubstringDedup
    import graft.pipeline.GroupQuantiles
    // minCount=3: the pair-only gram survives, the triple flags
    val d3 = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"),
      (4L, "x y z w"), (5L, "x y z w")).toDF("doc_id", "text")
    val spans = SubstringDedup.repeatedSpans(d3, "doc_id", "text",
      k = 4, minCount = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(spans == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 0L, 5L -> 0L),
      s"got $spans")
    // k far beyond the probe-candidate pool: returns what exists, ranks
    // stay dense from 1
    val tiny = emb.filter($"vec_id" < 6).select("vec_id", "embedding")
    val knn = Ann.knnJoin(tiny, tiny, "vec_id", "embedding", k = 50)
    assert(knn.count() <= 30 && knn.filter($"rank" > 5).count() == 0)
    // empty input: empty result, no crash
    assert(GroupQuantiles.percentiles(
      Seq.empty[(String, Long)].toDF("g", "v"), "g", "v", Seq(50)).count() == 0)
  }

  test("quantile gate keeps the top fraction with content-based ties") {
    import graft.pipeline.QuantileGate
    val scores = Seq((1L, 0.95), (2L, 0.90), (3L, 0.90), (4L, 0.50), (5L, 0.10))
      .toDF("id", "s")
    // keep 0.4 of 5 -> k=2; the 0.90 bucket straddles the cut, so the WHOLE
    // bucket is kept (content-based ties): ids 1,2,3
    val kept = QuantileGate.keepTopFraction(scores, "s", 0.4)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), s"got $kept")
    assert(QuantileGate.keepTopFraction(scores, "s", 1.0).count() == 5)
    // keepFraction so small that k=1 -> only the top bucket
    assert(QuantileGate.keepTopFraction(scores, "s", 0.1)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // empty input passes through empty, no crash
    assert(QuantileGate.keepTopFraction(scores.filter($"id" > 99), "s", 0.5)
      .count() == 0)
  }

  test("exact dedup rejects inputs that already use the reserved _fp column") {
    val clash = Seq((1L, "t", "x")).toDF("doc_id", "text", "_fp")
    val e = intercept[IllegalArgumentException] {
      Dedup.exact(clash, "doc_id", "text")
    }
    assert(e.getMessage.contains("_fp"))
  }

  test("dup components free superseded per-round checkpoints") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // diameter-11 chain: ~11 propagation rounds, so a leak would pin ~12
    // checkpoint RDDs plus the edge cache
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.dupComponents((0L to 11L).toDF("doc_id"), "doc_id", chain)
    assert(labels.count() == 12)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    // only the FINAL labels materialization may stay pinned — a
    // localCheckpoint the SQL cache manager can't see, released on plan
    // GC or an explicit RDD-level unpersist sweep (the Bench inter-query
    // sweep; see the Dedup materialization contract)
    assert(added.size <= 1, s"leaked persisted RDDs: $added")
  }

  test("dup components fail loudly when maxIter is too small to converge") {
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 11L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.dupComponents(nodes, "doc_id", chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("multimodal resize average-pools feature bins") {
    val media = Multimodal.mediaFromDocs(docs.limit(20), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).toDF()
    val both = feats.select($"media_id", $"features",
      Multimodal.resizeFeatures($"features", 16, 4).as("small")).cache()
    assert(both.filter(size($"small") =!= 4).count() == 0)
    // pooled sum equals original sum (up to float assoc error)
    val bad = both.select(
      aggregate($"features", lit(0.0f), (a, v) => a + v).as("s1"),
      (aggregate($"small", lit(0.0f), (a, v) => a + v) * 4).as("s2"))
      .filter(abs($"s1" - $"s2") > 1e-3).count()
    assert(bad == 0)
  }
}
