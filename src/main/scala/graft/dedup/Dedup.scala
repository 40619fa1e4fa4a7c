package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. All pure DataFrame programs (one logical
  * plan per operator, no driver loops):
  *
  *  - shingling / signatures are per-row `Column` expressions (codegen'd);
  *  - candidate generation is an equi-join on posting/band/bucket keys —
  *    hash-partitioned, AQE-balanced;
  *  - only candidates pay the exact-verification cost (the LSH contract).
  *
  * Scale notes (100 TB): exact-Jaccard all-pairs is quadratic per posting
  * list and only used for small corpora / verification; MinHash-LSH is the
  * scale path — candidate count is governed by band collisions, not corpus
  * size. Stop-shingles (posting lists of millions — boilerplate headers in
  * a web crawl) are capped at candidate-generation time only via
  * `maxShingleDf`: shingles above the document-frequency cap are dropped
  * from signature/banding but KEPT in verification, so the verified Jaccard
  * is unbiased while one hot shingle can no longer explode a posting join.
  */
object Dedup {

  /** Word n-gram shingles, one row per (id, distinct shingle). Documents
    * shorter than n words contribute their whole token string.
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
    docs.select(col(idCol).as("id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact pairwise n-gram Jaccard over co-shingled pairs (id_a < id_b,
    * jaccard >= minJaccard). Exact — the small-corpus baseline and the
    * verifier behind LSH.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double): DataFrame = {
    val sh = wordShingles(docs, idCol, textCol, n).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"), "shingle")
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: k independent hash families via seeded xxhash64;
    * one groupBy with k MIN aggregates (map-side partials, no UDAF).
    */
  def minhashSignatures(shingles: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    shingles.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-minhash signature into `bands` bands of
    * k/bands rows; docs colliding on any full band become candidates.
    */
  def lshCandidatePairs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandHashes = array((0 until bands).map(b =>
      struct(lit(b).as("band"), xxhash64(lit(b), slice(col("sig"), b * r + 1, r)).as("bh"))): _*)
    val exploded = sigs.select(col("id"), explode(bandHashes).as("e"))
      .select(col("id"), col("e.band"), col("e.bh"))
    exploded.as("x").join(exploded.as("y"), Seq("band", "bh"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-duplicate pairs, exact-verified: LSH proposes,
    * Jaccard (computed only for candidates) disposes.
    *
    * `maxShingleDf` caps stop-shingles at BANDING time only: shingles whose
    * document frequency exceeds the cap carry ~no similarity information
    * (every doc has them) but quadratically explode the candidate posting
    * join, so they are excluded from MinHash signatures; verification still
    * runs over the FULL shingle sets, keeping the reported Jaccard exact.
    * A doc whose every shingle is hot drops out of candidate generation —
    * acceptable: such a doc is pure boilerplate. Default = no cap.
    */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, minJaccard: Double,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = wordShingles(docs, idCol, textCol, n).cache()
    // hot-shingle set is tiny by definition (few shingles exceed the cap) —
    // broadcast anti-join, no extra shuffle of the posting table
    val shBand =
      if (maxShingleDf == Int.MaxValue) sh
      else sh.join(
        broadcast(sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select("shingle")),
        Seq("shingle"), "left_anti")
    val cands = lshCandidatePairs(minhashSignatures(shBand, k), k, bands)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    // restrict posting join to candidate docs, then exact-verify
    val candDocs = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val shC = sh.join(candDocs, Seq("id"), "left_semi")
    val inter = shC.as("x").join(shC.as("y"), "shingle")
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Default SimHash token hash: xxhash64 (codegen'd, 64 full bits). */
  val xxTokenHash: Column => Column = c => xxhash64(c)

  /** SQL-portable token hash: top 60 bits of md5, built from functions with
    * identical semantics in Spark and DuckDB — lets an external SQL oracle
    * recompute the exact signatures. Bits 60–63 are always 0, which only
    * means those four vote counters never fire (Hamming unaffected).
    */
  val md5TokenHash: Column => Column =
    c => conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 64-bit SimHash over token multiset: per-bit vote sums in one groupBy
    * (64 SUM aggregates), sign → bit. `tokenHash` is pluggable so results
    * can be verified by engines without xxhash64 (see [[md5TokenHash]]).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxTokenHash): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .withColumn("h", tokenHash(col("t")))
    val votes = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i"))
    val bits = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 16):
    * 4×16-bit band blocking (pigeonhole: any pair within Hamming 3 shares
    * at least one band), exact `bit_count` verification on candidates.
    */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, tokenHash: Column => Column = xxTokenHash): DataFrame = {
    require(maxHamming <= 3, "4-band blocking guarantees recall only for Hamming <= 3")
    val sigs = simhash(docs, idCol, textCol, tokenHash)
    val bandArr = array((0 until 4).map(b => struct(lit(b).as("band"),
      col("simhash").bitwiseAND(lit(0xffffL << (16 * b))).as("bv"))): _*)
    val banded = sigs.select(col("id"), col("simhash"), explode(bandArr).as("e"))
      .select(col("id"), col("simhash"), col("e.band"), col("e.bv"))
    banded.as("x").join(banded.as("y"), Seq("band", "bv"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact dedup: survivors = first doc per normalized-content fingerprint
    * (deterministic keep rule: min id).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
