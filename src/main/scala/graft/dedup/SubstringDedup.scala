package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the suffix-array dedup of Lee et
  * al. 2022 ("Deduplicating Training Data Makes Language Models Better",
  * public knowledge) re-expressed Spark-shaped: any k-token window whose
  * exact token sequence occurs at least `minCount` times across the corpus
  * (INCLUDING repeats within one document — the suffix-array semantics)
  * marks its k positions as duplicated; per document, marked windows merge
  * into maximal spans and the operator reports the span count and covered
  * token count, the inputs to a cut-or-drop policy.
  *
  * A suffix array is a single-machine structure; the Spark-native
  * equivalent is a ROLLING-GRAM POSTING TABLE: one row per (doc, token
  * position) keyed by the 64-bit hash of the k-gram starting there.
  * Candidate generation is then a hash-keyed count with map-side partial
  * combine — a boilerplate gram repeated millions of times partial-
  * aggregates per map task and never funnels one reducer — and span
  * accounting is pure per-row HOF arithmetic over each doc's own sorted
  * duplicate positions (state bounded by the doc's length, the same
  * per-key contract as [[Dedup.dropDuplicateLines]]' reassembly). Matching
  * 64-bit gram hashes instead of strings is the [[Dedup.shingleIds]]
  * collision contract (~d²/2^65 across d distinct grams — vanishing), and
  * shuffles longs, never text.
  *
  * Span accounting over a doc's sorted duplicated start positions
  * p_0 < p_1 < … (each covering tokens [p_i, p_i+k−1]):
  *   - covered tokens = k + Σ_{i≥1} min(p_i − p_{i−1}, k): an overlapping
  *     or adjacent next window adds exactly its fresh positions; a gap
  *     beyond k adds a full fresh k — merged-interval coverage with no
  *     interval materialization;
  *   - span count = 1 + |{i : p_i − p_{i−1} > k}|: windows whose covered
  *     ranges overlap or touch form one maximal span.
  */
object SubstringDedup {

  /** Positional k-gram hash array over an ALREADY-MATERIALIZED tokens
    * column (own projection — the interpreted-HOF CSE discipline of
    * [[Dedup]]): element j (0-based) hashes tokens [j, j+k−1]; docs
    * shorter than k yield an empty array.
    */
  private def gramHashes(t: Column, k: Int): Column =
    when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => xxhash64(concat_ws(" ", slice(t, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))

  /** One row per token START position of every doc, keyed by the k-gram
    * hash (short docs keep a null-gram row so they stay present in the
    * per-doc totals), plus the duplicated start positions. The posting
    * table is an eager `localCheckpoint` per the [[Dedup]] materialization
    * contract — consumed by the occurrence count, the duplicate-position
    * restriction, and the totals.
    */
  /** (id, tokens) projection — the single tokenize pass both entry points
    * build on (own projection per the interpreted-HOF CSE discipline).
    */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("_t"))

  private def dupStartTables(toked: DataFrame,
      k: Int, minCount: Long): (DataFrame, DataFrame) = {
    require(k >= 2, s"k=$k must be >= 2 (a 1-token window dedups vocabulary)")
    require(minCount >= 2, s"minCount=$minCount must be >= 2")
    val grams = toked
      .select(col("id"), size(col("_t")).cast("long").as("total_tokens"),
        gramHashes(col("_t"), k).as("_g"))
      .select(col("id"), col("total_tokens"),
        posexplode_outer(col("_g")).as(Seq("pos", "g")))
      .localCheckpoint()
    val hot = grams.filter(col("g").isNotNull)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select("g")
    (grams, grams.join(hot, Seq("g"), "left_semi").select("id", "pos"))
  }

  /** Per-doc repeated-substring span report:
    * (id, total_tokens, dup_tokens, n_spans) for EVERY input doc —
    * docs shorter than k tokens (or with no repeated window) report
    * zero spans. `k` is the window length in tokens (Lee et al. use 50;
    * pick per-corpus), `minCount` the corpus-wide occurrence threshold.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 2L): DataFrame = {
    val (grams, starts) =
      dupStartTables(tokenized(docs, idCol, textCol), k, minCount)
    val dupPs = starts
      .groupBy("id").agg(sort_array(collect_list(col("pos"))).as("_ps"))
    // consecutive-position gaps; guarded so a single-element list never
    // builds sequence(1, 0), which counts DOWNWARD
    val diffs = when(size(col("_ps")) >= 2,
      transform(sequence(lit(1), size(col("_ps")) - 1),
        i => element_at(col("_ps"), i + 1) - element_at(col("_ps"), i)))
      .otherwise(array().cast("array<int>"))
    grams.groupBy("id").agg(max("total_tokens").as("total_tokens"))
      .join(dupPs, Seq("id"), "left")
      .select(col("id"), col("total_tokens"),
        when(col("_ps").isNull, lit(0L)).otherwise(
          lit(k.toLong) + aggregate(diffs, lit(0L),
            (acc, d) => acc + least(d, lit(k)).cast("long"))).as("dup_tokens"),
        when(col("_ps").isNull, lit(0L)).otherwise(
          size(filter(diffs, d => d > k)) + 1).cast("long").as("n_spans"))
  }

  /** The Lee et al. CUT policy: remove every duplicated span and return
    * the surviving text — (id, total_tokens, kept_tokens, text_clean) for
    * EVERY input doc (a doc that was entirely repeats comes back with an
    * empty text_clean, the [[Dedup.dropDuplicateLines]] contract). The cut
    * is token-level: survivors re-join with single spaces — the
    * normalization-losing but engine-portable reconstruction (cutting raw
    * bytes would need tokenizer byte offsets, which `split` discards).
    *
    * Shape: duplicated starts explode to their k covered positions
    * (bounded k× fan-out of the duplicate starts only), distinct, then an
    * anti-join drops covered (id, pos) token rows and the survivors
    * reassemble per doc exactly like [[Dedup.dropDuplicateLines]] — sort
    * of (pos, token) structs inside one aggregation, state bounded by the
    * doc's own length. Every join keys on (id, pos) — no string shuffles
    * except the final token reassembly, which ships each surviving token
    * once.
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 2L): DataFrame = {
    // the token arrays feed BOTH the gram pipeline and the survivor
    // reassembly — materialize the tokenize pass once instead of running
    // the regex tokenizer (the expensive interpreted part) over the
    // corpus twice. LAZY: the first action is the gram table's eager
    // checkpoint job, which reads toked through exactly one branch, so
    // the tokenize pass lands in toked's blocks during that job (no
    // separate materialization job)
    val toked = tokenized(docs, idCol, textCol).localCheckpoint(eager = false)
    val (grams, starts) = dupStartTables(toked, k, minCount)
    val covered = starts
      .select(col("id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val toks = toked
      .select(col("id"), posexplode_outer(col("_t")).as(Seq("pos", "tok")))
    val rebuilt = toks.filter(col("tok").isNotNull)
      .join(covered, Seq("id", "pos"), "left_anti")
      .groupBy("id").agg(
        count(lit(1)).as("kept_tokens"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).as("text_clean"))
    grams.groupBy("id").agg(max("total_tokens").as("total_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("total_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
