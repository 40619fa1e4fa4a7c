package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: document frequency, per-doc TF-IDF
  * keyword extraction, and hot-n-gram (boilerplate) mining. The keyword
  * and boilerplate reports feed pipeline tuning — hot n-grams are exactly
  * what `Dedup.minhashDupPairs(maxShingleDf)` caps, and per-doc keywords
  * are the cheap content signature quality/routing heuristics key on.
  *
  * Scale shape: term-frequency and document-frequency are hash
  * aggregations with map-side partial combine (term cardinality ≈ corpus
  * vocabulary, partitioned by term — no single hot reducer); the per-doc
  * top-k is a window over the doc's own terms (bounded by per-doc
  * vocabulary); the global hot-gram report is a TakeOrderedAndProject
  * (top-k, never a global sort).
  *
  * IDF here is the LINEAR ratio `N / df`, not `log(N/df)`: ranking is
  * unchanged (log is monotone) while every score stays an exact IEEE
  * division of integers, bit-identical across engines — which is what
  * lets an external SQL oracle verify scores exactly instead of to a
  * libm-dependent tolerance.
  */
object Tfidf {

  /** Per-(doc, term) occurrence counts over the standard tokenizer. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k terms per doc by TF-IDF (linear idf = N/df; ties broken by term
    * ascending — fully deterministic). `nDocs` is the corpus size the idf
    * normalizes by; pass the known table size (catalog stats / a prior
    * count) — the operator itself never triggers an action.
    *
    * Returns (id, term, tf, df, tf_idf, rank) with rank in [1, k].
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      nDocs: Long, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(nDocs > 0, s"nDocs=$nDocs must be positive")
    val tf = termFreq(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("tf_idf",
        (col("tf") * lit(nDocs)).cast("double") / col("df").cast("double"))
    val w = Window.partitionBy("id")
      .orderBy(col("tf_idf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "term", "tf", "df", "tf_idf", "rank")
  }

  /** Most document-frequent word n-grams (the boilerplate report):
    * (shingle, df) for the `k` grams appearing in the most DISTINCT docs,
    * df >= minDf, ordered (df desc, shingle asc). One aggregation + a
    * top-k — use the result to size `maxShingleDf` for LSH banding or as
    * a [[graft.dedup.Dedup.dropDuplicateLines]]-style strip list.
    *
    * The aggregation keys on `xxhash64(shingle)` and carries the string as
    * a `min` aggregate: map-side partials then ship ONE string per
    * distinct gram per partition instead of every occurrence's string —
    * the df count for a hot boilerplate gram shuffles longs, not text
    * (the last string-keyed shuffle in the text path, removed). A 64-bit
    * cross-gram collision would merge two grams' counts with probability
    * ~v²/2^65 for vocabulary v — the [[graft.dedup.Dedup.shingleIds]]
    * collision contract, far below the report's sensitivity.
    */
  def hotNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    graft.dedup.Dedup.wordShingles(docs, idCol, textCol, n)
      .groupBy(xxhash64(col("shingle")).as("_gh"))
      .agg(count(lit(1)).as("df"), min(col("shingle")).as("shingle"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("shingle").asc)
      .limit(k)
      .select("shingle", "df")
  }
}
