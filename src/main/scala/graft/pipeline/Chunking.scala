package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * chunks on a stride, with overlap = chunkTokens − strideTokens (the
  * standard prep for embedding/RAG indexing and sliding-window LM
  * training). One output row per chunk.
  *
  * Pure projection + executor-side `explode` — ZERO exchanges at any
  * scale; chunk boundaries depend only on the document's own tokens, so
  * the operator composes under any partitioning and is re-shard-stable.
  * Documents with zero tokens produce zero chunks (`sequence(0,-1)`
  * counts DOWNWARD — the same trap guarded in [[Mixing]]).
  */
object Chunking {

  /** (id, chunk_idx, start_tok, n_tokens, chunk_text) per chunk; chunks
    * start at token offsets 0, stride, 2·stride, … < tokenCount and span
    * up to `chunkTokens` tokens (the final chunks may be shorter).
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens=$chunkTokens must be positive")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens=$strideTokens must be in [1, chunkTokens]")
    val tok = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    val n = size(col("_t"))
    val starts = when(n > 0,
      sequence(lit(0), n - 1, lit(strideTokens))).otherwise(array())
    tok
      .select(col("id"), col("_t"), explode(starts).as("start_tok"))
      .select(col("id"),
        (col("start_tok") / strideTokens).cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(chunkTokens), n - col("start_tok")).cast("long").as("n_tokens"),
        concat_ws(" ",
          slice(col("_t"), col("start_tok") + 1, lit(chunkTokens))).as("chunk_text"))
  }
}
