package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression with
  * whole-stage codegen (`doGenCode` emits a direct
  * `java.text.Normalizer.normalize` call — no UDF serialization, no
  * codegen fence). Spark ships no normalization builtin, yet canonical
  * composition is a standard curation step BEFORE fingerprint/shingle
  * dedup: the decomposed "e"+U+0301 and the composed "é" are different
  * byte sequences (different xxhash64, different shingles) for visually
  * and semantically identical text — normalize first and the whole dedup
  * stack keys on canonical bytes. JDK `Normalizer` implements Unicode
  * NFC, the same algorithm external engines expose (DuckDB
  * `nfc_normalize` — which is what the oracle replays), so normalized
  * output is byte-reproducible across engines, the [[graft.text.Scrub]]
  * dialect contract applied to normalization.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually every real-world string (ASCII and composed text),
  * so the common case costs one scan, not a rebuild.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

}
