package graft.functions

import graft.codec.Gorilla
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for reading Gorilla/DoD segment blobs from
  * SQL / DataFrame code without a Dataset decode pass (SURVEY.md §2.9: the
  * optional Expression upgrade over the typed decode; preference order (b)
  * in the custom-operator ladder).
  *
  * `CodegenFallback` is deliberate: the per-ROW work decodes an entire
  * segment (thousands of points), so the eval call amortizes and the
  * expression sits inside a codegen'd stage without breaking neighbors.
  */
abstract class GorillaDecodeBase extends UnaryExpression with CodegenFallback
    with Serializable {
  override def nullable: Boolean = true
}

/** binary DoD blob → array<long> (timestamps in epoch-µs, or turn_idx). */
case class GorillaDecodeLongs(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(Gorilla.decodeTimestamps(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "gorilla_decode_longs"
}

/** binary XOR blob → array<double>. */
case class GorillaDecodeDoubles(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(Gorilla.decodeValues(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "gorilla_decode_doubles"
}

/** binary dictionary blob → array<string> (role/tool columns; null codes
  * decode to null elements).
  */
case class GorillaDecodeStrings(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(Gorilla.decodeStrings(v.asInstanceOf[Array[Byte]])
      .map(s => if (s == null) null else UTF8String.fromString(s)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "gorilla_decode_strings"
}

/** binary deflated text blob → array<string>. */
case class GorillaDecodeTexts(child: Expression) extends GorillaDecodeBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(Gorilla.decodeTexts(v.asInstanceOf[Array[Byte]])
      .map(UTF8String.fromString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "gorilla_decode_texts"
}

/** Column-API wrappers + SQL registration. Wrappers use `call_function`,
  * so [[register]] (or the [[GraftExtensions]] config) must have run first.
  */
object GorillaFunctions {
  import org.apache.spark.sql.functions.call_function
  def decodeLongs(c: Column): Column = call_function("gorilla_decode_longs", c)
  def decodeDoubles(c: Column): Column = call_function("gorilla_decode_doubles", c)
  def decodeStrings(c: Column): Column = call_function("gorilla_decode_strings", c)
  def decodeTexts(c: Column): Column = call_function("gorilla_decode_texts", c)

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "gorilla_decode_longs" -> (es => GorillaDecodeLongs(es.head)),
    "gorilla_decode_doubles" -> (es => GorillaDecodeDoubles(es.head)),
    "gorilla_decode_strings" -> (es => GorillaDecodeStrings(es.head)),
    "gorilla_decode_texts" -> (es => GorillaDecodeTexts(es.head)))

  /** Register the functions on an existing session (tests / ad-hoc). */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, b, "scala_udf")
  }
}

/** `SparkSessionExtensions` installer:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo(classOf[GorillaDecodeLongs].getName, name)
    e.injectFunction((FunctionIdentifier("gorilla_decode_longs"),
      info("gorilla_decode_longs"), es => GorillaDecodeLongs(es.head)))
    e.injectFunction((FunctionIdentifier("gorilla_decode_doubles"),
      info("gorilla_decode_doubles"), es => GorillaDecodeDoubles(es.head)))
    e.injectFunction((FunctionIdentifier("gorilla_decode_strings"),
      info("gorilla_decode_strings"), es => GorillaDecodeStrings(es.head)))
    e.injectFunction((FunctionIdentifier("gorilla_decode_texts"),
      info("gorilla_decode_texts"), es => GorillaDecodeTexts(es.head)))
  }
}
