package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for text canonicalization (SURVEY
  * §2.13 custom ops; LLM-pipeline adjacency).
  *
  * Unicode normalization is the step every dedup/hashing pipeline
  * needs BEFORE fingerprinting: "café" composed (U+00E9) and
  * decomposed (e + U+0301) are byte-different, so md5/minhash/simhash
  * all miss the duplicate until both sides normalize. Spark has no
  * built-in for it; the JDK's `java.text.Normalizer` is the reference
  * implementation of UAX #15, and this expression runs it inside
  * whole-stage codegen with an `isNormalized` fast path — for the
  * (overwhelmingly common) already-NFC row the cost is one scan, no
  * allocation of a second string.
  */

/** unicode_norm(string, form) → string; form ∈ NFC|NFD|NFKC|NFKD
  * (fixed at plan time — the registry builder requires a literal). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_norm form must be NFC|NFD|NFKC|NFKD, got $form")
  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm expects a string argument, got $t")
  }

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, normForm)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.${form}"
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $f));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalize = copy(child = newChild)
}

object TextExpressions {

  /** Register `unicode_norm(str, 'NFC')` on an existing session.
    * Idempotent (the [[VectorExpressions.register]] convention). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(FunctionIdentifier("unicode_norm"))) return
    registry.registerFunction(
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, null,
        "unicode_norm", "unicode_norm(str, form) - UAX #15 normalization",
        "", "", "", "string_funcs", "4.0.0", "", "built-in"),
      (children: Seq[Expression]) => {
        val form = children(1) match {
          case Literal(v: UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"unicode_norm form must be a string literal, got $other")
        }
        UnicodeNormalize(children(0), form)
      })
  }
}
