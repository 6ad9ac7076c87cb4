package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen Expression
  * (§2.29 `text_unicode_normalize`).
  *
  * Why it exists: web-crawled corpora mix precomposed (U+00E9 "é") and
  * decomposed (e + U+0301) encodings of the SAME text, so byte-level
  * dedup (md5 fingerprints, exact-hash groups, substring spans) silently
  * treats equal strings as different — canonical composition is the
  * standard first step of every text-dedup pipeline. Spark has no
  * built-in normalizer; a Scala UDF would break whole-stage codegen and
  * box every row. This Expression calls `java.text.Normalizer` inside
  * the generated code with a cheap `isNormalized` fast path (ASCII and
  * already-NFC strings — the overwhelming majority of a real corpus —
  * never allocate), staying inside the codegen stage like every other
  * scan-side signature in this package.
  *
  * Cross-engine note: java.text.Normalizer and DuckDB's
  * `nfc_normalize` implement the same Unicode canonical composition —
  * equal outputs byte-for-byte on the fixture plane (pinned by the
  * declared key's oracle).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. The isNormalized
    * probe is O(n) with no allocation; only strings that actually need
    * composing pay the String round-trip. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** DataFrame-side constructor. */
  def apply(c: Column): Column =
    graftshim.toColumn(NfcNormalize(graftshim.toExpression(c)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      graft.GraftExtensions.arity("nfc_normalize", 1)(exprs =>
        NfcNormalize(exprs.head)),
      "built-in")
}
