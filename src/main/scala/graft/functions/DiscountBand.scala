package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** §2.7 `custom_udf_expr` (SURVEY.md): a native Catalyst scalar expression
  * with full codegen — NOT a black-box Scala UDF. Bands a discount into
  * LOW (< 0.03) / MID (< 0.07) / HIGH. Because it implements `doGenCode`,
  * it stays inside whole-stage codegen: no iterator boundary, no boxing,
  * and surrounding parquet filters/pruning still push down — which is the
  * point of the Expression surface at 100 TB.
  */
case class DiscountBand(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"discount_band expects DOUBLE, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "discount_band"

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    if (d < 0.03) DiscountBand.LOW else if (d < 0.07) DiscountBand.MID
    else DiscountBand.HIGH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val low = ctx.addReferenceObj("low", DiscountBand.LOW)
    val mid = ctx.addReferenceObj("mid", DiscountBand.MID)
    val high = ctx.addReferenceObj("high", DiscountBand.HIGH)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($c < 0.03D) ? $low : (($c < 0.07D) ? $mid : $high);")
  }

  override protected def withNewChildInternal(newChild: Expression): DiscountBand =
    copy(child = newChild)
}

object DiscountBand {
  private[functions] val LOW = UTF8String.fromString("LOW")
  private[functions] val MID = UTF8String.fromString("MID")
  private[functions] val HIGH = UTF8String.fromString("HIGH")

  /** Expose to SQL/DataFrame via the session function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "discount_band",
      graft.GraftExtensions.arity("discount_band", 1)(exprs => DiscountBand(exprs.head)),
      "built-in")
}
