package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two ArrayType(Double) columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The interpreted alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates a zipped array and evaluates two lambdas per element outside
  * codegen — measured ~4× slower on the sf0.1 embedding pair joins. This
  * expression compiles to a tight primitive loop (`sum += a[k]*b[k]`) with
  * the SAME left-to-right accumulation order, so results are bit-identical
  * to the HOF form and to DuckDB's `list_dot_product` — swapping it in
  * does not disturb the oracle contract.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes lets Catalyst coerce array<float>/array<int>
  // arguments (e.g. the raw embedding column from SQL callers) instead of
  // hard-failing type check like the round-1 version did. (Return type
  // inferred: AbstractDataType is private[sql] and unnameable here.)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  // Mismatched lengths are a data error (fail loudly, like DuckDB's
  // list_dot_product); a null element nulls the result (like the
  // aggregate/zip_with HOF form, where null propagates through the fold).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"array_dot: length mismatch ($n vs ${y.numElements()})")
    var sum = 0.0
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      sum += x.getDouble(k) * y.getDouble(k)
      k += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "array_dot: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $sum = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  $sum += $a.getDouble($k) * $b.getDouble($k);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-level wrapper (classic backend). */
  def apply(a: Column, b: Column): Column =
    graftshim.toColumn(ArrayDot(graftshim.toExpression(a), graftshim.toExpression(b)))
}
