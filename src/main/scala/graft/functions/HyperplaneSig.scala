package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** 64-bit random-hyperplane signature (SimHash for vectors, Charikar
  * STOC'02) of an array<double>: bit k = (Σ_d u[d]·s(k,d) ≥ 0), with
  * deterministic Rademacher components s(k,d) = ±1 drawn from
  * murmur3(k, d) — the exact bit sequence of the SQL HOF form
  * `aggregate(..., acc + u[d] * if(pmod(hash(k,d),2)=0, 1, -1)) >= 0`
  * (same chained murmur3 with seed 42, same ascending-d accumulation
  * order), which cost ~2 s at fixture scale in interpreted per-element
  * dispatch. One tight JVM loop per row instead; CodegenFallback is fine
  * at one call per vector row.
  */
case class HyperplaneSig(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  // Coerce array<float>/array<int> args (e.g. a raw embedding column
  // from SQL) instead of hard-failing, like ArrayDot.
  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    val n = u.numElements()
    // A null element nulls the HOF form's aggregate, making every bit's
    // `>= 0.0` comparison null → false → signature 0; reproduce that.
    var d0 = 0
    while (d0 < n) {
      if (u.isNullAt(d0)) return 0L
      d0 += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      // Spark's hash(k, d) chains murmur3 over the args from seed 42.
      val seedK = Murmur3_x86_32.hashInt(k, 42)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = Murmur3_x86_32.hashInt(d, seedK)
        val s = if ((h & 1) == 0) 1.0 else -1.0
        acc += u.getDouble(d) * s
        d += 1
      }
      if (acc >= 0.0) sig |= 1L << k
      k += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(c: Column): Column =
    graftshim.toColumn(HyperplaneSig(graftshim.toExpression(c)))
}
