package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array: bit b of the result is set iff the
  * majority of tokens have bit b set in their xxhash64 (ties → unset).
  *
  * Bit-identical to the aggregation form
  * `explode(toks) → xxhash64(tok) → 64× SUM(±1 votes) → recombine`
  * (XXH64 over the UTF-8 bytes with Spark's seed 42, same vote rule),
  * but computed scan-side in one tight loop per row: no token explode,
  * no shuffle, no 64 aggregation buffers. At 100 TB this turns the
  * signature stage from a full corpus-wide token shuffle into a map-only
  * pass. CodegenFallback is fine at one call per document row.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects ARRAY<STRING>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      // A null token hashes to the seed, exactly like xxhash64(NULL) in
      // the reference aggregation form (Spark hash functions pass the
      // seed through on null input).
      val h =
        if (toks.isNullAt(t)) 42L
        else {
          val s = toks.getUTF8String(t)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(c: Column): Column =
    graftshim.toColumn(SimHashSig(graftshim.toExpression(c)))
}
