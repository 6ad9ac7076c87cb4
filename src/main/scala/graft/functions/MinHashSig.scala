package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a token array: element i = min over tokens of
  * murmur3(token, seed = i), for k seeds.
  *
  * Replaces the interpreted nested-HOF form
  * `transform(sequence(0,k-1), i -> array_min(transform(toks, t -> hash(t, i))))`,
  * whose cost is Catalyst per-element dispatch (measured ~2 s for 1000
  * docs at sf0.1), with one tight JVM loop hashing each token's bytes
  * directly. Signatures only drive LSH candidate recall — the pairs the
  * engine emits are exact-verified afterwards — so the hash family needs
  * determinism and independence, not parity with Spark's `hash()`.
  * CodegenFallback is fine: one call per document row.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sig = new Array[Int](k)
    var i = 0
    while (i < k) { sig(i) = Int.MaxValue; i += 1 }
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t)
        i = 0
        while (i < k) {
          val h = Murmur3_x86_32.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    graftshim.toColumn(MinHashSig(graftshim.toExpression(c), k))
}
