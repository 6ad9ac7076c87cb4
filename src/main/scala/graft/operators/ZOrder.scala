package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers — the multi-dimensional data-layout
  * primitive behind "OPTIMIZE ZORDER BY" in modern lakehouse engines:
  * interleaving the bits of two quantized dimensions makes rows that
  * are close in BOTH dimensions land close on the curve, so a
  * range-partitioned + sorted-by-z layout gives every file a bounded
  * min/max envelope in each dimension. Parquet row-group/file stats
  * then prune a 2-D box predicate on BOTH columns — a single-column
  * sort can only ever prune one (ZOrderSpec measures exactly this).
  *
  * Everything here is a plain codegen-friendly bit expression: no UDF,
  * no shuffle of its own — the layout write pays one range exchange,
  * after which the curve is just a column.
  */
object ZOrder {

  /** Quantize `v` into [0, 2^bits) given inclusive bounds. Double
    * arithmetic (monotone, which is all a layout key needs); exact
    * while (v−mn)·(2^bits−1) stays below 2^53 — true for any 16-bit
    * quantization of sub-2^37 key ranges. Degenerate mn = mx → 0. */
  def quantize(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 26, s"quantize bits out of range: $bits")
    val levels = (1L << bits) - 1
    when(mx === mn, lit(0L)).otherwise(
      floor((v - mn).cast("double") * levels / (mx - mn)).cast("long"))
  }

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: x occupies even bit positions, y odd. */
  def zval(xq: Column, yq: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"zval bits out of range: $bits")
    (0 until bits).foldLeft(lit(0L): Column) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xq, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(yq, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
  }

  /** Reference Scala twin of [[zval]] for property tests. */
  private[graft] def zvalRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }
}
