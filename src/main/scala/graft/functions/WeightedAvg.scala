package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** §2.4 `custom_udaf_wavg` (SURVEY.md): weighted average as a custom typed
  * `Aggregator[IN, BUF, OUT]`, registered as a UDAF.
  *
  * The buffer keeps exact `BigDecimal` sums (inputs carry ≤2 decimal
  * digits; scale-6 capture is lossless), so `merge` is associative and
  * commutative to the bit — the result is independent of partition merge
  * order, which a double-accumulating buffer would not be. `finish` does a
  * single IEEE double division + 4dp round, matching the oracle SQL
  * `ROUND(CAST(SUM(..)/SUM(..) AS DOUBLE), 4)` shape exactly.
  */
object WeightedAvg
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  /** in = (value, weight): accumulate (Σ value·weight, Σ weight). */
  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + d6(in._1 * in._2), b._2 + d6(in._2))

  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2.signum == 0) 0.0
    else {
      // Multiply-form 4dp rounding, matching DuckDB ROUND(double, 4) and
      // Det.r4d bit-for-bit (BigDecimal-exact rounding of the quotient
      // takes the opposite branch near decimal ties).
      val q = b._1.toDouble / b._2.toDouble
      BigDecimal(q * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 10000.0
    }

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    ExpressionEncoder[(BigDecimal, BigDecimal)]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
