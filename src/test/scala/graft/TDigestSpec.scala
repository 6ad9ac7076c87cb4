package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.functions.TDigestQuantile

/** Contract locks for the t-digest TypedImperativeAggregate (SURVEY
  * §2.21): rank-error band across physical partitionings (the same
  * 5×-style band agg_approx_quantile pins), merge-order invariance of
  * the deterministic compression, and run-to-run determinism of the
  * declared key.
  */
class TDigestSpec extends SparkSpec {

  private def rankOf(sorted: Array[Double], v: Double): Int = {
    // Count of values <= v — the rank the estimate would occupy.
    val i = java.util.Arrays.binarySearch(sorted, v)
    if (i >= 0) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == v) j += 1
      j + 1
    } else -(i + 1)
  }

  test("rank-error band holds across partitionings (2, 8, 32)") {
    val vals = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val n = vals.length
    for (parts <- Seq(2, 8, 32); q <- Seq(0.5, 0.95)) {
      val est = Tables.t(spark, sf, "lineitem").repartition(parts)
        .agg(TDigestQuantile(col("l_extendedprice"), q).as("e"))
        .head().getDouble(0)
      val err = math.abs(rankOf(vals, est) - q * n)
      // δ=100 puts expected rank error ≈ 4q(1−q)n/δ ≤ n/100; allow 5×.
      assert(err <= 0.05 * n,
        s"parts=$parts q=$q: est $est at rank error $err of $n")
    }
  }

  test("compression is a pure function of the multiset: merge order invariant") {
    // Deterministic pseudo-random values, chunked as 7 'partitions'.
    val values = (0 until 3000).map(i =>
      ((i * 2654435761L) % 10007).toDouble / 7.0)
    val chunks = values.grouped(450).toSeq.map { c =>
      TDigestQuantile.compress(
        ArrayBuffer.from(c.map(v => (v, 1.0))), 100)
    }
    def evalIn(order: Seq[Int]): Seq[Double] = {
      val all = ArrayBuffer.from(order.flatMap(chunks))
      val compressed = TDigestQuantile.compress(all, 100)
      Seq(0.1, 0.5, 0.9, 0.99).map(TDigestQuantile.quantileOf(compressed, _))
    }
    val base = evalIn(chunks.indices)
    for (perm <- Seq(chunks.indices.reverse,
        chunks.indices.sortBy(i => (i * 5) % 7))) {
      assert(evalIn(perm) == base,
        s"quantiles depend on partial-digest merge order ($perm)")
    }
  }

  test("accuracy: tail quantile within band on a skewed distribution") {
    // Exponential-ish skew via integer powers — tails are where the
    // k₁ scale function concentrates centroids.
    val values = (1 to 5000).map(i => math.pow(1.002, i % 4000)).toArray
    val sorted = values.sorted
    val df = spark.createDataFrame(values.toSeq.map(Tuple1(_))).toDF("x")
    for (q <- Seq(0.5, 0.99)) {
      val est = df.agg(TDigestQuantile(col("x"), q)).head().getDouble(0)
      val err = math.abs(rankOf(sorted, est) - q * sorted.length)
      assert(err <= 0.05 * sorted.length, s"q=$q est=$est rank err $err")
    }
  }

  test("declared key: deterministic re-run, empty input → null") {
    val qf = graft.operators.ReshapeQueries.queries("agg_tdigest_quantile")
    val a = qf(spark, sf).collect().toSeq
    val b = qf(spark, sf).collect().toSeq
    assert(a == b, "agg_tdigest_quantile not replay-deterministic")
    // Round-16 self-checking output: both rank-band booleans must hold
    // (the driver oracle asserts them as literal TRUE).
    assert(a.nonEmpty && a.forall(r =>
      r.getAs[Boolean]("p50_in_band") && r.getAs[Boolean]("p95_in_band")),
      s"t-digest estimate outside the rank band: $a")
    val empty = Tables.t(spark, sf, "lineitem")
      .filter(col("l_quantity") < -1)
      .agg(TDigestQuantile(col("l_extendedprice"), 0.5).as("e"))
      .head()
    assert(empty.isNullAt(0), "empty-group sketch must evaluate to null")
  }
}
