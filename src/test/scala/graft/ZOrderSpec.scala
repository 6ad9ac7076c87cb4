package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import graft.operators.ZOrder

/** Contract locks for the z-order layout (SURVEY §2.21): the Column
  * bit-interleave matches the reference implementation, and the layout
  * actually buys what its scaladoc claims — bounded per-file min/max
  * envelopes in BOTH dimensions, where a single-column sort leaves the
  * second dimension's envelope at full range.
  */
class ZOrderSpec extends SparkSpec {

  test("zval Column expression == reference interleave (scalacheck)") {
    val gen = for {
      x <- Gen.chooseNum(0L, (1L << 16) - 1)
      y <- Gen.chooseNum(0L, (1L << 16) - 1)
      bits <- Gen.oneOf(1, 4, 8, 16)
    } yield (x, y, bits)
    val prop = Prop.forAllNoShrink(gen) { case (x, y, bits) =>
      val got = spark.range(1)
        .select(ZOrder.zval(lit(x), lit(y), bits).as("z"))
        .head().getLong(0)
      got == ZOrder.zvalRef(x & ((1L << bits) - 1), y & ((1L << bits) - 1), bits)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("zval interleaves disjoint bit positions: x and y recoverable") {
    // Deterministic exhaustive check at 4 bits: the curve is a
    // bijection [0,16)² → [0,256).
    val all = for (x <- 0L until 16L; y <- 0L until 16L)
      yield ZOrder.zvalRef(x, y, 4)
    assert(all.toSet.size == 256, "4-bit Morton curve is not a bijection")
    assert(all.max == 255L && all.min == 0L)
  }

  /** Per-file normalized min/max spread of a column after writing
    * `df` with the given layout transform. */
  private def spreads(df: DataFrame, layout: DataFrame => DataFrame,
      dims: Seq[String]): Map[String, Double] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    layout(df).write.mode("overwrite").parquet(dir)
    val withFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    val bounds = dims.map { d =>
      val perFile = withFile.groupBy("f")
        .agg(min(col(d)).as("mn"), max(col(d)).as("mx"))
        .select("mn", "mx").collect()
      val lo = perFile.map(_.getLong(0)).min
      val hi = perFile.map(_.getLong(1)).max
      val range = math.max(1L, hi - lo).toDouble
      d -> perFile.map(r => (r.getLong(1) - r.getLong(0)) / range)
        .sum / perFile.length
    }
    bounds.toMap
  }

  test("z-order bounds per-file envelopes on BOTH dims; 1-D sort leaves one at full range") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val b = li.agg(min("l_orderkey").as("omn"), max("l_orderkey").as("omx"),
      min("l_partkey").as("pmn"), max("l_partkey").as("pmx"))
    val zLayout = (d: DataFrame) => d.crossJoin(broadcast(b))
      .withColumn("z", ZOrder.zval(
        ZOrder.quantize(col("l_orderkey"), col("omn"), col("omx"), 16),
        ZOrder.quantize(col("l_partkey"), col("pmn"), col("pmx"), 16), 16))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .select("l_orderkey", "l_partkey")
    val oneD = (d: DataFrame) => d
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    val zs = spreads(li, zLayout, Seq("l_orderkey", "l_partkey"))
    val ss = spreads(li, oneD, Seq("l_orderkey", "l_partkey"))
    // Z-order: BOTH dims' average per-file envelope well under full
    // range (8 files ⇒ curve boxes ~3/8 of each axis; allow slack).
    // 0.7, not 0.6: repartitionByRange draws its split points from a
    // RANDOM sample whose seed varies per run, so the envelope
    // fraction jitters a few percent around ~0.55 (a 0.617 reading
    // was observed) — the claim under test is the GAP vs the 1-D
    // control's ≈1.0 unsorted dim, which 0.7 still separates cleanly.
    assert(zs("l_orderkey") < 0.7 && zs("l_partkey") < 0.7,
      s"z-order envelopes not bounded: $zs")
    // 1-D sort: the sorted dim is tightly bounded, the OTHER dim spans
    // ~the full range in every file — the pruning gap z-order closes.
    assert(ss("l_orderkey") < 0.3, s"1-D sort control broken: $ss")
    assert(ss("l_partkey") > 0.9, s"1-D control should not bound partkey: $ss")
  }
}
