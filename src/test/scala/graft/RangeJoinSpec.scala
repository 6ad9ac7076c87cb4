package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin.pointInInterval must be answer-identical to the naive
  * non-equi predicate it replaces — on random corpora (negative values
  * included, empty ranges, every binWidth relation to the span), not
  * just the fixture day ranges the declared key's oracle pins.
  */
class RangeJoinSpec extends SparkSpec {

  test("binned == naive point-in-interval across random corpora and widths") {
    import org.scalacheck.{Gen, Prop}
    val genCase = for {
      nPts <- Gen.chooseNum(0, 40)
      pts <- Gen.listOfN(nPts, Gen.chooseNum(-50L, 50L))
      nIv <- Gen.chooseNum(0, 15)
      ivs <- Gen.listOfN(nIv, for {
        s <- Gen.chooseNum(-50L, 50L)
        len <- Gen.chooseNum(-3L, 20L) // negative → empty range
      } yield (s, s + len))
      w <- Gen.chooseNum(1L, 25L) // above AND below typical span
    } yield (pts, ivs, w)
    val prop = Prop.forAll(genCase) { case (pts, ivs, w) =>
      import spark.implicits._
      val points = pts.zipWithIndex
        .map { case (d, i) => (i.toLong, d) }.toDF("pid", "d")
      val intervals = ivs.zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }.toDF("iid", "s", "e")
      val naive = intervals
        .join(points, col("d") >= col("s") && col("d") <= col("e"))
        .select("iid", "pid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val binned = RangeJoin
        .pointInInterval(points, "d", intervals, "s", "e", w)
        .select("iid", "pid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      binned == naive // Seq equality: duplicates count — each pair once
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("binned == naive interval overlap across random corpora and widths") {
    import org.scalacheck.{Gen, Prop}
    // Narrow bins (w down to 1) force intervals across MANY bins, so a
    // pair shares several — the emit-once greatest-start rule is what's
    // under test, alongside negatives, empty ranges and containment.
    val genIv = for {
      s <- Gen.chooseNum(-50L, 50L)
      len <- Gen.chooseNum(-3L, 20L) // negative → empty range
    } yield (s, s + len)
    val genCase = for {
      nA <- Gen.chooseNum(0, 15)
      as <- Gen.listOfN(nA, genIv)
      nB <- Gen.chooseNum(0, 15)
      bs <- Gen.listOfN(nB, genIv)
      w <- Gen.chooseNum(1L, 25L)
    } yield (as, bs, w)
    val prop = Prop.forAll(genCase) { case (as, bs, w) =>
      import spark.implicits._
      val a = as.zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }.toDF("aid", "as", "ae")
      val b = bs.zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }.toDF("bid", "bs", "be")
      val naive = a
        .join(b, col("as") <= col("be") && col("bs") <= col("ae"))
        .filter(col("ae") >= col("as") && col("be") >= col("bs"))
        .select("aid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val binned = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", w)
        .select("aid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      binned == naive // Seq equality: each pair exactly once, no dups
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("integer bin arithmetic survives keys past double precision (2^53)") {
    import spark.implicits._
    // Epoch-nanos-scale keys: a double round-trip would corrupt the low
    // bits and send boundary points to the wrong bin.
    val base = (1L << 60) + 12345L
    val points = Seq((1L, base), (2L, base + 7), (3L, base + 8))
      .toDF("pid", "d")
    val intervals = Seq((10L, base, base + 7)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "d", intervals, "s", "e", 8L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"got $got")
  }
}
