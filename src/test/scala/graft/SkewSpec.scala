package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join must be row-identical to the plain join on a heavily
  * skewed key distribution, while actually spreading the hot key over
  * the salt space.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin == plain join on a 90%-hot-key distribution") {
    // 10k fact rows, 90% on key 0; 20-row dimension-ish right side that
    // we pretend is too big to broadcast.
    val left = spark.range(10000)
      .select(col("id"), when(col("id") % 10 < 9, 0L).otherwise(col("id") % 20).as("k"))
    val right = spark.range(20)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))
    // Multiset comparison (sorted seqs), NOT sets: the classic salted-
    // join failure mode is duplicated rows (e.g. joining on key alone
    // against the replicated side), which a set compare would mask.
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted
    val plain = rows(left.join(right, Seq("k")))
    val salted = rows(Skew.saltedJoin(left, right, "k", col("id"), buckets = 8))
    assert(salted == plain,
      s"salted=${salted.size} rows, plain=${plain.size} rows")
  }

  test("saltedJoin == plain join on random distributions and bucket counts") {
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val genLeft = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 1000L)))
    val genRight = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    val genBuckets = Gen.choose(1, 9)
    val prop = Prop.forAll(genLeft, genRight, genBuckets) { (ls, rs, b) =>
      val left = ls.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "lv", "rowid")
      val right = rs.toDF("k", "rv")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("k", "lv", "rowid", "rv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      rows(Skew.saltedJoin(left, right, "k", col("rowid"), b)) ==
        rows(left.join(right, Seq("k")))
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("salting spreads the hot key across all buckets") {
    val left = spark.range(10000).select(col("id"), lit(0L).as("k"))
    val nSalts = left
      .withColumn("s", pmod(hash(col("id")), lit(8)))
      .select("s").distinct().count()
    assert(nSalts == 8, s"expected 8 salt values, got $nSalts")
  }

  test("declared zipf workload: salted max reducer load drops ~buckets-fold") {
    // The §2.208 flattening claim measured directly on the declared
    // key's zipf synth: a (k)-keyed shuffle puts the hot key's FULL
    // row count on one reducer; the (k, salt)-keyed shuffle must cut
    // that max task load by close to the bucket count (8). Group
    // counts are the reducer loads — same proxy the key's in-band
    // audit boolean uses.
    import graft.Tables.t
    val buckets = 8
    val fact = t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .withColumn("u", conv(substring(md5(concat(
          col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string")).cast("binary")), 1, 13),
        16, 10).cast("long"))
      .withColumn("k", when(pmod(col("u"), lit(2L)) === 0L, lit(0L))
        .otherwise(pmod(expr("u div 2"), lit(100L)) + 1L))
    val plainMax = fact.groupBy("k").count()
      .agg(max("count")).head().getLong(0)
    val saltedMax = fact
      .withColumn("salt", pmod(hash(col("u")), lit(buckets)))
      .groupBy("k", "salt").count()
      .agg(max("count")).head().getLong(0)
    val ratio = plainMax.toDouble / saltedMax
    info(s"max reducer load: plain=$plainMax salted=$saltedMax " +
      f"(flattening ratio $ratio%.2f, buckets=$buckets)")
    // ≥ 6 of the ideal 8×: binomial spread costs a little; anything
    // under this means the salt stopped spreading the hot key.
    assert(ratio >= 6.0,
      f"salted join flattening ratio $ratio%.2f < 6.0 " +
        s"(plain=$plainMax salted=$saltedMax)")
  }
}
