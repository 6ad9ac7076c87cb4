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

  test("zipf workload across SFs: plain hot-reducer load grows, salted stays ~flat per bucket") {
    // The scale half of the §2.208 evidence: the UNSALTED hot key's
    // single reducer carries a load that grows linearly with the
    // corpus, while the salted max-bucket load stays within the
    // binomial envelope of n/8 at every SF — i.e. salting converts a
    // scaling hot spot into a constant-factor overhead.
    import graft.Tables.t
    val buckets = 8
    def loads(dir: String): (Long, Long) = {
      val fact = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .withColumn("u", conv(substring(md5(concat(
            col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string")).cast("binary")), 1, 13),
          16, 10).cast("long"))
        .withColumn("k", when(pmod(col("u"), lit(2L)) === 0L, lit(0L))
          .otherwise(pmod(expr("u div 2"), lit(100L)) + 1L))
        .filter(col("k") === 0L)
      val n = fact.count()
      val saltedMax = fact
        .withColumn("salt", pmod(hash(col("u")), lit(buckets)))
        .groupBy("salt").count().agg(max("count")).head().getLong(0)
      (n, saltedMax)
    }
    val (n1, s1) = loads(sf)
    val (n2, s2) = loads("/root/testdata/sf0.01")
    info(s"hot-key reducer loads: sf0.001 plain=$n1 saltedMax=$s1; " +
      s"sf0.01 plain=$n2 saltedMax=$s2")
    assert(n2 > 5 * n1, s"plain hot load did not grow with SF: $n1 -> $n2")
    def envelope(n: Long) = n.toDouble / buckets + 4.0 * math.sqrt(n.toDouble)
    assert(s1 <= envelope(n1), s"sf0.001 salted max $s1 > envelope ${envelope(n1)}")
    assert(s2 <= envelope(n2), s"sf0.01 salted max $s2 > envelope ${envelope(n2)}")
    // Relative overhead vs the ideal n/8 split SHRINKS as n grows
    // (binomial concentration): the bigger the hot key, the closer
    // salting gets to a perfect split.
    val over1 = s1.toDouble / (n1.toDouble / buckets)
    val over2 = s2.toDouble / (n2.toDouble / buckets)
    info(f"salted max/ideal: sf0.001 $over1%.3f, sf0.01 $over2%.3f")
    assert(over2 <= over1 + 0.02,
      f"salted overhead grew with SF: $over1%.3f -> $over2%.3f")
  }
}
