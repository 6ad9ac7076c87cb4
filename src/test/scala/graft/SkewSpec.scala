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

  test("salting spreads the hot key across all buckets") {
    val left = spark.range(10000).select(col("id"), lit(0L).as("k"))
    val nSalts = left
      .withColumn("s", pmod(hash(col("id")), lit(8)))
      .select("s").distinct().count()
    assert(nSalts == 8, s"expected 8 salt values, got $nSalts")
  }
}
