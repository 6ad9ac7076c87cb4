package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom

/** Contract tests for the engine-owned bloom surfaces
  * (graft.functions.Bloom) behind `join_bloom_prebuilt`:
  *
  *  - NO FALSE NEGATIVES — the one property a bloom filter must never
  *    lose: every inserted key probes true.
  *  - FP rate within the analytic bound for the declared key's sizing.
  *  - Bit-image invariance under repartitioning: partials OR together,
  *    so the stored filter is byte-identical however the build side was
  *    partitioned — required for the stored-blocklist deployment story
  *    (a filter built by 1000 executors must equal one built by 4).
  *  - The declared key's prefilter ≡ exact semi join end to end.
  */
class BloomSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true") {
    val keys = spark.range(0, 5000).select((col("id") * 7919 + 13).as("k"))
    val bits = keys.agg(Bloom.build(col("k"), 1 << 16, 5)).head()
      .getAs[Array[Byte]](0)
    val misses = keys
      .filter(!Bloom.mightContain(lit(bits), col("k"), 5)).count()
    assert(misses == 0, s"$misses inserted keys probed false")
  }

  test("false-positive rate within 2x the analytic bound") {
    val n = 1000
    val m = 1 << 16
    val k = 5
    val keys = spark.range(0, n).select((col("id") * 31 + 7).as("k"))
    val bits = keys.agg(Bloom.build(col("k"), m, k)).head()
      .getAs[Array[Byte]](0)
    // Probe a disjoint key domain (odd offsets of a different stride).
    val probes = 100000
    val fp = spark.range(0, probes)
      .select((col("id") * 104729 + 1000000007L).as("k"))
      .filter(Bloom.mightContain(lit(bits), col("k"), k)).count()
    val bound = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp.toDouble / probes <= 2 * bound + 1e-6,
      s"fp rate ${fp.toDouble / probes} vs analytic bound $bound")
  }

  test("bit image is invariant under build-side partitioning") {
    val keys = spark.range(0, 2000).select((col("id") * 13 + 5).as("k"))
    def img(parts: Int): Seq[Byte] =
      keys.repartition(parts).agg(Bloom.build(col("k"), 1 << 14, 5))
        .head().getAs[Array[Byte]](0).toSeq
    assert(img(1) == img(7), "bit image depends on partition count")
    assert(img(7) == img(32), "bit image depends on partition count")
  }

  test("declared key: bloom prefilter + exact confirm == plain semi join") {
    val got = operators.JoinQueries.queries("join_bloom_prebuilt")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val sel = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(sel, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_partkey")).collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
