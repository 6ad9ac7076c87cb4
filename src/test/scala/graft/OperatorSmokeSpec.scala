package graft

/** Every declared query must run and return rows on sf0.001 (value-level
  * correctness is the driver's DuckDB oracle gate; this guards against
  * regressions between driver rounds). Known-empty results are exempted
  * explicitly so accidental empties fail loudly.
  */
class OperatorSmokeSpec extends SparkSpec {

  // dedup_embedding_cosine_tight: the threshold (cos >= 0.5) is pinned
  // to sf0.01, where exactly one fixture pair survives (max pairwise
  // cos 0.513 — the strictest non-vacuous declarable value, SURVEY
  // §2.18); the sf0.001 corpus tops out at cos 0.479, so the key is
  // LEGITIMATELY empty here and its non-vacuity is pinned by the sf0.01
  // oracle row instead (a 0-row sf0.01 result would hash-mismatch).
  private val mayBeEmpty = Set[String]("dedup_embedding_cosine_tight")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has oracle SQL or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_distinct", "dedup_minhash_lsh",
      "dedup_simhash", "agg_approx_quantile",
      // iterative Lloyd is not SQL-expressible; KMeansSpec pins
      // determinism + recall, SelectivitySpec the candidate fraction
      "sim_ann_kmeans",
      // engine-pinned sketch (§2.11 convention); TDigestSpec pins the
      // rank-error band, merge invariance, and determinism
      "agg_tdigest_quantile",
      // engine-pinned DataSketches HLL bytes; PropertySpec pins the
      // 5% band, merge transparency, and partitioning invariance
      "agg_hll_partitioned_union",
      // engine-pinned CMS hashing (§2.11); CountMinSpec pins the
      // one-sided error, the εN bound, and partitioning invariance
      "agg_countmin_freq",
      // engine-pinned HLL bytes again (the sliding-WAU reuse);
      // PropertySpec pins est within 5% of the exact declared key per
      // day plus partitioning invariance
      "agg_wau_hll_sliding",
      // inclusion-exclusion over the same engine-pinned HLL bytes
      // (§2.11); PropertySpec pins the base-sketch bands and the
      // union-relative intersection band
      "agg_hll_intersection",
      // est(A∪B) − est(B) over the same engine-pinned HLL bytes
      // (§2.11, round 15); PropertySpec pins the base-sketch band,
      // the clamp, and the union-relative difference band
      "agg_hll_difference"),
      s"unexpected oracle-less keys: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
