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

  test("every query key has oracle SQL — no exemptions since round 16") {
    // The former §2.11 sketch exemptions (HLL ×4, WAU-HLL, t-digest,
    // count-min, approx-quantile/distinct, minhash-LSH, simhash,
    // Lloyd k-means) were enrolled in round 16 via self-checking
    // outputs: each key emits exact values the oracle recomputes plus
    // ε-band booleans the oracle asserts as literal TRUE, so a sketch
    // drifting out of band hash-fails at the driver. The raw-estimate
    // bands stay pinned in PropertySpec / TDigestSpec / CountMinSpec /
    // SketchTableSpec / KMeansSpec / DedupScaleSpec.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less keys: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
