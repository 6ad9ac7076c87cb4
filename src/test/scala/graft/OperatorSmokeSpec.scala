package graft

/** Every declared query must run and return rows on sf0.001 (value-level
  * correctness is the driver's DuckDB oracle gate; this guards against
  * regressions between driver rounds). Known-empty results are exempted
  * explicitly so accidental empties fail loudly.
  */
class OperatorSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set[String]()

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has oracle SQL or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_distinct", "dedup_minhash_lsh",
      "dedup_simhash", "agg_approx_quantile"),
      s"unexpected oracle-less keys: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
