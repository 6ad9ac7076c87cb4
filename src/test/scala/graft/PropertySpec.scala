package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** §5 property tests: invariants the DuckDB oracle can't express
  * (engine-pinned sketches, algebraic laws).
  */
class PropertySpec extends SparkSpec {

  /** Run a scalacheck property and assert it holds (scalatestplus bridge
    * isn't on the offline classpath — drive scalacheck directly). */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("approx_count_distinct within 5% of exact on fixtures") {
    val li = Tables.t(spark, sf, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"HLL off by >5%: approx=$a exact=$e")
    }
  }

  test("HLL sketch union: 5% band on union and single-pass, partitioning invariance") {
    val docs = Tables.t(spark, sf, "documents")
    val exact = docs.select(countDistinct(col("doc_id"))).head.getLong(0).toDouble
    // Round-16 self-checking key output: the in-band boolean (and the
    // exact count it is checked against) is what the driver hashes.
    val keyRow = SparkEntry.queries("agg_hll_partitioned_union")(spark, sf).head
    assert(keyRow.getAs[Boolean]("union_within_5pct"),
      "declared key reports union estimate out of band")
    assert(keyRow.getAs[Long]("exact_distinct_docs").toDouble == exact)
    // The raw union-of-per-source-sketches estimate holds the band.
    val union = docs
      .groupBy(col("source")).agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0).toDouble
    assert(math.abs(union - exact) / exact <= 0.05,
      s"HLL union off by >5%: approx=$union exact=$exact")
    // The single-pass sketch holds the same band (measured: union and
    // direct estimates differ slightly — DataSketches unions merge at a
    // different internal precision than a directly-built sketch, 491 vs
    // 500 here — so exact union==direct equality is NOT a library
    // guarantee; the band on both is).
    val single = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))))
      .head.getLong(0).toDouble
    assert(math.abs(single - exact) / exact <= 0.05,
      s"single-pass HLL off by >5%: approx=$single exact=$exact")
    // Partitioning invariance: the estimate can't depend on how rows
    // were split across tasks.
    val repart = docs.repartition(13)
      .groupBy(col("source")).agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0).toDouble
    assert(repart == union,
      s"estimate varies with partitioning: $repart vs $union")
  }

  test("HLL intersection: inclusion-exclusion estimate tracks the exact overlap") {
    // Round-16 self-checking key output: exacts + in-band booleans.
    val row = SparkEntry.queries("agg_hll_intersection")(spark, sf).head
    val e = Tables.events(spark, sf)
    def users(t: String) = e.filter(col("event_type") === t)
      .select("user_id").distinct()
    val exactA = users("click").count()
    val exactB = users("purchase").count()
    val exactI = users("click").intersect(users("purchase")).count()
    assert(row.getAs[Long]("exact_click") == exactA)
    assert(row.getAs[Long]("exact_purchase") == exactB)
    assert(row.getAs[Long]("exact_intersection") == exactI)
    // The two base sketches hold the standard ~2% band; the
    // inclusion-exclusion difference amplifies their absolute errors,
    // so its band is relative to the UNION size (the standard
    // sketch-intersection error model), not the intersection.
    assert(row.getAs[Boolean]("est_click_ok"), "click sketch out of band")
    assert(row.getAs[Boolean]("est_purchase_ok"), "purchase sketch out of band")
    assert(row.getAs[Boolean]("est_intersection_ok"),
      "intersection estimate outside the union-relative band")
  }

  test("HLL difference: union-minus-B estimate tracks the exact set difference") {
    // Round-16 self-checking key output, same model as the intersection.
    val row = SparkEntry.queries("agg_hll_difference")(spark, sf).head
    val e = Tables.events(spark, sf)
    def users(t: String) = e.filter(col("event_type") === t)
      .select("user_id").distinct()
    val exactA = users("click").count()
    val exactD = users("click").except(users("purchase")).count()
    assert(row.getAs[Long]("exact_click") == exactA)
    assert(row.getAs[Long]("exact_click_only") == exactD)
    assert(row.getAs[Boolean]("est_click_ok"), "click sketch out of band")
    assert(row.getAs[Boolean]("est_click_only_ok"),
      "difference estimate outside the union-relative band")
  }

  test("sketched sliding WAU within 5% of the exact declared key per day") {
    val exact = SparkEntry.queries("agg_wau_sliding_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Round-16 self-checking key output: (day, exact_wau, in-band
    // boolean) — the exact column must agree with the exact declared
    // key's spine and every day must hold the band.
    val rows = SparkEntry.queries("agg_wau_hll_sliding")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getLong(0)
      assert(r.getAs[Long]("exact_wau") == exact(day),
        s"exact_wau disagrees with the exact key at day $day")
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"HLL WAU out of band at day $day")
    }
    val est = graft.streaming.GraftStreams.slidingDistinctFromSketches(
        graft.streaming.GraftStreams.dailyUserSketches(
          Tables.events(spark, sf).select(col("event_id"),
            unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
            col("user_id"), col("event_type"), col("value"))
            .as[graft.streaming.Event](
              org.apache.spark.sql.Encoders.product[graft.streaming.Event])),
        windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Partitioning invariance: daily sketches (and their unions) can't
    // depend on how rows were split across tasks.
    val e2 = Tables.events(spark, sf).repartition(13)
      .select(col("user_id"), Tables.epochDay("ts").as("day"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("sk"),
        explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .groupBy("wday")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (day, e) => assert(e2(day) == e,
      s"WAU estimate varies with partitioning at day $day: ${e2(day)} vs $e") }
  }

  test("approx_quantile within rank-error bound of exact percentile") {
    // accuracy=1000 → base rank error 1/1000, but merging per-partition
    // GK summaries degrades the guarantee (the partial count varies with
    // the session's parallelism — this must hold from 1 to local[32]),
    // and the sketch returns an actual data value rather than an
    // interpolated one — so assert a 5× band: estimate between the exact
    // (p − ε) and (p + ε) percentiles with ε = 5/accuracy. Checked per
    // group for both declared fractions.
    val li = Tables.t(spark, sf, "lineitem")
    val eps = 5.0 / 1000
    for (p <- Seq(0.5, 0.95)) {
      val rows = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(p), lit(1000)).as("a"),
          percentile(col("l_extendedprice"), lit(math.max(p - eps, 0.0))).as("lo"),
          percentile(col("l_extendedprice"), lit(math.min(p + eps, 1.0))).as("hi"))
        .collect()
      rows.foreach { r =>
        val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(a >= lo && a <= hi,
          s"p=$p approx=$a outside exact band [$lo, $hi] for ${r.getString(0)}")
      }
    }
  }

  test("minhash LSH output equals exact jaccard dedup at threshold 0.8") {
    val exact = SparkEntry.queries("dedup_near_jaccard")(spark, sf).collect().toSeq
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect().toSeq
    assert(exact == lsh, s"exact=${exact.size} pairs, lsh=${lsh.size} pairs")
  }

  test("minhash candidate recall covers all pairs with J >= 0.9") {
    // All high-similarity pairs from the exact op must appear in LSH output.
    val exact = SparkEntry.queries("dedup_near_jaccard")(spark, sf)
      .filter(col("jac") >= 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"missed ${(exact -- lsh).size} high-J pairs")
  }

  test("jaccard is symmetric and within [0,1] on generated token sets") {
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else (a & b).size.toDouble / (a | b).size
    val genSet = Gen.containerOf[Set, String](Gen.oneOf("a", "b", "c", "d", "e", "f"))
    check(Prop.forAll(genSet, genSet) { (a, b) =>
      val j = jac(a, b)
      j == jac(b, a) && j >= 0.0 && j <= 1.0 && (a != b || j == 1.0)
    })
  }

  test("window running sum equals scan-left fold on generated micro-tables") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1, 4), Gen.choose(-100, 100)))
    check(Prop.forAll(gen) { rows =>
      val indexed = rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v.toLong) }
      if (indexed.isEmpty) true
      else {
        val df = indexed.toDF("k", "seq", "v")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("seq")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val got = df.withColumn("rs", sum(col("v")).over(w))
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(3)).toMap
        val expect = indexed.groupBy(_._1).flatMap { case (k, g) =>
          val sorted = g.sortBy(_._2)
          sorted.zip(sorted.scanLeft(0L)(_ + _._3).tail).map {
            case ((_, seq, _), rs) => (k, seq) -> rs
          }
        }
        got == expect
      }
    })
  }

  test("set algebra: distinct-union idempotent, intersect/except bounds") {
    val c = Tables.t(spark, sf, "customer").select(col("c_nationkey").as("k"))
    val su = Tables.t(spark, sf, "supplier").select(col("s_nationkey").as("k"))
    val a = c.distinct()
    assert(a.union(a).distinct().count() == a.count())
    val inter = c.intersect(su).collect().map(_.getInt(0)).toSet
    val cSet = a.collect().map(_.getInt(0)).toSet
    val sSet = su.distinct().collect().map(_.getInt(0)).toSet
    assert(inter.subsetOf(cSet) && inter.subsetOf(sSet))
    val exc = c.except(su).collect().map(_.getInt(0)).toSet
    assert(exc.subsetOf(cSet) && (exc & sSet).isEmpty)
  }

  test("weighted average UDAF matches plain-SQL weighted mean") {
    val li = Tables.t(spark, sf, "lineitem")
    val wavg = udaf(graft.functions.WeightedAvg)
    val got = li.groupBy("l_returnflag")
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = li.groupBy("l_returnflag")
      .agg((sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
        .as("w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-3, s"$k: $v vs ${exp(k)}") }
  }
}
