package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{epochDay, events, t}
import graft.Det._
import graft.functions.Bloom

/** §2.3 Join operators (SURVEY.md).
  *
  * Scale design: dimension tables (region/nation/customer/supplier/part at
  * TPC-H ratios) are broadcast explicitly, so the fact table never shuffles
  * for a dim join. Only fact⋈fact (lineitem⋈orders, self-joins) shuffles,
  * on the join key, where AQE picks sort-merge vs shuffled-hash and splits
  * skewed partitions. The as-of join is expressed as equi-join + per-key
  * window dedup — the shuffle is on the equi key, so it scales like any
  * keyed join rather than a range cross product.
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The star join behind `join_star_multiway` (dims hint-broadcast) and
    * `join_star_aqe` (identical, unhinted — planner stats + AQE must
    * pick broadcast on their own, pinned in PlanAuditSpec). */
  private def starJoin(s: SparkSession, dir: String,
      hinted: Boolean): DataFrame = {
    val dim = (df: DataFrame) => if (hinted) broadcast(df) else df
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(dim(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(dim(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(dim(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** One oracle serves both star keys — the hint changes only the plan. */
  private val starSql =
    s"""SELECT r_name,
       |${sqlSum("l_extendedprice*(1-l_discount)")} AS revenue,
       |COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "join_broadcast_inner" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("p_retailprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "join_shuffle_inner" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Left outer with a join-side predicate: unmatched order rows survive.
    "join_left_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c),
          col("o_custkey") === col("c_custkey") && col("c_acctbal") > 5000, "left")
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("c_custkey").isNull, 0L).otherwise(1L).as("matched"),
          coalesce(col("c_name"), lit("NONE")).as("c_name"))
        .orderBy(col("o_orderkey"))
    }),

    "join_full_outer" -> ((s, dir) => {
      val cc = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val sc = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(sc, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Orders with ≥1 lineitem shipped after a date (≡ WHERE EXISTS).
    "join_left_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp_ntz"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Customers with no big-ticket order (≡ NOT EXISTS).
    "join_left_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_cross" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Non-equi: shipdate within ±30 days of the order's orderdate. The
    // equi key carries the shuffle; the range predicate is a post-filter.
    "join_theta_range" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 30 DAYS")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("lag_days"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // As-of: for each event, the latest order (orderdate ≤ ts) of the
    // mapped customer (o_custkey = user_id + 1). Equi-join on the customer
    // key, then ONE aggregation: max of struct(o_orderdate, o_orderkey) is
    // the lexicographic argmax, so the join's per-customer fan-out is
    // collapsed by map-side partial agg before the shuffle — no window
    // pass over the inflated join (was rank=1 over every joined row).
    "join_asof" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = t(s, dir, "orders")
      e.join(o, col("o_custkey") === col("user_id") + 1 && col("o_orderdate") <= col("ts"))
        .groupBy(col("event_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
          col("m.o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("event_id"))
    }),

    // TOLERANCE as-of (§2.59) — the staleness-bounded member of the
    // ASOF family (pandas merge_asof's `tolerance`, every feature
    // store's max-staleness contract): latest order at-or-before the
    // event, but ONLY within 365 days — an older match is worse than
    // no match (serving a year-stale feature silently corrupts
    // training), so out-of-tolerance events keep NULLs via the LEFT
    // face (join_asof is inner: its events without any prior order
    // simply drop). Shape: inner equi-join + max-of-struct argmax like
    // the siblings, then one LEFT join back on the unique event key to
    // restore the no-match rows — the tolerance predicate prunes the
    // join fan-out BEFORE the aggregate (a post-agg filter would carry
    // the full history through the shuffle).
    "join_asof_tolerance" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = t(s, dir, "orders")
      val matched = e.join(o,
          col("o_custkey") === col("user_id") + 1
            && col("o_orderdate") <= col("ts")
            && col("o_orderdate") >= col("ts") - expr("INTERVAL 365 DAY"))
        .groupBy(col("event_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      e.select(col("event_id"), col("ts"))
        .join(matched, Seq("event_id"), "left")
        .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
          col("m.o_orderdate").cast("date").as("o_orderdate"),
          datediff(col("ts").cast("date"), col("m.o_orderdate").cast("date"))
            .cast("long").as("staleness_days"))
        .orderBy(col("event_id"))
    }),

    // NEAREST as-of (round-6): the bidirectional member of the ASOF
    // family — for each event, the order of the mapped customer nearest
    // in time (either direction), tie → earlier date, then lower key.
    // Same scale shape as join_asof: equi-join on the customer key, then
    // ONE min-of-struct partial agg collapses the per-customer fan-out
    // map-side — lexicographic (distance, date, key) min IS the
    // deterministic argmin, no window over the inflated join.
    "join_asof_nearest" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      val o = t(s, dir, "orders")
      e.join(o, col("o_custkey") === col("user_id") + 1)
        .withColumn("d", abs(unix_millis(col("o_orderdate").cast("timestamp"))
          - unix_millis(col("ts").cast("timestamp"))))
        .groupBy(col("event_id"))
        .agg(min(struct(col("d"), col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
          col("m.o_orderdate").cast("date").as("o_orderdate"),
          col("m.d").as("dist_ms"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of — the third direction of the ASOF family (backward
    // = latest at-or-before, nearest = either side; forward = EARLIEST
    // strictly-after — "the next purchase after this error", the
    // recovery/conversion-lag read; trading's next-quote). Runs inside
    // the events table where the time domains genuinely overlap (the
    // orders fixture predates every event, which would make an
    // order-anchored forward asof vacuously empty). Same scale shape
    // as the siblings: equi-join on the user key with the time
    // residual, ONE min-of-struct partial agg collapses the fan-out
    // map-side — lexicographic (ms, event_id) min IS the
    // deterministic argmin, no window over the inflated join.
    "join_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts").cast("timestamp")).as("ms"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"),
          col("event_id").as("p_event_id"),
          unix_millis(col("ts").cast("timestamp")).as("pms"))
      err.join(pur, col("pu") === col("user_id") && col("pms") > col("ms"))
        .groupBy(col("event_id"), col("ms"))
        .agg(min(struct(col("pms"), col("p_event_id"))).as("m"))
        .select(col("event_id"), col("m.p_event_id").as("next_purchase_id"),
          (col("m.pms") - col("ms")).as("gap_ms"))
        .orderBy(col("event_id"))
    }),

    // EXISTENCE JOIN — EXISTS as a SELECT-LIST boolean instead of a
    // WHERE filter: "flag every customer, keep them all" (the feature
    // column a churn model reads) rather than "keep matching
    // customers". Catalyst plans this as its FOURTH join flavor,
    // ExistenceJoin (pinned) — a semi join would LOSE the non-matching
    // rows, an outer join + dedup would multiply them; the existence
    // join emits exactly one boolean per probe row. Second flag rides
    // the same pattern with a different predicate — two existence
    // joins, one pass.
    "join_existence_flag" -> ((s, dir) => {
      val cust = s"parquet.`$dir/customer.parquet`"
      val ords = s"parquet.`$dir/orders.parquet`"
      s.sql(s"""SELECT c_custkey, c_name,
        |  EXISTS (SELECT 1 FROM $ords
        |    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |    AS has_big_order,
        |  EXISTS (SELECT 1 FROM $ords
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |    AS has_f_order
        |FROM $cust
        |ORDER BY c_custkey""".stripMargin)
    }),

    // INLINE VALUES dim join (§2.62) — the literal lookup table every
    // report query carries (code → label mappings too small and too
    // query-local for a stored dimension): `JOIN VALUES ... AS
    // m(flag, descr)` is its own parser surface (Spark allows the
    // unparenthesized form; DuckDB requires parentheses — semantics
    // identical). The planner sees a LocalRelation with known tiny
    // stats, so the join broadcasts by construction — the fact scan
    // never shuffles, exactly the scalar-dim shape at 100 TB.
    "sql_values_inline" -> ((s, dir) => {
      s.sql(s"""SELECT m.descr AS flag_descr, count(*) AS n,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(38,6))),4)
        |    AS DOUBLE) AS revenue
        |FROM parquet.`$dir/lineitem.parquet`
        |JOIN VALUES ('A','accepted'),('R','returned'),('N','none')
        |  AS m(flag, descr) ON l_returnflag = m.flag
        |GROUP BY m.descr ORDER BY m.descr""".stripMargin)
    }),

    "join_star_multiway" -> ((s, dir) => starJoin(s, dir, hinted = true)),

    // The same star join UNHINTED — proves the engine doesn't need
    // manual hints at fixture scale; the hinted form stays as the
    // belt-and-braces path for clusters where dim-table stats are
    // missing or stale.
    "join_star_aqe" -> ((s, dir) => starJoin(s, dir, hinted = false)),

    // Order pairs of the same customer placed within 7 days (k1 < k2).
    "join_self" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val o1 = o.select(col("o_orderkey").as("k1"), col("o_custkey").as("ck1"),
        col("o_orderdate").cast("date").as("d1"))
      val o2 = o.select(col("o_orderkey").as("k2"), col("o_custkey").as("ck2"),
        col("o_orderdate").cast("date").as("d2"))
      o1.join(o2, col("ck1") === col("ck2") && col("k1") < col("k2")
          && abs(datediff(col("d2"), col("d1"))) <= 7)
        .select(col("ck1").as("o_custkey"), col("k1"), col("k2"),
          datediff(col("d2"), col("d1")).cast("long").as("day_gap"))
        .orderBy(col("k1"), col("k2"))
    }),

    // NULL-SAFE equality join (<=>) — the one join predicate semantics
    // the §2.3 family doesn't cover: NULL keys MATCH each other instead
    // of vanishing (how dimension joins on optional attributes behave
    // after a lossy enrichment). NULLs injected deterministically on
    // both sides (nationkey nullified on a mod — the
    // filter_null_semantics device), sparse enough that the NULL×NULL
    // match group stays bounded at every SF. Output aggregates pair
    // counts per (possibly NULL) key: under plain `=` the NULL group
    // would be absent, which is exactly what the oracle's
    // IS NOT DISTINCT FROM spelling pins. Planner note: <=> is still an
    // EQUI key (EqualNullSafe) — Spark hashes it, no nested loop.
    "join_null_safe" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        nullif(col("c_nationkey"), pmod(col("c_custkey"), lit(7)))
          .as("nk_c"), col("c_custkey"))
      val su = t(s, dir, "supplier").select(
        nullif(col("s_nationkey"), pmod(col("s_suppkey"), lit(7)))
          .as("nk_s"), col("s_suppkey"))
      c.join(su, col("nk_c") <=> col("nk_s"))
        .groupBy(col("nk_c").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("c_custkey")).as("n_cust"),
          countDistinct(col("s_suppkey")).as("n_supp"))
        .orderBy(col("nationkey").asc_nulls_first)
    }),

    // Facts joined to a 5-row per-type dim on a pathologically hot key
    // (every event carries one of 5 types) through Skew.saltedJoin: the
    // fact side salts on hash(event_id) % 8, the dim replicates 8×, so
    // each hot key spreads over 8 reducers instead of flooding one. The
    // salt is engine-internal — results are row-identical to the plain
    // join the oracle runs.
    "join_skew_salted" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"))
      val d = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"), davg(col("value")).as("avg_value"))
      Skew.saltedJoin(e, d, "event_type", saltBy = col("event_id"), buckets = 8)
        .select(col("event_id"), col("event_type"), col("n_type"), col("avg_value"))
        .orderBy(col("event_id"))
    }),

    // The same hot-key workload UNSALTED (round-5 verdict item): the
    // engine-autonomy counterpart of join_skew_salted, the way
    // join_star_aqe complements the hinted star. Declared as the plain
    // join — at fixture scale the planner broadcasts the 5-row dim; at
    // cluster scale (dim too big to broadcast, hot partitions past the
    // 256 MB default threshold) AQE's OptimizeSkewedJoin splits the hot
    // partitions at runtime with NO query rewrite. That runtime split is
    // pinned in PlanAuditSpec on a synthetic hot-key shuffle with
    // scaled-down thresholds, since fixture shuffles can't cross the
    // production byte thresholds. Manual salting remains for the cases
    // AQE doesn't cover (shuffled-hash aggregation buffers, streaming
    // state) — see Skew's scaladoc.
    "join_skew_aqe" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"))
      val d = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"), davg(col("value")).as("avg_value"))
      e.join(d, Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("n_type"), col("avg_value"))
        .orderBy(col("event_id"))
    }),

    // PURE range join (no equi key anywhere — the case join_theta_range
    // does NOT cover, since its range predicate rides on an orderkey
    // equi-join): count lineitems shipped within [o_orderdate,
    // o_orderdate + 7 days] of ANY sampled order. A naive non-equi join
    // is a nested-loop O(n·m) — the classic 100 TB killer. The binned
    // rewrite makes it an EQUI join: work in whole days, bin width 8
    // (= the 8-day inclusive span, so every interval covers at most 2
    // bins and every point exactly 1 — each qualifying pair meets in
    // the point's bin exactly once, no dedup needed), explode intervals
    // to their ≤2 distinct bins, hash-join on bin, verify the precise
    // BETWEEN as a residual filter. Pinned in PlanAuditSpec to stay an
    // equi join (no BroadcastNestedLoopJoin) even with broadcast
    // disabled. Generalizes to any interval length L: bin width ≥ L ⇒
    // ≤2 bins per interval.
    "join_range_binned" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .filter(pmod(col("o_custkey"), lit(20)) === 0)
        .select(col("o_orderkey"),
          epochDay("o_orderdate").as("sd"))
        .withColumn("ed", col("sd") + 7)
      val pts = t(s, dir, "lineitem")
        .select(epochDay("l_shipdate").as("d"))
      RangeJoin.pointInInterval(pts, "d", iv, "sd", "ed", binWidth = 8)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"), min(col("d")).as("first_day"),
          max(col("d")).as("last_day"))
        .orderBy(col("o_orderkey"))
    }),

    // INTERVAL×INTERVAL overlap join — the family member
    // join_range_binned's point×interval form doesn't cover (temporal
    // validity joins, ad attribution windows, availability ranges): each
    // sampled order's 8-day window against each sampled lineitem's
    // variable 2–11-day ship window, overlap = `a_sd ≤ b_ed AND b_sd ≤
    // a_ed`. Naively a BroadcastNestedLoopJoin; RangeJoin.intervalOverlap
    // rewrites it to an equi join on 11-day bins (width ≥ both spans ⇒
    // ≤2 bins per side) with pair-uniqueness by the greatest-start bin
    // rule — no post-join dedup shuffle. The variable b-side span makes
    // the multi-bin explode non-vacuous at every scale factor.
    "join_interval_overlap" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .filter(pmod(col("o_custkey"), lit(20)) === 0)
        .select(col("o_orderkey"), epochDay("o_orderdate").as("a_sd"))
        .withColumn("a_ed", col("a_sd") + 7)
      val b = t(s, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(50)) === 0)
        .select(col("l_orderkey"), epochDay("l_shipdate").as("b_sd"))
        .withColumn("b_ed", col("b_sd") + 1 + pmod(col("l_orderkey"), lit(10)))
      RangeJoin.intervalOverlap(a, "a_sd", "a_ed", b, "b_sd", "b_ed",
          binWidth = 11)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_overlap"), min(col("b_sd")).as("first_sd"),
          max(col("b_ed")).as("last_ed"))
        .orderBy(col("o_orderkey"))
    }),

    // Runtime bloom-filter pushdown — the NON-partition-column
    // counterpart of scan_dpp_join: a selective dim predicate
    // (p_retailprice < 905 keeps ~5% of parts) that partition layout
    // can't exploit because l_partkey isn't a partition key. At cluster
    // scale Catalyst's InjectRuntimeFilter builds a bloom filter over
    // the filtered dim's join keys and ANDs `might_contain(l_partkey)`
    // into the fact scan, discarding ~95% of fact rows BEFORE the join
    // shuffle. Declared as the plain join (at fixture scale the dim
    // broadcasts and the scan-size threshold — 10 GB default — rightly
    // suppresses the filter); the injection is pinned in PlanAuditSpec
    // with the thresholds scaled down in a cloned session, like the AQE
    // skew pin above.
    "join_bloom_runtime" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice")
      val pt = t(s, dir, "part").filter(col("p_retailprice") < 905.0)
        .select("p_partkey", "p_name", "p_retailprice")
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
          col("l_quantity"), col("p_retailprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // PREBUILT bloom prefilter — the case InjectRuntimeFilter above
    // CANNOT cover: the key set is built in a different job (a stored
    // blocklist, another pipeline's output), so no single plan ever
    // holds both sides and the optimizer has nothing to inject. The
    // engine's own surfaces (graft.functions.Bloom): a mergeable
    // bitset TypedImperativeAggregate reduces the selected dim keys to
    // an 8 KiB image (partials OR — order-independent), the driver
    // holds O(bytes) state (the pivot-sample legitimacy class, here
    // standing in for "read the stored filter"), and a codegen
    // might-contain probes it per fact row INSIDE the scan stage —
    // ~95% of fact rows die before any join machinery. The exact
    // left-semi join then kills the ~3×10⁻⁶ false positives, so the
    // answer is exact and the oracle is the plain IN-subquery (a wrong
    // bit anywhere → dropped or phantom rows → hash mismatch).
    // BloomSpec pins no-false-negatives, the FP bound and bit-image
    // partitioning invariance; PlanAuditSpec pins the probe's
    // placement inside the fact scan's filter.
    "join_bloom_prebuilt" -> ((s, dir) => {
      val sel = t(s, dir, "part").filter(col("p_brand") === "Brand#4")
        .select(col("p_partkey"))
      val bits = sel.agg(Bloom.build(col("p_partkey"), 1 << 16, 5)
        .as("bf")).head().getAs[Array[Byte]](0)
      t(s, dir, "lineitem")
        .filter(Bloom.mightContain(lit(bits), col("l_partkey"), 5))
        .join(sel, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_partkey"))
    }),

    // NULL-AWARE ANTI JOIN — `NOT IN (subquery)` over a NULLABLE key:
    // semantically AND physically distinct from left_anti (NOT
    // EXISTS). Three-valued logic makes `x NOT IN S` NULL (row
    // dropped) when S contains any NULL — one NULL in the subquery
    // POISONS the whole probe side — so the planner cannot use a
    // plain hash anti join; Spark plans a null-aware anti join
    // (build-side NULL existence checked before the hash probe,
    // pinned in PlanAuditSpec). Three scenarios, one row each:
    // `a_null_free` (non-nullable subquery → behaves like anti),
    // `b_nullable_type` (nullif that never fires — VALUES identical
    // to a, but the nullable type forces the NAAJ plan), and
    // `c_null_poisoned` (a CASE injects a guaranteed NULL → count 0,
    // the semantics a plain anti join would get wrong by returning
    // scenario a's count). The o_totalprice filter keeps every build
    // side a few hundred keys — broadcastable at any SF since high
    // outliers don't grow with data volume... they do here (uniform
    // fixture prices), but the NAAJ build side is a SET of keys and
    // Spark's NAAJ requires a broadcastable build by construction;
    // the fallback at genuinely non-broadcastable scale is the
    // two-branch rewrite (anti join ∪ null-existence check) noted in
    // the scaladoc so callers know the escape hatch.
    "join_null_aware_anti" -> ((s, dir) => {
      val cust = s"parquet.`$dir/customer.parquet`"
      val ords = s"parquet.`$dir/orders.parquet`"
      s.sql(s"""SELECT 'a_null_free' AS scenario, count(*) AS n_cust
        |FROM $cust WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM $ords WHERE o_totalprice > 400000)
        |UNION ALL
        |SELECT 'b_nullable_type', count(*)
        |FROM $cust WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM $ords
        |  WHERE o_totalprice > 400000)
        |UNION ALL
        |SELECT 'c_null_poisoned', count(*)
        |FROM $cust WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |              ELSE o_custkey END
        |  FROM $ords WHERE o_totalprice > 400000)
        |ORDER BY scenario""".stripMargin)
    }),

    // HOT-KEY SALTED JOIN (§2.208) — Skew.saltedJoin demonstrated on a
    // synthesized zipf-ish distribution: the §2.129 md5-uniform device
    // sends HALF of lineitem to one hot key (k = 0) and spreads the
    // rest over 100 cold keys — the one-customer-is-half-the-traffic
    // shape where AQE's skew splitting does NOT help a shuffled hash
    // join's single flooded reducer. The fact side salts by the
    // high-cardinality uniform u (hash(u) % 8), the dim replicates 8×,
    // and the join key widens to (k, salt): the hot key's reducer load
    // drops 1 task → 8 tasks.
    //
    // Output is per-k: the salted join's exact aggregate (n_rows and
    // the dim-weighted quantity sum — the DuckDB oracle recomputes both
    // from the same md5 congruence, so ANY salting bug that duplicates
    // or drops rows is a hash fail), plus the flattening audit as a
    // self-check boolean: per-(k, salt) row counts — the reducer-task
    // loads under the (k, salt) shuffle — must stay ≤ n/8 + 4·√n
    // (+small floor). The bound is the binomial concentration form:
    // per-bucket sd is ~0.33·√n, and the worst bucket across 100 cold
    // keys × 8 buckets reaches ~3.5 sd (measured 61 vs ideal 37 at
    // sf0.01), so a fixed multiplicative slack is wrong in BOTH
    // directions — too tight for 30-row cold keys, vacuous for the
    // hot key. As n grows the bound → (1+ε)·n/8: asymptotically the
    // ideal split, i.e. the flattening claim tightens exactly where
    // skew matters. Big keys must also touch all 8 buckets. SkewSpec
    // pins the plain-vs-salted max-task-load ratio; ScaleStress
    // carries the SF exponent.
    "join_skew_salted_spread" -> ((s, dir) => {
      val buckets = 8
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("u", conv(substring(md5(concat(
            col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string")).cast("binary")), 1, 13),
          16, 10).cast("long"))
        .withColumn("k", when(pmod(col("u"), lit(2L)) === 0L, lit(0L))
          .otherwise(pmod(expr("u div 2"), lit(100L)) + 1L))
      val dim = s.range(0, 101)
        .select(col("id").as("k"), (col("id") * 7 + 3).as("dim_w"))
      val joined = Skew.saltedJoin(fact, dim, "k", saltBy = col("u"),
          buckets = buckets)
        .groupBy("k").agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity") * col("dim_w")).as("wsum"))
      val spread = fact
        .withColumn("salt", pmod(hash(col("u")), lit(buckets)))
        .groupBy("k", "salt").agg(count(lit(1)).as("c"))
        .groupBy("k").agg(max("c").as("maxb"), sum("c").as("n"),
          count(lit(1)).as("nb"))
        .select(col("k"),
          (col("maxb") <= ceil(col("n").cast("double") / buckets
              + lit(4.0) * sqrt(col("n").cast("double"))) + lit(8L)
            && (col("n") < 200 || col("nb") === buckets))
            .as("salt_spread_ok"))
      joined.join(spread, Seq("k")).orderBy("k")
    })
  )

  val oracle: Map[String, String] = Map(
    // The bloom bits are an internal prefilter, invisible in the
    // output — the oracle is the exact semi-join aggregate, which any
    // false NEGATIVE (the one failure a bloom must never have) would
    // flunk by dropping that key's row.
    "join_bloom_prebuilt" ->
      s"""SELECT l_partkey, count(*) AS n_lines,
         |  ${sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_partkey IN (SELECT p_partkey FROM part
         |                    WHERE p_brand = 'Brand#4')
         |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    // The salt is an internal rewrite, invisible in the output: the
    // oracle recomputes the zipf key from the same md5 congruence
    // ('0x'||hex cast ≡ Spark's conv(hex,16,10)) and the exact per-k
    // aggregates — a salting bug that duplicated or dropped rows is a
    // hash fail. The flattening audit (murmur3 bucket spread, not
    // SQL-expressible) ships as the self-check boolean asserted TRUE.
    "join_skew_salted_spread" ->
      s"""WITH f AS (SELECT l_quantity,
         |    CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)
         |      || ':' || CAST(l_linenumber AS VARCHAR)), 1, 13))
         |      AS BIGINT) AS u
         |  FROM lineitem),
         |kk AS (SELECT CASE WHEN u % 2 = 0 THEN 0
         |    ELSE (u // 2) % 100 + 1 END AS k, l_quantity FROM f)
         |SELECT k, count(*) AS n_rows,
         |  ${sqlSum("l_quantity * (k * 7 + 3)")} AS wsum,
         |  TRUE AS salt_spread_ok
         |FROM kk GROUP BY k ORDER BY k""".stripMargin,
    // Parenthesized VALUES — DuckDB's required spelling of the clause.
    "sql_values_inline" ->
      """SELECT m.descr AS flag_descr, count(*) AS n,
        |  CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(38,6))),4)
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN (VALUES ('A','accepted'),('R','returned'),('N','none'))
        |  AS m(flag, descr) ON l_returnflag = m.flag
        |GROUP BY m.descr ORDER BY m.descr""".stripMargin,
    "join_broadcast_inner" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_shuffle_inner" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_left_outer" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS matched,
        |  COALESCE(c_name, 'NONE') AS c_name
        |FROM orders LEFT JOIN customer
        |  ON o_custkey = c_custkey AND c_acctbal > 5000
        |ORDER BY o_orderkey""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(nk_c, nk_s) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) cc
        |FULL OUTER JOIN (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) sc
        |  ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,
    "join_left_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00')
        |ORDER BY o_orderkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    // Same NOT IN spellings — DuckDB evaluates the identical
    // three-valued semantics, so a Spark plan that degraded NAAJ to a
    // plain anti join would flunk scenario c (1500 vs 0).
    "join_null_aware_anti" ->
      """SELECT 'a_null_free' AS scenario, count(*) AS n_cust
        |FROM customer WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |UNION ALL
        |SELECT 'b_nullable_type', count(*)
        |FROM customer WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM orders
        |  WHERE o_totalprice > 400000)
        |UNION ALL
        |SELECT 'c_null_poisoned', count(*)
        |FROM customer WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |              ELSE o_custkey END
        |  FROM orders WHERE o_totalprice > 400000)
        |ORDER BY scenario""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_theta_range" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate - INTERVAL 30 DAY
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_asof" ->
      """SELECT event_id, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate FROM (
        |  SELECT event_id, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM events JOIN orders
        |    ON o_custkey = user_id + 1 AND o_orderdate <= ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // LEFT face restores no-match events as NULL rows; the 365-day
    // bound is the same interval arithmetic both engines run on the
    // event timestamp.
    "join_asof_tolerance" ->
      """SELECT e.event_id, m.o_orderkey,
        |  CAST(m.o_orderdate AS DATE) AS o_orderdate,
        |  CAST(date_diff('day', CAST(m.o_orderdate AS DATE),
        |    CAST(e.ts AS DATE)) AS BIGINT) AS staleness_days
        |FROM events e LEFT JOIN (
        |  SELECT event_id, o_orderkey, o_orderdate FROM (
        |    SELECT event_id, o_orderkey, o_orderdate,
        |      row_number() OVER (PARTITION BY event_id
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM events JOIN orders
        |      ON o_custkey = user_id + 1 AND o_orderdate <= ts
        |        AND o_orderdate >= ts - INTERVAL 365 DAY)
        |  WHERE rn = 1) m ON m.event_id = e.event_id
        |ORDER BY e.event_id""".stripMargin,
    "join_existence_flag" ->
      """SELECT c_custkey, c_name,
        |  EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |    AS has_big_order,
        |  EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |    AS has_f_order
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "join_asof_forward" ->
      """WITH err AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
        |  FROM events WHERE event_type = 'error'),
        |pur AS (SELECT user_id AS pu, event_id AS p_event_id,
        |    epoch_ms(ts) AS pms
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, p_event_id AS next_purchase_id,
        |  pms - ms AS gap_ms FROM (
        |  SELECT event_id, p_event_id, ms, pms,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY pms ASC, p_event_id ASC) AS rn
        |  FROM err JOIN pur ON pu = user_id AND pms > ms)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "join_asof_nearest" ->
      """SELECT event_id, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  dist_ms FROM (
        |  SELECT event_id, o_orderkey, o_orderdate,
        |    abs(epoch_ms(o_orderdate) - epoch_ms(ts)) AS dist_ms,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY abs(epoch_ms(o_orderdate) - epoch_ms(ts)),
        |        o_orderdate, o_orderkey) AS rn
        |  FROM events JOIN orders ON o_custkey = user_id + 1)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "join_star_multiway" -> starSql,
    "join_star_aqe" -> starSql,
    "join_self" ->
      """SELECT o1.o_custkey, o1.o_orderkey AS k1, o2.o_orderkey AS k2,
        |  date_diff('day', CAST(o1.o_orderdate AS DATE), CAST(o2.o_orderdate AS DATE)) AS day_gap
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
        |  AND abs(date_diff('day', CAST(o1.o_orderdate AS DATE), CAST(o2.o_orderdate AS DATE))) <= 7
        |ORDER BY k1, k2""".stripMargin,
    // The salt must be invisible: the oracle is the PLAIN join.
    "join_skew_salted" ->
      s"""WITH d AS (SELECT event_type, COUNT(*) AS n_type,
         |  ${graft.Det.sqlAvg("value")} AS avg_value FROM events GROUP BY event_type)
         |SELECT event_id, event_type, n_type, avg_value
         |FROM events JOIN d USING (event_type)
         |ORDER BY event_id""".stripMargin,
    // The NULL group must be PRESENT — that's the semantic difference
    // IS NOT DISTINCT FROM pins vs plain equality.
    "join_null_safe" ->
      """WITH c AS (SELECT nullif(c_nationkey, c_custkey % 7) AS nk,
        |    c_custkey FROM customer),
        |s AS (SELECT nullif(s_nationkey, s_suppkey % 7) AS nk,
        |    s_suppkey FROM supplier)
        |SELECT c.nk AS nationkey, count(*) AS n_pairs,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(DISTINCT s_suppkey) AS n_supp
        |FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
        |GROUP BY 1 ORDER BY nationkey NULLS FIRST""".stripMargin,
    // Unsalted variant: identical answer by definition.
    "join_skew_aqe" ->
      s"""WITH d AS (SELECT event_type, COUNT(*) AS n_type,
         |  ${graft.Det.sqlAvg("value")} AS avg_value FROM events GROUP BY event_type)
         |SELECT event_id, event_type, n_type, avg_value
         |FROM events JOIN d USING (event_type)
         |ORDER BY event_id""".stripMargin,
    // The oracle is the NAIVE non-equi join — the binned rewrite must
    // be answer-identical to the thing it replaces.
    "join_range_binned" ->
      s"""WITH iv AS (SELECT o_orderkey,
        |    ${sqlEpochDay("o_orderdate")} AS sd
        |  FROM orders WHERE o_custkey % 20 = 0),
        |p AS (SELECT ${sqlEpochDay("l_shipdate")} AS d FROM lineitem)
        |SELECT o_orderkey, count(*) AS n_lines, min(d) AS first_day,
        |  max(d) AS last_day
        |FROM iv JOIN p ON p.d >= iv.sd AND p.d <= iv.sd + 7
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // The oracle is the naive non-equi overlap join the binned rewrite
    // must equal — same convention as join_range_binned.
    "join_interval_overlap" ->
      s"""WITH a AS (SELECT o_orderkey,
        |    ${sqlEpochDay("o_orderdate")} AS a_sd,
        |    ${sqlEpochDay("o_orderdate")} + 7 AS a_ed
        |  FROM orders WHERE o_custkey % 20 = 0),
        |b AS (SELECT l_orderkey,
        |    ${sqlEpochDay("l_shipdate")} AS b_sd,
        |    ${sqlEpochDay("l_shipdate")} + 1 + l_orderkey % 10 AS b_ed
        |  FROM lineitem WHERE l_partkey % 50 = 0)
        |SELECT o_orderkey, count(*) AS n_overlap, min(b_sd) AS first_sd,
        |  max(b_ed) AS last_ed
        |FROM a JOIN b ON a_sd <= b_ed AND b_sd <= a_ed
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    "join_bloom_runtime" ->
      """SELECT l_orderkey, l_linenumber, p_name, l_quantity, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_retailprice < 905.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
