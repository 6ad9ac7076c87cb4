package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.Det._
import graft.plans.TopKPerGroup

/** §2.15 Reshape / percentile / sampling operators (round-3 amendment).
  *
  * The relational-reshape surface (pivot/unpivot), exact distribution
  * statistics, and deterministic data selection a training-data pipeline
  * needs for corpus mixing. Scale notes per key:
  *
  *  - `pivot_wide`: a pinned value list keeps the schema static (no
  *    driver-side distinct scan) and the plan a plain two-phase hash
  *    aggregate — grouped rows × fixed columns, shuffle bounded by group
  *    count.
  *  - `unpivot_long`: Expand emits one row per (row × metric) map-side —
  *    the reshape itself never shuffles; the plan's single exchange is
  *    the range partitioning for the final presentation sort.
  *  - `agg_percentiles`: exact interpolated percentiles; Spark's
  *    `percentile` buffers per-group values — acceptable for bounded
  *    group counts (3 here). The open-ended-groups scale path is the
  *    separate `agg_approx_quantile` key below (mergeable
  *    Greenwald-Khanna summaries, property-tested — the sketch has no
  *    cross-engine oracle).
  *  - `sample_stratified_hash`: deterministic per-stratum downsampling —
  *    order docs inside each language by a content-independent hash
  *    (md5 of the id) and keep the first k. Unlike `TABLESAMPLE` /
  *    `rand()`, re-runs and retried tasks pick the SAME rows (SURVEY
  *    §1.3 determinism contract), and unlike a window rank≤k it runs on
  *    the bounded-heap `TopKPerGroupExec`: partial heaps cap each map
  *    task's output at k rows per stratum, so the shuffle carries
  *    O(k · strata · partitions) rows, not the corpus.
  */
object ReshapeQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Orders: priority × status revenue matrix. Each cell is the shared
    // Det.dsum recipe (exact decimal sum, 4dp round, double cast).
    "pivot_wide" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .orderBy(col("o_orderpriority"))
    }),

    // SQL PIVOT (§2.61) — the PARSER/PLANNER surface behind
    // pivot_wide's DataFrame form: the dedicated `PIVOT (agg FOR col
    // IN (...))` clause with MULTIPLE aggregates per cell (count +
    // decimal revenue — the DataFrame .pivot takes one agg per call)
    // and NAMED pivot values controlling the generated column names.
    // The outer projection rounds the decimal cells at the edge and
    // pins the output schema; rows outside the pinned value list are
    // excluded by PIVOT semantics (the oracle's FILTER mirrors that).
    // Plans to the same two-phase hash aggregate as pivot_wide.
    "sql_pivot" -> ((s, dir) => {
      s.sql(s"""SELECT o_orderstatus,
        |  urgent_n, CAST(ROUND(urgent_rev, 4) AS DOUBLE) AS urgent_rev,
        |  high_n, CAST(ROUND(high_rev, 4) AS DOUBLE) AS high_rev,
        |  low_n, CAST(ROUND(low_rev, 4) AS DOUBLE) AS low_rev
        |FROM (SELECT o_orderstatus, o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(38,6)) AS p
        |  FROM parquet.`$dir/orders.parquet`)
        |PIVOT (count(*) AS n, sum(p) AS rev
        |  FOR o_orderpriority IN ('1-URGENT' AS urgent, '2-HIGH' AS high,
        |    '5-LOW' AS low))
        |ORDER BY o_orderstatus""".stripMargin)
    }),

    // SQL UNPIVOT (§2.61) — the inverse clause, over a grouped metrics
    // table (per-status count/max/min as uniform DOUBLEs): `UNPIVOT
    // (val FOR metric IN (...))` is its own parser surface distinct
    // from the DataFrame .unpivot the long-form key uses; default
    // EXCLUDE NULLS semantics documented (all cells non-null here).
    "sql_unpivot" -> ((s, dir) => {
      s.sql(s"""SELECT o_orderstatus, metric, val FROM (
        |  SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS n_orders,
        |    max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
        |  FROM parquet.`$dir/orders.parquet` GROUP BY o_orderstatus)
        |UNPIVOT (val FOR metric IN (n_orders, max_price, min_price))
        |ORDER BY o_orderstatus, metric""".stripMargin)
    }),

    // Lineitem measures to long form: raw parquet doubles pass through
    // untouched (no arithmetic → bit-identical to the UNION ALL oracle).
    "unpivot_long" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    // Exact interpolated quartiles of quantity + median price per flag.
    "agg_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          r4d(percentile(col("l_quantity"), lit(0.25))).as("p25"),
          r4d(percentile(col("l_quantity"), lit(0.5))).as("p50"),
          r4d(percentile(col("l_quantity"), lit(0.75))).as("p75"),
          r4d(percentile(col("l_extendedprice"), lit(0.5))).as("med_price"))
        .orderBy(col("l_returnflag"))
    }),

    // QUARTILE COEFFICIENT OF DISPERSION (§2.126) — the robust
    // relative-spread scalar (Q3−Q1)/(Q3+Q1) per nation over order
    // cents: both quartiles are exact percentile_disc ORDER
    // STATISTICS (actual data values — integers here), so the QCD is
    // one division of exact operands; the scale note of the other
    // exact-percentile keys applies (O(group) state, sketch path =
    // agg_approx_quantile).
    "agg_quartile_dispersion" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey").as("ck"),
            col("c_nationkey").as("nation"))), Seq("ck"))
        .createOrReplaceTempView("orders_qcd")
      s.sql("""SELECT nation, count(*) AS n,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q1,
        |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q3,
        |  ROUND(CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      - percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS DOUBLE)
        |    / CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      + percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS DOUBLE) * 10000) / 10000 AS qcd
        |FROM orders_qcd GROUP BY nation
        |ORDER BY nation""".stripMargin)
    }),

    // BOWLEY QUARTILE SKEWNESS (§2.148) — the robust skewness
    // (Q₃ + Q₁ − 2·Q₂)/(Q₃ − Q₁) per nation over order cents,
    // completing the robust-shape family next to
    // agg_quartile_dispersion's spread: moment skewness chases
    // outliers, Bowley's is bounded in [−1, 1] and exact here —
    // all three quartiles are BIGINT-cast percentile_disc order
    // statistics (§1.3 rule), one division.
    "agg_quartile_skewness" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey").as("ck"),
            col("c_nationkey").as("nation"))), Seq("ck"))
        .createOrReplaceTempView("orders_qsk")
      s.sql("""SELECT nation, count(*) AS n,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q1,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q2,
        |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q3,
        |  ROUND(CAST(CAST(percentile_disc(0.75) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      + CAST(percentile_disc(0.25) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      - 2 * CAST(percentile_disc(0.5) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(percentile_disc(0.75) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      - CAST(percentile_disc(0.25) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT) AS DOUBLE)
        |    * 10000) / 10000 + 0.0 AS bowley_skew
        |FROM orders_qsk GROUP BY nation
        |ORDER BY nation""".stripMargin)
    }),

    // DISCRETE PERCENTILES (§2.80) — PERCENTILE_DISC beside
    // agg_percentiles' interpolated CONT: the inverse-distribution
    // form that returns an ACTUAL data value (the smallest value at
    // cumulative frequency ≥ p), which is what SLO/latency reporting
    // wants — an interpolated "p99" that no request ever experienced
    // is a fabrication. Returned values are exact 2dp fixture doubles,
    // so no rounding is needed at all — the cross-engine contract is
    // value identity, not arithmetic agreement. WITHIN GROUP syntax
    // through the pure spark.sql surface.

    "agg_percentile_disc" -> ((s, dir) => {
      graft.Tables.events(s, dir).createOrReplaceTempView("events_pd")
      s.sql("""SELECT event_type, count(*) AS n,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25_disc,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_disc,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75_disc,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99_disc
        |FROM events_pd GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
    }),

    // MEDIAN ABSOLUTE DEVIATION per group — the robust dispersion
    // member of the stats family (agg_stats' stddev moves with every
    // outlier; MAD = median(|x − median|) is breakdown-point-0.5
    // robust, the spread estimate anomaly thresholds should use when
    // the data has heavy tails). Two exact interpolated percentiles:
    // pass 1 takes each group's median, broadcasts the |groups|-row
    // table back, pass 2 takes the median of the absolute deviations
    // — both order-independent aggregates over exact multisets, so
    // the result is partition-layout-free. At open-ended group
    // cardinalities the exact percentile state is O(group); the
    // sketch path is agg_approx_quantile/agg_tdigest_quantile (same
    // trade documented there).
    "agg_mad" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val med = li.groupBy("l_returnflag")
        .agg(percentile(col("l_extendedprice"), lit(0.5)).as("med"))
      li.join(broadcast(med), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med0"),
          percentile(abs(col("l_extendedprice") - col("med")), lit(0.5))
            .as("mad0"))
        .select(col("l_returnflag"), col("n"), r4d(col("med0")).as("median"),
          r4d(col("mad0")).as("mad"))
        .orderBy("l_returnflag")
    }),

    // The sketch path agg_percentiles' scaladoc points at: mergeable
    // approximate quantiles (Greenwald-Khanna summaries) whose state is
    // O(accuracy), not O(group rows) — the form that survives open-ended
    // group counts at 100 TB. The estimate is engine-pinned (merge
    // order shifts it within the error bound), so the SELF-CHECKING
    // form (round 16) driver-checks the exact disc percentiles (cents,
    // the §1.3 BIGINT convention) plus rank-band booleans: each
    // estimate must lie between the exact (p−ε) and (p+ε) percentiles
    // with ε = 5/accuracy — the same 5× band PropertySpec pins
    // (measured: 0 out-of-band groups at every SF).
    "agg_approx_quantile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .createOrReplaceTempView("li_aq16")
      s.sql("""SELECT l_returnflag, count(*) AS n,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p50_exact_cents,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p95_exact_cents,
        |  percentile_approx(l_extendedprice, 0.5, 1000)
        |      >= percentile(l_extendedprice, 0.495)
        |    AND percentile_approx(l_extendedprice, 0.5, 1000)
        |      <= percentile(l_extendedprice, 0.505) AS p50_in_band,
        |  percentile_approx(l_extendedprice, 0.95, 1000)
        |      >= percentile(l_extendedprice, 0.945)
        |    AND percentile_approx(l_extendedprice, 0.95, 1000)
        |      <= percentile(l_extendedprice, 0.955) AS p95_in_band
        |FROM li_aq16 GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
    }),

    // The same sketch-quantile shape through the engine's OWN custom
    // TypedImperativeAggregate (round-6): t-digest with the k₁ scale
    // function, registered as SQL `tdigest_quantile` via
    // GraftExtensions. Same two-phase plan as percentile_approx —
    // O(δ)-centroid buffers per partition, kilobytes per group through
    // the shuffle. SELF-CHECKING form (round 16), same device as
    // agg_approx_quantile with the TDigestSpec rank band (ε = 0.05);
    // TDigestSpec keeps the band-across-partitionings, merge-order
    // invariance, and run-to-run determinism pins on the raw sketch.
    "agg_tdigest_quantile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      li.createOrReplaceTempView("li_td16")
      val exact = s.sql("""SELECT l_returnflag, count(*) AS n,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p50_exact_cents,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p95_exact_cents
        |FROM li_td16 GROUP BY l_returnflag""".stripMargin)
      val bands = li.groupBy(col("l_returnflag"))
        .agg(graft.functions.TDigestQuantile(col("l_extendedprice"), 0.5)
            .as("td50"),
          graft.functions.TDigestQuantile(col("l_extendedprice"), 0.95)
            .as("td95"),
          percentile(col("l_extendedprice"), lit(0.45)).as("lo50"),
          percentile(col("l_extendedprice"), lit(0.55)).as("hi50"),
          percentile(col("l_extendedprice"), lit(0.90)).as("lo95"),
          percentile(col("l_extendedprice"), lit(1.0)).as("hi95"))
      exact.join(bands, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          col("p50_exact_cents"), col("p95_exact_cents"),
          (col("td50") >= col("lo50") && col("td50") <= col("hi50"))
            .as("p50_in_band"),
          (col("td95") >= col("lo95") && col("td95") <= col("hi95"))
            .as("p95_in_band"))
        .orderBy(col("l_returnflag"))
    }),

    // k docs per language, chosen by md5(doc_id) order — a deterministic
    // pseudo-random stratified sample through TopKPerGroupExec.
    "sample_stratified_hash" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("skey"))
      TopKPerGroup(d, k = 20, partNames = Seq("lang"),
          orderSpec = Seq(("skey", true), ("doc_id", true)))
        .orderBy(col("lang"), col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Round-16 sketch enrollment (see AggQueries.oracle scaladoc):
    // exact disc percentiles recomputed, band booleans asserted TRUE.
    "agg_approx_quantile" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p50_exact_cents,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p95_exact_cents,
        |  TRUE AS p50_in_band, TRUE AS p95_in_band
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_tdigest_quantile" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p50_exact_cents,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS p95_exact_cents,
        |  TRUE AS p50_in_band, TRUE AS p95_in_band
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same BIGINT-cast quartiles, one division.
    "agg_quartile_skewness" ->
      """WITH j AS (SELECT c.c_nationkey AS nation,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
        |SELECT nation, count(*) AS n,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q1,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q2,
        |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |    AS BIGINT) AS q3,
        |  ROUND(CAST(CAST(percentile_disc(0.75) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      + CAST(percentile_disc(0.25) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      - 2 * CAST(percentile_disc(0.5) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(percentile_disc(0.75) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT)
        |      - CAST(percentile_disc(0.25) WITHIN GROUP
        |        (ORDER BY cents) AS BIGINT) AS DOUBLE)
        |    * 10000) / 10000 + 0.0 AS bowley_skew
        |FROM j GROUP BY nation ORDER BY nation""".stripMargin,
    // Exact order statistics, one division.
    "agg_quartile_dispersion" ->
      """WITH j AS (SELECT c.c_nationkey AS nation,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
        |SELECT nation, count(*) AS n,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS q1,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS q3,
        |  ROUND(CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      - percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS DOUBLE)
        |    / CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      + percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS DOUBLE) * 10000) / 10000 AS qcd
        |FROM j GROUP BY nation ORDER BY nation""".stripMargin,
    // Each cell reuses Det.sqlSum verbatim over a CASE (SUM ignores the
    // NULLs of non-matching rows — identical to FILTER).
    "pivot_wide" ->
      s"""SELECT o_orderpriority,
         |  ${sqlSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS "F",
         |  ${sqlSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS "O",
         |  ${sqlSum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS "P"
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    // PIVOT cells re-derived as FILTER aggregates (≡ PIVOT's implicit
    // value filtering); empty cells are NULL in both engines.
    "sql_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |    AS urgent_n,
        |  CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS DOUBLE)
        |    AS urgent_rev,
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high_n,
        |  CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    FILTER (WHERE o_orderpriority = '2-HIGH'), 4) AS DOUBLE)
        |    AS high_rev,
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low_n,
        |  CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    FILTER (WHERE o_orderpriority = '5-LOW'), 4) AS DOUBLE)
        |    AS low_rev
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // UNION ALL spelling of the metric stack (the unpivot_long
    // convention), over the same grouped metrics.
    "sql_unpivot" ->
      """WITH g AS (SELECT o_orderstatus,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    max(o_totalprice) AS max_price,
        |    min(o_totalprice) AS min_price
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT * FROM (
        |  SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val
        |    FROM g
        |  UNION ALL
        |  SELECT o_orderstatus, 'max_price', max_price FROM g
        |  UNION ALL
        |  SELECT o_orderstatus, 'min_price', min_price FROM g)
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "unpivot_long" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(quantile_cont(l_quantity, 0.25) * 10000) / 10000 AS p25,
        |  ROUND(quantile_cont(l_quantity, 0.5) * 10000) / 10000 AS p50,
        |  ROUND(quantile_cont(l_quantity, 0.75) * 10000) / 10000 AS p75,
        |  ROUND(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000 AS med_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // Identical WITHIN GROUP spelling in both engines — the
    // SQL-standard "smallest value at cumulative frequency ≥ p", and
    // the output is a raw data value, so no rounding anywhere.
    "agg_percentile_disc" ->
      """SELECT event_type, count(*) AS n,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25_disc,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_disc,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75_disc,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99_disc
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "agg_mad" ->
      """WITH med AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n,
        |  ROUND(max(m.med) * 10000) / 10000 AS median,
        |  ROUND(quantile_cont(abs(l.l_extendedprice - m.med), 0.5)
        |    * 10000) / 10000 AS mad
        |FROM lineitem l JOIN med m USING (l_returnflag)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "sample_stratified_hash" ->
      """WITH r AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, skey FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin
  )
}
