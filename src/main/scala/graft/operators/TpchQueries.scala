package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.56 (round-9 amendment): the remaining 11 TPC-H queries — q2, q4,
  * q8, q9, q11, q12, q13, q15, q16, q19, q20 — completing the 22-query
  * suite (q1/q3/q5/q6/q7/q10/q14/q17/q18/q21/q22 shipped in earlier
  * waves). Each is a structurally DISTINCT planner shape the engine had
  * not yet proven:
  *
  *  - q2  — correlated scalar-MIN subquery over a 4-way dim chain
  *  - q4  — EXISTS with a correlated non-equi date predicate
  *  - q8  — two-role dimension (nation joined twice) + CASE-share ratio
  *  - q9  — wide star with a profit expression spanning two fact-side
  *          sources
  *  - q11 — group-HAVING against a scalar aggregate over the same CTE
  *  - q12 — conditional counts re-bucketing a join by priority class
  *  - q13 — LEFT OUTER with an ON-clause filter, then a distribution
  *          OVER the group counts (group-by of a group-by)
  *  - q15 — view/scalar-max: exact decimal tie-safe argmax
  *  - q16 — count(DISTINCT) + NOT IN (null-aware anti join)
  *  - q19 — disjunctive OR-of-ANDs predicate across both join sides
  *  - q20 — nested semi-join chain with a correlated scalar threshold
  *
  * FIXTURE ADAPTATION (same policy as q17's container→p_type and q21's
  * receipt→shipdate lateness, documented per query below): the driver
  * fixtures carry no `partsupp` table and no l_commitdate / receiptdate
  * / shipmode / p_container / o_comment columns. Queries needing a
  * part-supplier relation derive one — [[psCte]] — from the fact table
  * itself: the DISTINCT (l_partkey, l_suppkey) pairs with
  * `ps_supplycost = min(l_extendedprice)` (a 2dp DATA VALUE: min of
  * stored doubles involves no arithmetic, so it is bit-identical across
  * engines) and `ps_availqty = Σ l_quantity` (integral, summed as
  * BIGINT — exact). That keeps every adapted query a REAL multi-table
  * planner shape rather than a toy rewrite.
  *
  * SINGLE SOURCE OF TRUTH: each query's SQL is generated ONCE, as a
  * function of a table-name resolver — the Spark side resolves to
  * `parquet.`<dir>/<t>.parquet`` and the DuckDB oracle to the bare view
  * name. The two engines therefore run byte-identical SQL modulo table
  * spelling; a drift between the declared query and its oracle is
  * impossible by construction (the round-8 keys keep separate strings —
  * this wave's generator is the tighter idiom).
  *
  * Determinism (§1.3 discipline): every money aggregate is an exact
  * DECIMAL(38,6) sum rounded once at the edge; ratios divide exact
  * decimal sums in one IEEE double op and round via the r4d multiply
  * spelling; every output is totally ordered; counts are CAST to BIGINT
  * (DuckDB's SUM(int)/count promote to HUGEINT/BIGINT).
  *
  * Scale: all eleven are pure declarative SQL — Catalyst handles
  * broadcast of the dim chains (nation/region/supplier/part at any
  * realistic scale), pushes the q19 disjunction to both scans, and
  * decorrelates every subquery to a join (no per-row re-execution;
  * PlanAuditSpec pins the q2/q17-style rewrite, the q16 NAAJ, the q20
  * semi chain and the q19 pushed OR). The derived-partsupp CTE is one
  * extra lineitem aggregation — at 100 TB a real deployment would
  * materialize it (scan_compact_smallfiles' shape); here it exercises
  * Spark's CTE reuse.
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Table-name resolver: identity for the oracle, parquet path for
    * Spark. */
  private type T = String => String

  /** The derived part-supplier relation (see object scaladoc). */
  private def psCte(t: T): String =
    s"""partsupp AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |    min(l_extendedprice) AS ps_supplycost,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
       |  FROM ${t("lineitem")} GROUP BY 1, 2)""".stripMargin

  // Q2 — min-cost supplier per part: the correlated scalar-MIN subquery
  // whose inner query repeats a 4-way dim chain (partsupp⋈supplier⋈
  // nation⋈region). Catalyst must decorrelate to a per-part MIN
  // aggregate joined back on (partkey, supplycost) — per-row
  // re-execution of the chain is the quadratic trap. Adaptation:
  // region-scoped min over the derived partsupp; p_size <= 15 (equality
  // leaves ~1 part at driver SF). s_acctbal is a 2dp data value;
  // (n_name, s_name, p_partkey) break any tie totally.
  private def q2(t: T): String =
    s"""WITH ${psCte(t)}
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
       |FROM ${t("part")}
       |JOIN partsupp ON p_partkey = ps_partkey
       |JOIN ${t("supplier")} ON s_suppkey = ps_suppkey
       |JOIN ${t("nation")} ON s_nationkey = n_nationkey
       |JOIN ${t("region")} ON n_regionkey = r_regionkey
       |WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT min(ps2.ps_supplycost)
       |    FROM partsupp ps2
       |    JOIN ${t("supplier")} s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN ${t("nation")} n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN ${t("region")} r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // Q4 — order-priority checking: EXISTS whose correlated predicate is
  // a NON-EQUI date comparison against the OUTER table's column
  // (l_shipdate > o_orderdate + 60 days) — decorrelates to a left semi
  // join on o_orderkey with the date residual. Adaptation: the spec's
  // l_commitdate < l_receiptdate lateness becomes shipped-60-days-late,
  // the same adaptation family as q21.
  private def q4(t: T): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM ${t("orders")}
       |WHERE o_orderdate >= DATE '1996-07-01'
       |  AND o_orderdate < DATE '1996-10-01'
       |  AND EXISTS (
       |    SELECT 1 FROM ${t("lineitem")}
       |    WHERE l_orderkey = o_orderkey
       |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // Q8 — national market share: nation joins the star TWICE in
  // different roles (customer's nation gates the region; supplier's
  // nation is the measure dimension) — the self-join-of-a-dim shape.
  // The share is a CASE-gated exact decimal sum over the same rows as
  // the denominator — one grouped pass, no second scan. Numerator and
  // denominator stay DECIMAL(38,6) to the edge; ONE double division,
  // r4d multiply-round.
  private def q8(t: T): String =
    s"""WITH flat AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
       |      AS vol,
       |    n2.n_name AS nation
       |  FROM ${t("lineitem")}
       |  JOIN ${t("part")} ON p_partkey = l_partkey
       |  JOIN ${t("supplier")} ON s_suppkey = l_suppkey
       |  JOIN ${t("orders")} ON l_orderkey = o_orderkey
       |  JOIN ${t("customer")} ON o_custkey = c_custkey
       |  JOIN ${t("nation")} n1 ON c_nationkey = n1.n_nationkey
       |  JOIN ${t("region")} ON n1.n_regionkey = r_regionkey
       |  JOIN ${t("nation")} n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
       |    AND o_orderdate >= DATE '1996-01-01'
       |    AND o_orderdate < DATE '1998-01-01')
       |SELECT o_year,
       |  ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol
       |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
       |    / CAST(SUM(vol) AS DOUBLE) * 10000.0) / 10000.0 AS mkt_share,
       |  count(*) AS n_lines
       |FROM flat GROUP BY o_year ORDER BY o_year""".stripMargin

  // Q9 — product-type profit: the widest star in the suite (lineitem ⋈
  // part ⋈ supplier ⋈ partsupp ⋈ orders ⋈ nation) with a profit
  // expression mixing fact columns and the derived partsupp's
  // supplycost. The per-row amount is ≤4 decimal digits (2dp×2dp minus
  // 2dp×integer), so the double expression — byte-identical in both
  // engines — casts losslessly to DECIMAL(38,6); the sum is exact and
  // rounded once. p_name LIKE '%bolt%' is the spec's '%green%' against
  // the fixture's "<adj> <noun>" names.
  private def q9(t: T): String =
    s"""WITH ${psCte(t)}
       |SELECT nation, o_year,
       |  CAST(ROUND(SUM(amount), 4) AS DOUBLE) AS sum_profit
       |FROM (SELECT n_name AS nation,
       |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    CAST(l_extendedprice * (1 - l_discount)
       |      - ps_supplycost * l_quantity AS DECIMAL(38,6)) AS amount
       |  FROM ${t("lineitem")}
       |  JOIN ${t("part")} ON p_partkey = l_partkey
       |  JOIN ${t("supplier")} ON s_suppkey = l_suppkey
       |  JOIN partsupp ON ps_partkey = l_partkey
       |    AND ps_suppkey = l_suppkey
       |  JOIN ${t("orders")} ON o_orderkey = l_orderkey
       |  JOIN ${t("nation")} ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%bolt%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  // Q11 — important stock: per-part value filtered by a HAVING against
  // a SCALAR aggregate over the same CTE (value > 0.1% of total) — the
  // shared-subplan shape (Spark evaluates the scalar subquery once and
  // broadcasts the single row). Adaptation: region scope (a single
  // fixture nation can own zero of the 10 sf0.001 suppliers); value =
  // supplycost × availqty over the derived partsupp. Both comparison
  // sides cast the EXACT decimal to double before the one multiply —
  // identical IEEE sequence in both engines.
  private def q11(t: T): String =
    s"""WITH ${psCte(t)},
       |v AS (SELECT ps_partkey,
       |    SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6)))
       |      AS value_dec
       |  FROM partsupp
       |  JOIN ${t("supplier")} ON ps_suppkey = s_suppkey
       |  JOIN ${t("nation")} ON s_nationkey = n_nationkey
       |  JOIN ${t("region")} ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'
       |  GROUP BY ps_partkey)
       |SELECT ps_partkey, CAST(ROUND(value_dec, 4) AS DOUBLE) AS value
       |FROM v
       |WHERE CAST(value_dec AS DOUBLE) > (
       |  SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM v)
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // Q12 — shipping-priority audit: one fact⋈orders join re-bucketed by
  // CASE into two conditional counts per group. Adaptation: no
  // l_shipmode/commitdate in the fixture — the group is l_returnflag
  // and "late-ish" is a 30–90-day ship delay window (non-equi
  // predicates between the two tables' date columns, pushed as a join
  // residual).
  private def q12(t: T): String =
    s"""SELECT l_returnflag,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM ${t("orders")} JOIN ${t("lineitem")}
       |  ON o_orderkey = l_orderkey
       |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
       |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
       |  AND l_shipdate >= DATE '1996-01-01'
       |  AND l_shipdate < DATE '1997-01-01'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q13 — customer order-count distribution: LEFT OUTER JOIN whose
  // filter lives in the ON clause (a WHERE would silently turn it
  // inner and drop the zero-order customers — THE classic outer-join
  // bug this query exists to catch), then a second group-by OVER the
  // per-customer counts. count(o_orderkey) counts matches only, so
  // order-less customers land in the c_count = 0 bucket. Adaptation:
  // the spec's o_comment NOT LIKE exclusion becomes an
  // o_orderpriority <> '3-MEDIUM' exclusion (same purpose: the ON
  // filter must not eliminate customers).
  private def q13(t: T): String =
    s"""SELECT c_count, count(*) AS custdist
       |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM ${t("customer")} LEFT OUTER JOIN ${t("orders")}
       |    ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
       |  GROUP BY c_custkey) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // Q15 — top supplier: the view-plus-scalar-max shape. The quarter's
  // per-supplier revenue CTE is referenced twice (rows + its max);
  // equality is tested on the EXACT decimal — a double round-trip
  // could admit false ties — and rounds only in the projection. Ties
  // (multiple argmax suppliers) are all returned, ordered by key, as
  // the spec intends.
  private def q15(t: T): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    SUM(CAST(l_extendedprice * (1 - l_discount)
       |      AS DECIMAL(38,6))) AS total_dec
       |  FROM ${t("lineitem")}
       |  WHERE l_shipdate >= DATE '1996-01-01'
       |    AND l_shipdate < DATE '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name,
       |  CAST(ROUND(total_dec, 4) AS DOUBLE) AS total_revenue
       |FROM ${t("supplier")} JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_dec = (SELECT max(total_dec) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // Q16 — parts/supplier relationship: count(DISTINCT) per 3-column
  // group plus a NOT IN subquery — the null-aware anti join surface
  // (s_suppkey is non-null here, but the planner must still prove it:
  // pinned as NAAJ/anti in PlanAuditSpec). Adaptation: the supplier
  // complaint exclusion becomes the negative-balance suppliers; the
  // partsupp pairs are the distinct fact pairs.
  private def q16(t: T): String =
    s"""WITH partsupp AS (
       |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
       |  FROM ${t("lineitem")})
       |SELECT p_brand, p_type, p_size,
       |  count(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp JOIN ${t("part")} ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#1' AND p_type NOT IN ('PROMO', 'ECONOMY')
       |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN (
       |    SELECT s_suppkey FROM ${t("supplier")} WHERE s_acctbal < 0.0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // Q19 — discounted revenue over an OR-of-ANDs: three brand/size/
  // quantity bands, each mixing columns from BOTH join sides. The
  // planner must (a) keep the equi-join key out of the disjunction and
  // (b) push the per-table residue of the OR to each scan (part gets
  // the brand∨size bands, lineitem the quantity envelope) — pinned in
  // PlanAuditSpec. Output is one totally-determined row (exact decimal
  // revenue + count).
  private def q19(t: T): String =
    s"""SELECT
       |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
       |    AS DECIMAL(38,6))), 4) AS DOUBLE) AS revenue,
       |  count(*) AS n_lines
       |FROM ${t("lineitem")} JOIN ${t("part")} ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       |    AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // Q20 — potential part promotion: the NESTED SEMI-JOIN CHAIN —
  // suppliers IN (partsupp pairs whose part IN (name-filtered parts)
  // AND whose stock beats a CORRELATED scalar 0.5×Σqty threshold).
  // Three nesting levels, each of which must collapse to a semi join /
  // decorrelated aggregate (pinned). Adaptation: availqty is the
  // derived total quantity; 'forest%' becomes 'red%' against the
  // fixture vocabulary; nation scope widened to region EUROPE (one
  // nation ≈ 0.4 suppliers at sf0.001).
  private def q20(t: T): String =
    s"""WITH ${psCte(t)}
       |SELECT s_name, s_acctbal
       |FROM ${t("supplier")}
       |JOIN ${t("nation")} ON s_nationkey = n_nationkey
       |JOIN ${t("region")} ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (
       |        SELECT p_partkey FROM ${t("part")}
       |        WHERE p_name LIKE 'red%')
       |      AND ps_availqty > (
       |        SELECT 0.5 * sum(l_quantity) FROM ${t("lineitem")}
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= DATE '1996-01-01'
       |          AND l_shipdate < DATE '1997-01-01'))
       |ORDER BY s_name""".stripMargin

  private val gens: Map[String, T => String] = Map(
    "sql_tpch_q2" -> q2, "sql_tpch_q4" -> q4, "sql_tpch_q8" -> q8,
    "sql_tpch_q9" -> q9, "sql_tpch_q11" -> q11, "sql_tpch_q12" -> q12,
    "sql_tpch_q13" -> q13, "sql_tpch_q15" -> q15, "sql_tpch_q16" -> q16,
    "sql_tpch_q19" -> q19, "sql_tpch_q20" -> q20)

  /** Spark-side SQL text of a key (PlanAuditSpec explains these). */
  private[graft] def sparkSql(key: String, dir: String): String =
    gens(key)(name => s"parquet.`$dir/$name.parquet`")

  def queries: Map[String, Q] = gens.map { case (k, _) =>
    k -> ((s: SparkSession, dir: String) => s.sql(sparkSql(k, dir)))
  }

  def oracle: Map[String, String] = gens.map { case (k, g) =>
    k -> g(identity)
  }
}
