package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.Det._

/** §2.2 Projection / filter / predicates (SURVEY.md). All predicates stay
  * `Column` expressions so Catalyst pushes them into the parquet scan
  * (`PushedFilters` in explain()) — never Scala-closure UDF filters.
  */
object FilterQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Nullable boolean → deterministic string (avoids nullable-bool parquet
    * vs pandas-object ambiguity in the oracle compare). */
  private def b2s(c: Column): Column =
    when(c.isNull, lit("null")).when(c, lit("true")).otherwise(lit("false"))

  val queries: Map[String, Q] = Map(
    "filter_simple" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "filter_compound" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F")
          && col("l_quantity").between(10, 20)
          && col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")
          && !(col("l_discount") > 0.09))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
          col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "filter_like" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val contains = p.filter(col("p_name").like("%widget%"))
        .withColumn("match_kind", lit("contains"))
      val starts = p.filter(col("p_name").startsWith("small"))
        .withColumn("match_kind", lit("starts"))
      val ends = p.filter(col("p_name").endsWith("bolt"))
        .withColumn("match_kind", lit("ends"))
      contains.unionByName(starts).unionByName(ends)
        .select(col("match_kind"), col("p_partkey"), col("p_name"))
        .orderBy(col("match_kind"), col("p_partkey"))
    }),

    // Three-valued logic: NOT (x > 5000) is NULL when x is NULL — rows
    // disagree with x <= 5000 only through NULLs (injected: no fixture NULLs).
    "filter_null_semantics" -> ((s, dir) => {
      val bal = when(col("c_acctbal") < 1000, lit(null)).otherwise(col("c_acctbal"))
      t(s, dir, "customer")
        .select(col("c_custkey"), bal.as("bal_n"),
          b2s(!(bal > 5000)).as("not_gt_s"),
          b2s(bal <= 5000).as("le_s"))
        .orderBy(col("c_custkey"))
    }),

    // SELECT * EXCEPT (§2.62) — subtractive projection: wide tables
    // (hundreds of telemetry/feature columns) are projected by what to
    // DROP, not an unmaintainable keep-list. Parser-level surface
    // (Spark spells it EXCEPT, DuckDB EXCLUDE — same semantics);
    // resolves at analysis to a plain named projection, so column
    // pruning to the scan (ReadSchema minus the excluded columns) is
    // identical to an explicit select — zero runtime cost. The
    // timestamp column is among the dropped ones, which also keeps the
    // compared surface tz-free.
    "sql_star_except" -> ((s, dir) => {
      s.sql(s"""SELECT * EXCEPT (o_orderpriority, o_orderdate)
        |FROM parquet.`$dir/orders.parquet`
        |WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin)
    }),

    "project_expressions" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("charge"),
          concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("line_key"),
          when(col("l_returnflag") === "R", "returned")
            .when(col("l_returnflag") === "A", "acked")
            .otherwise("none").as("flag_desc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "filter_simple" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, p_brand, l_quantity, l_discount
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        |  AND l_quantity BETWEEN 10 AND 20
        |  AND p_brand IN ('Brand#1','Brand#3','Brand#5')
        |  AND NOT (l_discount > 0.09)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_like" ->
      """SELECT * FROM (
        |  SELECT 'contains' AS match_kind, p_partkey, p_name FROM part WHERE p_name LIKE '%widget%'
        |  UNION ALL
        |  SELECT 'starts', p_partkey, p_name FROM part WHERE p_name LIKE 'small%'
        |  UNION ALL
        |  SELECT 'ends', p_partkey, p_name FROM part WHERE p_name LIKE '%bolt'
        |) ORDER BY match_kind, p_partkey""".stripMargin,
    "filter_null_semantics" ->
      """WITH t AS (SELECT c_custkey,
        |  CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_acctbal END AS bal_n
        |  FROM customer)
        |SELECT c_custkey, bal_n,
        |  CASE WHEN bal_n IS NULL THEN 'null'
        |       WHEN NOT (bal_n > 5000) THEN 'true' ELSE 'false' END AS not_gt_s,
        |  CASE WHEN bal_n IS NULL THEN 'null'
        |       WHEN bal_n <= 5000 THEN 'true' ELSE 'false' END AS le_s
        |FROM t ORDER BY c_custkey""".stripMargin,
    // DuckDB's spelling of the same clause is EXCLUDE.
    "sql_star_except" ->
      """SELECT * EXCLUDE (o_orderpriority, o_orderdate)
        |FROM orders
        |WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,
    "project_expressions" ->
      s"""SELECT l_orderkey, l_linenumber,
         |${sqlR4("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS charge,
         |l_orderkey || '-' || l_linenumber AS line_key,
         |CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'A' THEN 'acked'
         |  ELSE 'none' END AS flag_desc
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
