package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.Det._

/** §2.3 Join operators (SURVEY.md). Dimension tables (region/nation/
  * customer/supplier/part at TPC-H ratios) are broadcast explicitly — at
  * 100 TB the fact table never shuffles for a dim join; only fact⋈fact
  * (lineitem⋈orders) shuffles, on the join key, where AQE picks
  * sort-merge or shuffled-hash and handles skew splitting.
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "join_star_multiway" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    })
  )

  val oracle: Map[String, String] = Map(
    "join_star_multiway" ->
      s"""SELECT r_name,
         |${sqlSum("l_extendedprice*(1-l_discount)")} AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
