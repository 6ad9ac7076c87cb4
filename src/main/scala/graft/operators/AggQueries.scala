package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.Det._

/** §2.4 Aggregation operators (SURVEY.md). All groupBy/agg plans get
  * Spark's two-phase HashAggregate (partial map-side combine + final) for
  * free — at 100 TB the partial agg bounds shuffle volume by group count,
  * not row count.
  */
object AggQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Flagship — TPC-H Q1-style pricing summary.
    "agg_groupby_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_groupby_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlSum("l_quantity")} AS sum_qty,
         |${sqlSum("l_extendedprice")} AS sum_base_price,
         |${sqlSum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |${sqlSum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |${sqlAvg("l_quantity")} AS avg_qty,
         |${sqlAvg("l_extendedprice")} AS avg_price,
         |${sqlAvg("l_discount")} AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
