package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB shuffle-elimination technique
  * (SURVEY §4): persist both fact tables bucketed by the join key and the
  * sort-merge join runs with NO shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders joins without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucket_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    try {
      Tables.t(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
      Tables.t(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")

      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // Same rows as the shuffling join over raw parquet.
      val expected = SparkEntry.queries("join_shuffle_inner")(spark, sf).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
