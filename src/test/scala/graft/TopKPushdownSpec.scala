package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, WindowGroupLimit}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim
import graft.plans.{TopKPerGroupNode, TopKPushdownRule, TopKStrategy}

/** Unit tests for the top-k pushdown optimizer rule. The rule is applied
  * MANUALLY to optimized plans here (not installed on the shared
  * session), so the window-form baselines stay genuine window plans.
  * End-to-end installed behavior is covered by the declared
  * `topk_pushdown_rank` key (oracle gate + PlanAuditSpec pin).
  */
class TopKPushdownSpec extends SparkSpec {

  private def ordersRankLimited(pred: DataFrame => DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    pred(Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn")))
  }

  private def runRewritten(df: DataFrame) = {
    val rewritten = TopKPushdownRule(df.queryExecution.optimizedPlan)
    graftshim.addStrategy(spark, TopKStrategy)
    (rewritten, graftshim.ofRows(spark, rewritten))
  }

  test("Filter(rn<=3, Window) rewrites to TopKPerGroupNode and matches the window form") {
    val df = ordersRankLimited(_.filter(col("rn") <= 3))
    val (rewritten, got) = runRewritten(df)
    assert(rewritten.collect { case t: TopKPerGroupNode => t }.nonEmpty,
      rewritten.toString.take(1500))
    // the native InferWindowGroupLimit node must be subsumed, not stacked
    assert(rewritten.collect { case w: WindowGroupLimit => w }.isEmpty,
      rewritten.toString.take(1500))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(got.collect().toSeq.sortBy(key) == df.collect().toSeq.sortBy(key))
  }

  test("cast-wrapped comparison (cast(rn as bigint) <= 2L) still rewrites") {
    val df = ordersRankLimited(d =>
      d.withColumn("rn", col("rn").cast("long")).filter(col("rn") <= 2L))
    val (rewritten, got) = runRewritten(df)
    assert(rewritten.collect { case t: TopKPerGroupNode => t }.nonEmpty,
      rewritten.toString.take(1500))
    assert(got.count() == df.count())
  }

  test("rn = 2 keeps a residual equality filter over TopK(2)") {
    val df = ordersRankLimited(_.filter(col("rn") === 2))
    val (rewritten, got) = runRewritten(df)
    val topks = rewritten.collect { case t: TopKPerGroupNode => t }
    assert(topks.map(_.k) == Seq(2), rewritten.toString.take(1500))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(got.collect().toSeq.sortBy(key) == df.collect().toSeq.sortBy(key))
  }

  test("rn <= 0 folds to an empty relation") {
    val df = ordersRankLimited(_.filter(col("rn") <= 0))
    val (rewritten, got) = runRewritten(df)
    assert(rewritten.isInstanceOf[LocalRelation] ||
      rewritten.collect { case l: LocalRelation => l }.nonEmpty,
      rewritten.toString.take(1500))
    assert(got.count() == 0)
  }

  test("rank()-based filters are left alone (ties may exceed k rows)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    val df = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rk"))
      .filter(col("rk") <= 3)
    val rewritten = TopKPushdownRule(df.queryExecution.optimizedPlan)
    assert(rewritten.collect { case t: TopKPerGroupNode => t }.isEmpty,
      rewritten.toString.take(1500))
  }

  test("multi-expression windows are left alone (siblings need all rows)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val df = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .filter(col("rn") <= 3)
    val rewritten = TopKPushdownRule(df.queryExecution.optimizedPlan)
    assert(rewritten.collect { case t: TopKPerGroupNode => t }.isEmpty,
      rewritten.toString.take(1500))
  }

  test("kill switch: spark.graft.topk.pushdown.enabled=false disables the rewrite") {
    val df = ordersRankLimited(_.filter(col("rn") <= 3))
    spark.conf.set("spark.graft.topk.pushdown.enabled", "false")
    try {
      val rewritten = TopKPushdownRule(df.queryExecution.optimizedPlan)
      assert(rewritten.collect { case t: TopKPerGroupNode => t }.isEmpty)
    } finally spark.conf.unset("spark.graft.topk.pushdown.enabled")
  }

  test("idempotent: re-applying the rule to a rewritten plan is a no-op") {
    val df = ordersRankLimited(_.filter(col("rn") === 2))
    val once = TopKPushdownRule(df.queryExecution.optimizedPlan)
    val twice = TopKPushdownRule(once)
    assert(once == twice, twice.toString.take(1500))
  }
}
