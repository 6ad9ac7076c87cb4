package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's classic backend: `Column ⇄ Expression`
  * conversion is `private[sql]` in Spark 4 (the Column API became
  * backend-agnostic), so custom Catalyst expressions need this one-hop
  * shim to surface as user-facing Columns. Standard extension-library
  * technique; nothing else in the engine lives in Spark's namespace.
  */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a custom LogicalPlan as a DataFrame (runs the analyzer). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register an extra planner strategy on a live session (idempotent,
    * synchronized: extraStrategies is a plain var on shared state). */
  def addStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Register an extra optimizer rule on a live session (idempotent,
    * synchronized like addStrategy). Runs in the "User Provided
    * Optimizers" batch after the default batches — rules must tolerate
    * already-optimized shapes (e.g. an inserted WindowGroupLimit). */
  def addOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(rule))
        exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }

  /** Release the storage blocks behind a (local)checkpointed DataFrame.
    * `df.unpersist` only touches the plan cache, not the RDD-level
    * persistence a checkpoint pins — iterative loops need this to avoid
    * holding one labels copy per superstep (LogicalRDD is private[sql],
    * hence the shim). No-op for non-checkpoint-backed frames. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
