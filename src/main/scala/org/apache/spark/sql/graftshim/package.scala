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

  /** Rebuild a (local)checkpointed DataFrame's LogicalRDD WITHOUT its
    * `originConstraints`. A checkpoint preserves the origin plan's
    * constraint set verbatim; when the checkpointed frame is then
    * unioned with a plan derived FROM it (the iterative-loop shape:
    * `relaxed.unionByName(dist)`), Union's constraint rewrite can hit
    * an origin attribute that is in neither child's output and dies
    * with `key not found: <attr>` inside AttributeMap — observed on
    * Spark 4.1 when the origin lineage contains a generator
    * (posexplode) feeding the loop. Constraints on a materialized
    * iterate buy nothing (filters were already applied to produce the
    * data), so dropping them is free. No-op for frames that are not
    * LogicalRDD-rooted. */
  def dropOriginConstraints(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession],
          new org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(
            df.sparkSession.asInstanceOf[classic.SparkSession],
            None, None))
      case _ => df
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
