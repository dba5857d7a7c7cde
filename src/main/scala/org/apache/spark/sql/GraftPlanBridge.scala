package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to the `private[sql]` plan-level surfaces graft's custom
  * operator needs: analyzed-plan extraction, DataFrame construction from
  * a LogicalPlan, and runtime strategy registration on an EXISTING
  * session (the driver builds plain sessions, so config-time
  * `spark.sql.extensions` alone is not enough). Same one-file shim
  * technique as [[GraftExpressionBridge]].
  */
object GraftPlanBridge {

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotent: registering the same strategy object twice is a no-op. */
  def registerStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Idempotent runtime registration of a SQL function backed by a
    * catalyst Expression builder — the `CREATE FUNCTION` path for custom
    * expressions, so `spark.sql("... graft_fn(col) ...")` text works on
    * sessions built without the extensions config.
    */
  def registerSqlFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
    val registry =
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name),
        builder)
    }
  }

  /** Idempotent runtime registration of an optimizer rule. */
  def registerOptimization(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule)) {
      exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }
}
