package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession, SparkSessionExtensions}

/** Config-path registration: `.config("spark.sql.extensions",
  * "graft.plans.GraftSparkExtensions")` at session build time.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => AsofJoinFilterPushdown)
  }
}

/** DataFrame-level API over the [[AsofJoin]] logical operator. */
object AsofJoinSupport {

  /** Runtime registration for sessions built without the extensions
    * config (the driver's own sessions). Idempotent.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    GraftPlanBridge.registerStrategy(spark, AsofJoinStrategy)
    GraftPlanBridge.registerOptimization(spark, AsofJoinFilterPushdown)
  }

  /** `left` asof-joined to `right`: each left row gains the columns of
    * the last right row with equal key and `rightTime <= leftTime`
    * (ties on time: last under `rightTiebreak` ascending wins), or
    * nulls when no right row qualifies. Column names must be disjoint
    * across the two sides (rename before joining, as with any join).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = GraftPlanBridge.analyzed(left)
    val rPlan = GraftPlanBridge.analyzed(right)
    // Resolve the key/time columns against the analyzed children so the
    // node enters analysis fully resolved.
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                name: String): org.apache.spark.sql.catalyst.expressions.Attribute = {
      // exact match first (covers case-sensitive schemas), then the
      // default case-insensitive resolution — refusing ambiguity rather
      // than silently picking a column
      val exact = plan.output.filter(_.name == name)
      val matches = if (exact.nonEmpty) exact
        else plan.output.filter(_.name.equalsIgnoreCase(name))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"asofJoin: ambiguous column '$name' (${many.map(_.name).mkString(", ")})")
      }
    }
    val node = AsofJoin(lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      rightTiebreak.map(resolve(rPlan, _)))
    GraftPlanBridge.ofRows(spark, node)
  }
}
