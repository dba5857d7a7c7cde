package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of join — an operator Spark lacks natively (SURVEY.md §7.2's
  * "compose existing ops if semantics allow" case): match each fact row
  * to the latest prior reference row of the same key.
  *
  * Implemented as the union + ordered-window construction rather than a
  * custom SparkPlan: tag both sides, sort within the key partition by
  * (time, side, id), and carry the reference side forward with
  * last_value(... IGNORE NULLS). One shuffle on the key — the same
  * exchange an equi-join would need — and no range-explosion, so it
  * scales like a window, not like an inequality join. (DuckDB has a
  * native ASOF JOIN; the oracle uses this same construction instead so
  * tie-breaking semantics are bit-identical.)
  */
object AsOf {

  /** For every `purchase` event: the same user's latest view event at or
    * before it (views at the identical timestamp count as prior — side
    * ordering puts the reference row first on ties).
    */
  /** Same result as [[purchaseToLastView]], through the custom
    * [[graft.plans.AsofJoin]] Catalyst operator (SURVEY §7.2 case (c):
    * LogicalPlan + SparkStrategy + SparkPlan via SparkSessionExtensions)
    * instead of the union+window composition. One hash exchange per
    * side, in-partition sort, single forward merge pass — the plan shape
    * an as-of join should have at 100 TB. The spec asserts both
    * constructions agree row-for-row; the oracle is shared.
    */
  def purchaseToLastViewNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("view_us"))
    graft.plans.AsofJoinSupport.asofJoin(
        purchases, views,
        leftKey = "user_id", rightKey = "v_user",
        leftTime = "ts_us", rightTime = "view_us",
        rightTiebreak = Seq("view_id"))
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("view_id"),
        expr("(ts_us - view_us) div 1000000").as("gap_seconds"))
  }

  def purchaseToLastView(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "view").cast("int").as("is_view"))

    // order: time, then views before purchases on ties, then id
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_view").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ev.withColumn("last_view_id",
        last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_view_us",
        last(when(col("is_view") === 1, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("is_view") === 0)
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("last_view_id").as("view_id"),
        // integer division (not double `/`) so truncation matches DuckDB's //
        expr("(ts_us - last_view_us) div 1000000").as("gap_seconds"))
  }
}
