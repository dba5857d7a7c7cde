package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Expectation-based data-quality validation — the guardrail pass a
  * production pipeline runs before publishing a table (the
  * Deequ/dbt-test shape): each expectation computes its violation count
  * in ONE shared scan (conditional aggregates), plus a key-uniqueness
  * check from a distinct count, and the result is a long-format
  * (constraint, violations, pass) report a scheduler can gate on.
  *
  * Scale shape: the conditional aggregates fold into a single
  * map-side-combined hash aggregate over one scan; the distinct count
  * is the only exchange. No per-constraint rescans — adding an
  * expectation is one more conditional column, not one more pass over
  * 100 TB.
  */
object Quality {

  def expectations(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("v_date"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("v_status"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dup"))
    agg.select(expr(
      """stack(4,
        |  'totalprice_positive', v_price,
        |  'orderdate_not_null', v_date,
        |  'orderstatus_in_domain', v_status,
        |  'orderkey_unique', v_dup) AS (check_name, violations)""".stripMargin))
      .withColumn("pass", col("violations") === 0L)
  }
}
