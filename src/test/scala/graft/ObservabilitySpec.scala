package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Inline pipeline observability via `Dataset.observe` — the hook a
  * production job uses to assert row counts and value invariants on the
  * SAME pass that produces the output (no second scan, no separate
  * validation job): metrics accumulate executor-side during the action
  * and surface on the driver afterwards.
  */
class ObservabilitySpec extends SparkTestBase {

  test("observe() reports row count and exact sum from the output pass itself") {
    val obs = Observation("orders_metrics")
    val df = graft.sources.Tables.orders(spark, sf())
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_total"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("violations"))
      .filter(col("o_orderstatus").isin("O", "F", "P"))
    val produced = df.count()
    val m = obs.get
    // metrics observed ABOVE the filter: the full input accounting rides
    // the same job that produced the filtered output
    val direct = graft.sources.Tables.orders(spark, sf())
    assert(m("n_rows") === direct.count())
    assert(produced <= m("n_rows").asInstanceOf[Long])
    assert(m("violations") === 0L)
    assert(m("sum_total") ===
      direct.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.get(0))
  }
}
