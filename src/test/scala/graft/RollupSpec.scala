package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStreaming

/** The maintained daily-partials table: three micro-batch upserts
  * (dynamic partition overwrite, touched days only) must land on
  * exactly the from-scratch aggregate — the incremental-maintenance
  * contract q_agg_merge_partial's algebra promises.
  */
class RollupSpec extends SparkTestBase {

  test("foreachBatch-maintained rollup equals from-scratch aggregate after 3 micro-batches") {
    val out = EventsStreaming.dailyRollupMaintained(spark, sf())
    val fromScratch = graft.sources.Tables.events(spark, sf())
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("double") / 100.0).as("total_value"))
    assert(canon(out) === canon(fromScratch))
    assert(out.count() > 0)
  }
}
