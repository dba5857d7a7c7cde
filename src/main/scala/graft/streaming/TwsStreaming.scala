package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Spark 4 `transformWithState` — the successor API to
  * `flatMapGroupsWithState` (SPIP: arbitrary stateful processing v2):
  * state is declared as named, individually-evictable primitives
  * (ValueState / ListState / MapState with per-state TTL) on a handle
  * instead of one opaque case-class blob, timers are first-class, and
  * the operator requires the RocksDB state-store provider — the
  * state-bigger-than-heap path is the DEFAULT here, not an option.
  */
object TwsStreaming {

  /** Cumulative per-user running totals carried in ValueState. */
  case class UserTotals(n_events: Long, spend_c: Long)
  /** Per-batch emission: the key plus its updated totals. */
  case class TotalsRow(user_id: Long, n_events: Long, spend_c: Long)

  /** The processor: one ValueState cell per user holding (event count,
    * purchase cents). Each micro-batch it folds the user's new rows into
    * the cell and emits the updated snapshot — so the LAST emission per
    * user (highest n_events) is the final answer, and every retry
    * re-emits deterministically from checkpointed state.
    */
  private class RunningTotals
      extends StatefulProcessor[Long, (Long, Long), TotalsRow] {
    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[TotalsRow] = {
      val prev = Option(totals.get()).getOrElse(UserTotals(0L, 0L))
      var n = prev.n_events
      var c = prev.spend_c
      rows.foreach { case (_, cents) => n += 1; c += cents }
      totals.update(UserTotals(n, c))
      Iterator.single(TotalsRow(key, n, c))
    }
  }

  /** Streaming per-user lifetime totals via `transformWithState` — the
    * contract is the plain batch per-user aggregate, computed instead by
    * keyed ValueState folded across micro-batches. Update-mode
    * `foreachBatch` parquet terminal; readback keeps each user's last
    * (max-n_events) snapshot. Runs under the RocksDB provider, which the
    * operator mandates — per-user state lives off-heap and scales to
    * key cardinalities a heap HashMap cannot.
    */
  def runningTotals(spark: SparkSession, sfDir: String): DataFrame =
      EventsStreaming.withStreamPartitions(spark, 8) {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = s"graft_stream_tws_${EventsStreaming.nextName()}"
      val typed = EventsStreaming.eventsStream(spark, sfDir)
        .select(col("user_id"),
          when(col("event_type") === "purchase",
            (col("value").cast("decimal(12,2)") * 100).cast("long"))
            .otherwise(lit(0L)).as("cents"))
        .as[(Long, Long)]
      val out = typed.groupByKey(_._1)
        .transformWithState(new RunningTotals,
          TimeMode.None(), OutputMode.Update())
      val dumped = EventsStreaming.runToParquet(spark, out.toDF(), name,
        OutputMode.Update)
      dumped.groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("spend_c"))).as("last"))
        .select(col("user_id"), col("last.n_events").as("n_events"),
          col("last.spend_c").as("spend_c"))
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
