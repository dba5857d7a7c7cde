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

  /** transformWithState mandates the RocksDB provider; scope it to the
    * call and restore the session's prior setting after.
    */
  private def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

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

  /** Per-(user, event_type) emission from MapState. */
  case class TypeCountRow(user_id: Long, event_type: String, n: Long)

  /** MapState form: one map cell per user keyed by event type — the
    * sub-keyed state shape (per-user per-dimension counters) that a
    * single ValueState blob would have to deserialize/rewrite wholesale
    * on every update; MapState updates touch ONLY the sub-key, which is
    * the difference between O(1) and O(|map|) per event once per-user
    * maps grow wide.
    */
  private class PerTypeCounts
      extends StatefulProcessor[Long, (Long, String), TypeCountRow] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[TypeCountRow] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, et) =>
        counts.updateValue(et,
          (if (counts.containsKey(et)) counts.getValue(et) else 0L) + 1L)
        touched += et
      }
      // emit updated snapshots for the touched sub-keys only
      touched.iterator.map(et => TypeCountRow(key, et, counts.getValue(et)))
    }
  }

  /** Streaming per-(user, event-type) counts via `transformWithState`
    * MapState — same last-snapshot-wins readback as `runningTotals`,
    * contract = the batch two-key aggregate.
    */
  def perTypeCounts(spark: SparkSession, sfDir: String): DataFrame =
      EventsStreaming.withStreamPartitions(spark, 8) {
    import spark.implicits._
    withRocksDb(spark) {
      val name = s"graft_stream_twsmap_${EventsStreaming.nextName()}"
      val typed = EventsStreaming.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_type"))
        .as[(Long, String)]
      val out = typed.groupByKey(_._1)
        .transformWithState(new PerTypeCounts,
          TimeMode.None(), OutputMode.Update())
      val dumped = EventsStreaming.runToParquet(spark, out.toDF(), name,
        OutputMode.Update)
      dumped.groupBy(col("user_id"), col("event_type"))
        .agg(max(col("n")).as("n"))
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
    withRocksDb(spark) {
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
    }
  }
}
