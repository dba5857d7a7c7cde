package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-streaming forms of the event operators (SURVEY.md §2.I5 and
  * the reference's daily micro-batch cadence, `Final_app.py:17`).
  *
  * The reference is an incremental daily append; its Spark-native shape is
  * a file-source micro-batch stream processed with Trigger.AvailableNow —
  * the same logical plan as the batch form, executed incrementally with
  * checkpointable state. These helpers run the stream to completion over
  * the finite testdata and hand back the result table, so the batch
  * oracle checks the streaming path too.
  */
object EventsStreaming {

  private val nameCounter = new AtomicInteger()

  /** Raw events schema as stored (ns timestamps as long — see
    * Tables.events).
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def streamSource(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source wants a *directory* of files (in production:
    // the daily-append landing dir). The testdata table is a single file,
    // so stage it into a per-sf temp dir once.
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_src_$safe")
    val target = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sfDir, "events.parquet"), target)
    }
    spark.readStream.schema(rawSchema)
      .parquet(dir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run `body` with a bounded shuffle-partition count: streaming state
    * stores are created per shuffle partition at query start, and 32
    * stores for a handful of groups is pure fixed cost (store init +
    * checkpoint IO dominated the streaming queries' bench time). The
    * conf is restored after the query has fully executed — batch queries
    * plan at their own execution time, so they never see the override.
    */
  private def withStreamPartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** Streaming daily window aggregation — identical result contract to
    * the batch `Analytics.eventsDaily`; complete-mode memory sink for the
    * finite source. In production: append mode + watermark + a real sink.
    */
  def dailyCounts(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    val name = s"graft_stream_daily_${nameCounter.incrementAndGet()}"
    val agg = streamSource(spark, sfDir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  case class SessionAgg(user_id: Long, session_id: Int, n_events: Long,
      session_start_us: Long, session_value: Double)
  case class UserSessionState(nextSessionId: Int, lastTsUs: Long)

  private val gapUs = 30L * 60 * 1000000

  /** Custom streaming state: per-user 30-minute-gap sessionization via
    * flatMapGroupsWithState. Events are sorted within each micro-batch
    * (the file source delivers one batch here); state carries the last
    * event time and running session id across batches. The batch
    * gaps-and-islands form (`Analytics.eventsSessionized`) is the oracle
    * — a spec asserts both agree.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = withStreamPartitions(spark, 8) {
    import spark.implicits._
    val name = s"graft_stream_sessions_${nameCounter.incrementAndGet()}"

    val events: Dataset[Ev] = streamSource(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]

    def fn(userId: Long, it: Iterator[Ev],
        state: GroupState[UserSessionState]): Iterator[SessionAgg] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption.getOrElse(UserSessionState(0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      var cur: Option[SessionAgg] = None
      sorted.foreach { e =>
        val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
        if (newSession) {
          cur.foreach(out += _)
          st = UserSessionState(st.nextSessionId + 1, e.ts_us)
          cur = Some(SessionAgg(userId, st.nextSessionId, 1, e.ts_us, e.value))
        } else {
          st = st.copy(lastTsUs = e.ts_us)
          cur = Some(cur.get.copy(
            n_events = cur.get.n_events + 1,
            session_value = cur.get.session_value + e.value))
        }
      }
      cur.foreach(out += _)
      state.update(st)
      out.iterator
    }

    val q = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
