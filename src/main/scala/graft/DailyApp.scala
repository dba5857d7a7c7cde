package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.{Schemas, TwseFixtures}
import graft.operators.{NotifySink, TwsePipeline}
import graft.streaming.RetryRunner

/** The deployable daily-orchestration entrypoint — the reference's
  * production shape (`/root/reference/dags/Final_app.py:14-20,144-149`:
  * an `@daily` Airflow DAG with `retries: 2`, `retry_delay: 5 min`)
  * re-expressed as ONE runnable Spark driver an operator schedules with
  * cron/systemd/Airflow's SparkSubmitOperator:
  *
  *   fetch (per-date GET → landing file, idempotent)
  *     → B1 market-open split (closed day → do_nothing)
  *     → B2 arity validation split
  *     → insert_data (append to the `investment_data` table) + notice
  *     → alert (format drift)
  *
  * Execution model: the landed payload files are consumed by a
  * Structured Streaming file source under `Trigger.AvailableNow()` with
  * a persistent checkpoint — the scheduler tick processes exactly the
  * files that have landed since the last tick (re-running a day is a
  * no-op, the checkpoint remembers). `foreachBatch` is at-least-once —
  * a crash between the append and the checkpoint commit replays the
  * batch — so the append itself is made idempotent: rows whose `dt` is
  * already present in the table are anti-joined away before writing
  * (one row per day; ticks are scheduler-serialized, so there is no
  * concurrent writer to race). The ingest tick is wrapped in
  * [[RetryRunner.withRetries]] (retries=2, 5-min delay) — the DAG's
  * task-retry semantics at application level, on top of Spark's own
  * task-attempt retries inside each job.
  *
  * Notifications mirror the reference DAG's task graph, where
  * `insert_data` and `notice` are SEPARATE tasks (a notify retry never
  * re-runs the INSERT): the batch body only QUEUES each message as a
  * durable marker file under `notify_pending/`; the POSTs run as their
  * own retried step after the streaming query has committed, deleting
  * each marker on success. A notify failure therefore cannot replay the
  * append, and a crash between commit and delivery leaves the markers
  * in place for the next tick. Delivery is at-least-once, the same
  * semantics as an Airflow task retry of `notice`.
  *
  * At scale this driver is unchanged: the landing dir becomes the
  * object-store prefix the fetcher fleet writes to, the file source
  * lists new objects per tick, and the append target becomes a
  * partitioned table or JDBC sink — all knobs, not code.
  *
  * Usage (see README §Daily pipeline):
  * {{{
  * bin/graft-java graft.DailyApp \
  *   --base /var/lib/graft/twse \
  *   [--date 20220819 ...] [--fetch-url https://.../BFI82U] \
  *   [--notify-url http://.../sendMessage --chat-id 809480369] \
  *   [--fixtures]            # golden 3-day window instead of live GETs
  * }}}
  */
object DailyApp {

  /** One scheduler tick's terminal accounting: per-day routes taken. */
  final case class TickSummary(inserted: Seq[String], alerted: Seq[String],
      skipped: Seq[String]) {
    def routes: Seq[(String, String)] =
      inserted.map(_ -> "insert_data") ++ alerted.map(_ -> "alert") ++
        skipped.map(_ -> "do_nothing")
  }

  final case class Config(
      base: Path,
      dates: Seq[String] = Nil,
      fetchUrl: Option[String] = None,
      notifyUrl: Option[String] = None,
      chatId: String = "809480369", // reference Final_app.py:12
      useFixtures: Boolean = false,
      retries: Int = 2, // Final_app.py:18
      retryDelayMs: Long = 5 * 60 * 1000L, // Final_app.py:19
      sleep: Long => Unit = Thread.sleep) {
    def landing: Path = base.resolve("landing")
    def table: Path = base.resolve("investment_data")
    def checkpoint: Path = base.resolve("checkpoint")
    def notifyPending: Path = base.resolve("notify_pending")
  }

  def main(args: Array[String]): Unit = {
    JvmPrereqs.check()
    val cfg = parse(args.toList)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val summary = runTick(spark, cfg)
    println(s"[daily] inserted=${summary.inserted.mkString(",")} " +
      s"alerted=${summary.alerted.mkString(",")} " +
      s"skipped=${summary.skipped.mkString(",")}")
  }

  private def parse(args: List[String], cfg: Config = Config(
      Paths.get(sys.props("java.io.tmpdir"), "graft_daily"))): Config =
    args match {
      case "--base" :: v :: rest => parse(rest, cfg.copy(base = Paths.get(v)))
      case "--date" :: v :: rest => parse(rest, cfg.copy(dates = cfg.dates :+ v))
      case "--fetch-url" :: v :: rest => parse(rest, cfg.copy(fetchUrl = Some(v)))
      case "--notify-url" :: v :: rest => parse(rest, cfg.copy(notifyUrl = Some(v)))
      case "--chat-id" :: v :: rest => parse(rest, cfg.copy(chatId = v))
      case "--fixtures" :: rest => parse(rest, cfg.copy(useFixtures = true))
      case Nil => cfg
      case other => sys.error(s"unknown args: $other")
    }

  /** Step 1 — fetch: land one payload file per requested date,
    * idempotently (a date already landed is skipped — re-running a day
    * never duplicates, matching the reference's daily task instance).
    * The write is tmp+atomic-move so the streaming file source can
    * never list a half-written payload. Fixture mode lands the three
    * golden scenarios keyed by their own dates.
    */
  private[graft] def fetchAndLand(cfg: Config): Seq[String] = {
    Files.createDirectories(cfg.landing)
    val toLand: Seq[(String, () => String)] =
      if (cfg.useFixtures)
        Seq("20220819" -> (() => TwseFixtures.ok),
          "20220820" -> (() => TwseFixtures.closed),
          "20100106" -> (() => TwseFixtures.drift))
      else cfg.dates.map { d =>
        val url = cfg.fetchUrl.getOrElse(sys.error(
          "--fetch-url required unless --fixtures")) +
          s"?response=json&dayDate=$d" // Final_app.py:26
        d -> (() => graft.sources.TwseFixtureSource.fetch(url))
      }
    toLand.flatMap { case (d, body) =>
      val dest = cfg.landing.resolve(s"day_$d.json")
      if (Files.exists(dest)) None
      else {
        val tmp = cfg.landing.resolve(s".day_$d.json.tmp")
        Files.write(tmp, body().getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
        Some(d)
      }
    }
  }

  /** Steps 2-5 — one scheduler tick: stream the landed payloads through
    * the parse→B1→B2 splits into the three terminal sinks, then deliver
    * queued notifications as a separate retried step. Returns the
    * per-day routing summary. The append is idempotent under batch
    * replay (anti-join on dates already in the table), so the tick-level
    * retry can never duplicate `investment_data` rows.
    */
  def runTick(spark: SparkSession, cfg: Config): TickSummary = {
    val summary = RetryRunner.withRetries(
        cfg.retries, cfg.retryDelayMs, cfg.sleep) { _ =>
      fetchAndLand(cfg)
      val inserted = scala.collection.mutable.ListBuffer.empty[String]
      val alerted = scala.collection.mutable.ListBuffer.empty[String]
      val skipped = scala.collection.mutable.ListBuffer.empty[String]

      val parsedStream = spark.readStream
        .schema(Schemas.twsePayload)
        .json(cfg.landing.toString)

      val q = parsedStream.writeStream
        .option("checkpointLocation", cfg.checkpoint.toString)
        .trigger(Trigger.AvailableNow()) // the daily scheduler tick
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // B1 — market_information / scrapy_condition: closed days
          // terminate at do_nothing (Final_app.py:29-39)
          skipped ++= batch.filter(col("stat") =!= "OK")
            .select(col("date")).collect().map(_.getString(0))
          // B2 — length_condition over the cleaned 12-vector
          val validated = TwsePipeline.validatedFrom(batch)
          val wide = TwsePipeline.pivotWide(
            validated.filter(col("arity_ok"))).cache()
          // E1 — insert_data: foreachBatch is at-least-once, so drop
          // dates the table already holds before appending — a replayed
          // batch re-appends nothing (the PostgresOperator INSERT with
          // an ON CONFLICT DO NOTHING key; parquet here, JDBC in prod).
          // EXACTLY-ONCE ENVELOPE: the dt-granular anti-join assumes a
          // day's append is ATOMIC — true here by construction (one row
          // per dt ⇒ one task, one file, committed or absent). A sink
          // where one day spans several files/tasks (partitioned
          // parquet, JDBC without the ON CONFLICT key) can crash with a
          // day PARTIALLY committed, and replay would anti-join the
          // whole dt away instead of repairing it — such a sink needs
          // row-granular dedup or stage-then-rename, not this guard.
          val fresh =
            if (Files.exists(cfg.table))
              wide.join(spark.read.parquet(cfg.table.toString)
                .select(col("dt")).distinct(), Seq("dt"), "left_anti")
            else wide
          fresh.write.mode("append").parquet(cfg.table.toString)
          val okDates = wide.select(col("dt")).collect().map(_.getString(0))
          wide.unpersist()
          inserted ++= okDates
          // E3 — alert on format drift
          val badDates = validated.filter(!col("arity_ok"))
            .select(col("date")).collect().map(_.getString(0))
          alerted ++= badDates
          // E2/E3 — QUEUE the Telegram messages durably; the POSTs run
          // after the streaming commit as their own task (see Scaladoc)
          cfg.notifyUrl.foreach { _ =>
            okDates.foreach(d => queueNotification(cfg, d, "success",
              d + TwseFixtures.successMsgSuffix))
            badDates.foreach(d => queueNotification(cfg, d, "alert",
              TwseFixtures.alertMsg))
          }
        }
        .start()
      q.awaitTermination()
      TickSummary(inserted.toList, alerted.toList, skipped.toList)
    }
    // E2/E3 — notice/alert as their OWN retried task, after the ingest
    // has committed: a notify failure can only re-run delivery, never
    // the append (Final_app.py:144-149 keeps insert_data → notice as
    // separate DAG tasks with independent retries).
    cfg.notifyUrl.foreach { url =>
      RetryRunner.withRetries(cfg.retries, cfg.retryDelayMs, cfg.sleep) {
        _ => deliverPending(spark, cfg, url)
      }
    }
    summary
  }

  /** Durably queue one notification as `notify_pending/<date>.<kind>.msg`
    * (tmp + atomic move; replayed batches overwrite the same marker, so
    * queueing is idempotent).
    */
  private[graft] def queueNotification(cfg: Config, date: String,
      kind: String, message: String): Unit = {
    Files.createDirectories(cfg.notifyPending)
    val tmp = cfg.notifyPending.resolve(s".$date.$kind.msg.tmp")
    Files.write(tmp, message.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, cfg.notifyPending.resolve(s"$date.$kind.msg"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Deliver every queued notification, deleting each marker only after
    * the whole POST job succeeds. At-least-once: a failure mid-job
    * leaves all markers for the retry (some messages may re-send — the
    * same semantics as retrying the reference's `notice` task).
    */
  private[graft] def deliverPending(spark: SparkSession, cfg: Config,
      url: String): Unit = {
    if (!Files.exists(cfg.notifyPending)) return
    val pending = graft.FsUtil.listDir(cfg.notifyPending)
      .filter(_.getFileName.toString.endsWith(".msg"))
      .toList.sortBy(_.getFileName.toString)
    if (pending.isEmpty) return
    import spark.implicits._
    val msgs = pending.map { p =>
      (p.getFileName.toString.takeWhile(_ != '.'),
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    }
    NotifySink.post(msgs.toDF("date", "message"), url, cfg.chatId)
    pending.foreach(Files.deleteIfExists(_))
  }
}
