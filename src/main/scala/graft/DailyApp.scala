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
  * files that have landed since the last tick, each file exactly once,
  * across crashes and re-runs (re-running a day is a no-op, the
  * checkpoint remembers). The whole tick is wrapped in
  * [[RetryRunner.withRetries]] (retries=2, 5-min delay) — the DAG's
  * task-retry semantics at application level, on top of Spark's own
  * task-attempt retries inside each job.
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
    * the parse→B1→B2 splits into the three terminal sinks. Returns the
    * per-day routing summary. Retries the WHOLE tick per the DAG's
    * retry policy; the checkpoint makes re-attempts exactly-once on the
    * append side (already-committed files are not replayed).
    */
  def runTick(spark: SparkSession, cfg: Config): TickSummary =
    RetryRunner.withRetries(cfg.retries, cfg.retryDelayMs, cfg.sleep) { _ =>
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
          // E1 — insert_data: idempotent-per-tick append (the
          // PostgresOperator INSERT; parquet here, JDBC in production)
          wide.write.mode("append").parquet(cfg.table.toString)
          val okDates = wide.select(col("dt")).collect().map(_.getString(0))
          wide.unpersist()
          inserted ++= okDates
          // E3 — alert on format drift
          val badDates = validated.filter(!col("arity_ok"))
            .select(col("date")).collect().map(_.getString(0))
          alerted ++= badDates
          // E2/E3 — the Telegram POSTs, executor-side, when configured
          cfg.notifyUrl.foreach { url =>
            import spark.implicits._
            if (okDates.nonEmpty) NotifySink.post(
              okDates.toSeq.toDF("date").select(col("date"),
                concat(col("date"), lit(TwseFixtures.successMsgSuffix))
                  .as("message")), url, cfg.chatId)
            if (badDates.nonEmpty) NotifySink.post(
              badDates.toSeq.toDF("date").select(col("date"),
                lit(TwseFixtures.alertMsg).as("message")), url, cfg.chatId)
          }
        }
        .start()
      q.awaitTermination()
      TickSummary(inserted.toList, alerted.toList, skipped.toList)
    }
}
