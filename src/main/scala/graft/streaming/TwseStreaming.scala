package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.model.{Schemas, TwseFixtures}
import graft.operators.TwsePipeline

/** The flagship TWSE pipeline as a Structured Streaming job — the
  * reference's actual operating mode: one new payload lands per trading
  * day and is incrementally appended (`@daily` schedule + append-only
  * INSERT, reference `Final_app.py:17,109`).
  *
  * Shape: file-source micro-batch (one JSON payload file per day landing
  * in a directory) → the SAME parse/filter/clean/validate/pivot transform
  * chain as the batch plan → `foreachBatch` sink doing the idempotent
  * append (JDBC in production, parquet here) — with
  * `Trigger.AvailableNow` standing in for the daily scheduler tick.
  */
object TwseStreaming {

  private val runCounter = new AtomicInteger()
  // unique per JVM: a fresh landing/checkpoint/sink triple per run, so a
  // stale checkpoint from an earlier process (possibly older code) can't
  // replay into this run's sink
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  /** Run the stream over the three golden fixtures and return the
    * appended `investment_data` readback — which must equal the batch
    * flagship output (the golden row).
    */
  def flagshipStream(spark: SparkSession): DataFrame = {
    val run = runCounter.incrementAndGet()
    val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_twse_stream_${jvmTag}_$run")
    val landing = base.resolve("landing")
    val sink = base.resolve("investment_data").toString
    val checkpoint = base.resolve("checkpoint").toString
    Files.createDirectories(landing)
    TwseFixtures.all.zipWithIndex.foreach { case (payload, i) =>
      Files.write(landing.resolve(s"day_$i.json"),
        payload.getBytes(StandardCharsets.UTF_8))
    }

    val parsedStream = spark.readStream
      .schema(Schemas.twsePayload)
      .json(landing.toString)

    val validRows = TwsePipeline.pivotWide(
      TwsePipeline.validatedFrom(parsedStream).filter(col("arity_ok")))

    val q = validRows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the reference's PostgresOperator append (E1), per micro-batch
        batch.write.mode("append").parquet(sink)
      }
      .start()
    q.awaitTermination()

    spark.read.parquet(sink) // A3 readback — the verification path
  }
}
