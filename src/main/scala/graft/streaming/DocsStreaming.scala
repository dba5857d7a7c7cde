package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingest-time deduplication over the documents corpus — the
  * online half of the dedup pipeline: as documents arrive in
  * micro-batches, `dropDuplicates` on the content hash keeps exactly the
  * first occurrence of each distinct text, with the seen-hash set held
  * in the state store (in production: bounded by a watermark on ingest
  * time; the corpus here is finite, so the state is the distinct-hash
  * set). Output is the distinct content hashes — deterministic across
  * batch boundaries, so the batch DISTINCT oracle checks the streaming
  * path.
  */
object DocsStreaming {

  private val nameCounter = new AtomicInteger()

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def stagedDir(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_stream_docs_$safe")
    val target = dir.resolve("documents.parquet")
    if (!java.nio.file.Files.exists(target)) {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sfDir, "documents.parquet"), target)
    }
    dir.toString
  }

  /** Distinct content hashes of the streamed corpus. */
  def dedupHashes(spark: SparkSession, sfDir: String): DataFrame =
      EventsStreaming.withStreamPartitions(spark, 8) {
    val name = s"graft_stream_docs_dedup_${nameCounter.incrementAndGet()}"
    val deduped = spark.readStream.schema(docSchema)
      .parquet(stagedDir(sfDir))
      .select(md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
    // foreachBatch parquet append + readback: the distinct-hash rows
    // stream executor-side to files instead of accumulating in driver
    // memory (see EventsStreaming.runToParquet)
    EventsStreaming.runToParquet(spark, deduped, name)
  }
}
