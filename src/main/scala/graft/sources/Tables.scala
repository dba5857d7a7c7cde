package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata tables (`/root/repo/TESTDATA.md`).
  *
  * Plain parquet scans — schema comes from the footers, and filters /
  * projections push down through the vectorized reader. At 100 TB these
  * become partitioned-table scans (e.g. orders by month, events by day);
  * nothing downstream assumes single-file inputs.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Spread an under-split scan across the session's parallelism. The
    * test-sf corpus tables are SINGLE-file, single-row-group parquet
    * (55 MB at sf10) — below `maxPartitionBytes` they scan as ONE task,
    * so every heavy per-row stage downstream (shingling, hashing,
    * higher-order functions over token arrays) ran serial on one core
    * of 32 regardless of plan shape. Gate on the actual split count:
    * at production scale the source arrives in thousands of splits and
    * this is a PASSTHROUGH — no round-robin exchange of the raw corpus
    * is ever added where the scan already parallelizes.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "embeddings"))

  /** Raw events with `ts` normalized to Long NANOSECONDS — the internal
    * convention the streaming stagers persist to their landing dirs.
    *
    * The driver's fixture has shipped two physical encodings across
    * rounds: INT64(TIMESTAMP(NANOS)) — which Spark's vectorized reader
    * rejects outright (PARQUET_TYPE_ILLEGAL) unless read as Long via
    * `nanosAsLong` — and plain timestamp[us], which Spark reads as
    * TIMESTAMP_NTZ. Both normalize here by inspecting the footer schema,
    * so every downstream consumer is encoding-agnostic. All arithmetic
    * stays in Long (a double division would lose precision above 2^53);
    * the µs path multiplies exactly, matching DuckDB's own reading of
    * the same file to the microsecond.
    */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      // NTZ under the UTC session zone casts value-identically to LTZ
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** `events` with `ts` as a proper TIMESTAMP (µs, UTC session). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRawNanos(spark, sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
