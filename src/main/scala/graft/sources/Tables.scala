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
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` carries a nanosecond parquet timestamp, which Spark's
    * vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL
    * INT64(TIMESTAMP(NANOS))). Read nanos as Long, then convert with
    * integer division — `ts div 1000` stays in Long arithmetic (a
    * double division would lose precision above 2^53) and matches
    * DuckDB's own ns→µs truncation, so oracles agree to the microsecond.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
