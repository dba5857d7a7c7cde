package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned fact layouts — the "at 100 TB these become
  * partitioned scans" promise in [[Tables]] made real: `orders` and
  * `lineitem` staged month-partitioned on their date column, `events`
  * day-partitioned on `ts`. A date-band query against these reads ONLY
  * the matching partition directories (`PartitionFilters` at the file
  * listing, before any row or footer is touched), which is the
  * difference between scanning a year and scanning a month when the
  * corpus is 100 TB.
  *
  * Staging is idempotent per sf (one layout rewrite, amortized across
  * every subsequent query — the bucketed-table discipline) and atomic
  * (Spark writes into a `.build` dir, finalized by a filesystem rename,
  * so a concurrent bench/verify process sees the complete layout or
  * none). The partition value is a ZERO-PADDED string (`yyyy-MM` /
  * `yyyy-MM-dd`), so lexicographic comparisons equal chronological ones
  * and range predicates prune directly.
  *
  * Usage contract: a consumer keeps its EXACT row-level date predicate
  * and adds the coarse partition-column band alongside it — the
  * partition predicate prunes directories, the row predicate keeps the
  * semantics exact at the boundaries.
  */
object PartitionedTables {

  private def sfTag(sfDir: String): String =
    new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9.]", "_")

  /** Stage `df` partitioned by `partCol` under an idempotent per-sf
    * dir; returns the read-back DataFrame (partition column appears as
    * a string column).
    */
  private def staged(spark: SparkSession, sfDir: String, name: String,
      partCol: String, df: => DataFrame): DataFrame = synchronized {
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_pt_${name}_${sfTag(sfDir)}")
    if (!Files.exists(dir)) {
      val build = Paths.get(dir.toString + ".build")
      // a crashed earlier attempt may have left a partial build
      graft.FsUtil.deleteRecursively(build)
      // one file per partition: the write repartitions ON the partition
      // column so each directory holds one compact file, not one shard
      // per upstream task
      df.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(build.toString)
      try Files.move(build, dir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // a concurrent process finalized first: keep theirs
        case _: java.nio.file.FileAlreadyExistsException =>
          graft.FsUtil.deleteRecursively(build)
      }
    }
    spark.read.parquet(dir.toString)
  }

  /** `orders` + `o_month` (yyyy-MM of o_orderdate) partition column. */
  def ordersByMonth(spark: SparkSession, sfDir: String): DataFrame =
    staged(spark, sfDir, "orders_m", "o_month",
      Tables.orders(spark, sfDir)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM")))

  /** `lineitem` + `l_ship_month` (yyyy-MM of l_shipdate). */
  def lineitemByShipMonth(spark: SparkSession, sfDir: String): DataFrame =
    staged(spark, sfDir, "lineitem_m", "l_ship_month",
      Tables.lineitem(spark, sfDir)
        .withColumn("l_ship_month", date_format(col("l_shipdate"), "yyyy-MM")))

  /** `events` + `e_day` (yyyy-MM-dd of ts). */
  def eventsByDay(spark: SparkSession, sfDir: String): DataFrame =
    staged(spark, sfDir, "events_d", "e_day",
      Tables.events(spark, sfDir)
        .withColumn("e_day", date_format(col("ts"), "yyyy-MM-dd")))
}
