package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.TwseFixtures

/** DataSource V2 provider for the TWSE daily-payload source — the
  * productionized form of the reference's HTTP fetch (`Final_app.py:22-28`;
  * SURVEY.md §2.A1): a table of `(dt, body)` with **one input partition
  * per trading day**, so a backfill over N days fans out to N parallel
  * fetch tasks and a daily run reads exactly one partition.
  *
  * Here each partition yields the checked-in golden fixture for its date
  * instead of calling the network (the zero-egress test form — a real
  * deployment swaps `PayloadReader.fetch` for the HTTP GET; everything
  * else, schema / partitioning / pushdown surface, is the real thing).
  *
  * Usage: `spark.read.format("graft.sources.TwseFixtureSource").load()`.
  */
class TwseFixtureSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TwseFixtureSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new TwseFixtureTable
}

object TwseFixtureSource {
  val schema: StructType = StructType(Seq(
    StructField("dt", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))

  /** (date, payload) pairs — in production, the dates to fetch. */
  val days: Seq[(String, String)] = Seq(
    ("20220819", TwseFixtures.ok),
    ("20220820", TwseFixtures.closed),
    ("20100106", TwseFixtures.drift))
}

private class TwseFixtureTable extends Table with SupportsRead {
  override def name(): String = "twse_bfi82u"
  override def schema(): StructType = TwseFixtureSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TwseScanBuilder
}

private class TwseScanBuilder extends ScanBuilder {
  override def build(): Scan = new TwseScan
}

private class TwseScan extends Scan with Batch {
  override def readSchema(): StructType = TwseFixtureSource.schema
  override def toBatch: Batch = this

  /** One partition per day — the unit of fetch parallelism. */
  override def planInputPartitions(): Array[InputPartition] =
    TwseFixtureSource.days.map { case (dt, body) =>
      TwseDayPartition(dt, body): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TwseReaderFactory
}

private case class TwseDayPartition(dt: String, body: String) extends InputPartition

private class TwseReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TwseDayPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      // a real deployment fetches here: GET BFI82U?dayDate=${p.dt}
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(p.dt), UTF8String.fromString(p.body))
      override def close(): Unit = ()
    }
  }
}
