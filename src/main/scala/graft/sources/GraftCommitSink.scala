package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 WRITE-side provider — the transactional batch-writer
  * protocol (SURVEY.md §2.E1's sink family, as a custom connector): the
  * piece a warehouse connector must get right so that SPECULATIVE and
  * RETRIED tasks never double-land rows.
  *
  * The commit discipline is the two-phase contract Spark's
  * `BatchWrite` API encodes:
  *   1. every task attempt writes to a PRIVATE staging file named by
  *      (partitionId, taskId) — attempts never collide;
  *   2. `DataWriter.commit()` seals the attempt and hands its staged
  *      path back as the `WriterCommitMessage`; `abort()` deletes it;
  *   3. Spark guarantees AT MOST ONE attempt per partition commits —
  *      the driver's `BatchWrite.commit(messages)` then moves exactly
  *      the committed files into the table directory and drops the
  *      `_SUCCESS` marker LAST, so readers gate on it and a crash
  *      anywhere earlier leaves the table provably unborn.
  * A failed attempt's leftover staging file is ignored by commit (only
  * message-listed files move) and removed by `abort`/cleanup — this is
  * FileOutputCommitter's design, restated through the DSv2 API where
  * the engine, not the FS layout, drives the protocol.
  *
  * All staging and publish I/O goes through the Hadoop `FileSystem`
  * resolved from the sink path, so the protocol holds on distributed
  * storage (HDFS, object-store committers with rename semantics), not
  * just a shared local disk: executors stage via the same FS the
  * driver publishes on. The Hadoop configuration is captured on the
  * driver at write-build time and shipped to executors inside the
  * `DataWriterFactory` (`SerializableConfiguration`), exactly as
  * Spark's own file sources ship theirs.
  *
  * `SaveMode.Overwrite` arrives as `SupportsTruncate.truncate()`; the
  * builder records it and `BatchWrite.commit` deletes every previously
  * committed `part-*` file and the old `_SUCCESS` marker BEFORE
  * publishing the new generation — so overwrite replaces, never
  * silently appends. The delete happens inside commit (not at job
  * start) so an aborted overwrite leaves the previous generation
  * intact and readable.
  *
  * Rows serialize as tab-joined text (long/int/double/string/bool
  * columns) — the format is deliberately trivial because the PROTOCOL
  * is the subject; `GraftSinkSpec` injects a first-attempt task failure
  * and proves the retried write lands exactly once, and proves
  * overwrite-after-commit replaces the old generation.
  */
class GraftCommitSink extends TableProvider {
  /** Pure sink: the schema always comes from the write query
    * (`supportsExternalMetadata`), never from provider state — a read
    * attempt fails loudly instead of observing whatever schema some
    * other write happened to leave behind.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft.sources.GraftCommitSink is write-only; the schema comes from the write query")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSinkTable(schema)
  override def supportsExternalMetadata(): Boolean = true
}

object GraftCommitSink {
  private[sources] def render(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "null"
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(
          s"GraftCommitSink: unsupported column type $dt")
      }
    }.mkString("\t")
}

private class GraftSinkTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_commit_sink"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = {
        val doTruncate = truncateFirst
        new Write {
          override def toBatch: BatchWrite =
            new GraftBatchWrite(info.options.get("path"), info.schema(),
              doTruncate,
              new SerializableConfiguration(
                SparkSession.active.sessionState.newHadoopConf()))
        }
      }
    }
}

private case class StagedFile(path: String) extends WriterCommitMessage

private class GraftBatchWrite(dir: String, schema: StructType,
    truncateFirst: Boolean, conf: SerializableConfiguration) extends BatchWrite {
  require(dir != null, "GraftCommitSink requires .option(\"path\", ...)")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(dir, schema, conf)

  /** Driver-side atomic publish: (for overwrite) drop the previous
    * generation, then move ONLY the files named by committed task
    * messages, then the _SUCCESS marker last.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    fs.mkdirs(d)
    if (truncateFirst) {
      // SaveMode.Overwrite: the previous generation's data files go
      // first, its _SUCCESS marker with them — a reader racing this
      // commit sees either the complete old table or (briefly) an
      // unborn one, never a mix of generations.
      val old = Option(fs.globStatus(new Path(d, "part-*"))).getOrElse(Array.empty)
      old.foreach(st => fs.delete(st.getPath, false))
      fs.delete(new Path(d, "_SUCCESS"), false)
    }
    messages.foreach { case StagedFile(p) =>
      val src = new Path(p)
      fs.rename(src, new Path(d, src.getName))
    }
    fs.create(new Path(d, "_SUCCESS"), true).close()
    // leftover staging files belong to aborted/failed attempts: drop them
    fs.delete(new Path(d, "_staging"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    messages.filter(_ != null).foreach { case StagedFile(p) =>
      fs.delete(new Path(p), false)
    }
  }
}

private class GraftWriterFactory(dir: String, schema: StructType,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged = {
        val staging = new Path(dir, "_staging")
        staging.getFileSystem(conf.value).mkdirs(staging)
        new Path(staging, f"part-$partitionId%05d-attempt-$taskId")
      }
      private val fs = staged.getFileSystem(conf.value)
      private val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(staged, true),
          java.nio.charset.StandardCharsets.UTF_8))
      override def write(row: InternalRow): Unit = {
        out.write(GraftCommitSink.render(row, schema)); out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close(); StagedFile(staged.toString)
      }
      override def abort(): Unit = {
        out.close(); fs.delete(staged, false)
      }
      override def close(): Unit = ()
    }
}
