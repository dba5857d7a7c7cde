package graft

import org.apache.spark.sql.functions._
import graft.streaming.{JdbcStreamSink, TwseStreaming}

/** E1 streaming-into-JDBC with exactly-once semantics: the
  * delete-then-append-by-batch_id sink must absorb replayed and partial
  * deliveries without loss or duplication.
  */
class JdbcStreamSinkSpec extends SparkTestBase {

  private val url =
    s"jdbc:derby:${sys.props("java.io.tmpdir")}/graft_derby_sinkspec_${java.util.UUID.randomUUID().toString.take(8)};create=true"

  test("replayed micro-batches land exactly once; new batches append") {
    import spark.implicits._
    val ddl = "k VARCHAR(8), v VARCHAR(8)"
    def readback = spark.read.format("jdbc")
      .option("url", url).option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "t").load()

    val b0 = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    JdbcStreamSink.exactlyOnceAppend(b0, 0L, url, "t", ddl)
    assert(readback.count() === 2)

    // checkpoint replay: the SAME batch id delivered again — no dupes
    JdbcStreamSink.exactlyOnceAppend(b0, 0L, url, "t", ddl)
    assert(readback.count() === 2)

    // partial-delivery recovery: a crashed attempt left a subset behind;
    // the re-delivery must replace it with the full batch
    JdbcStreamSink.exactlyOnceAppend(Seq(("c", "3")).toDF("k", "v"), 1L, url, "t", ddl)
    JdbcStreamSink.exactlyOnceAppend(
      Seq(("c", "3"), ("d", "4")).toDF("k", "v"), 1L, url, "t", ddl)
    assert(readback.filter(col("batch_id") === 1L).count() === 2)

    // a genuinely new batch appends
    JdbcStreamSink.exactlyOnceAppend(Seq(("e", "5")).toDF("k", "v"), 2L, url, "t", ddl)
    assert(readback.count() === 5)
    assert(readback.select(countDistinct(col("k"))).head.getLong(0) === 5)
  }

  test("the flagship stream through the JDBC terminal equals the parquet-terminal result") {
    val viaJdbc = JdbcStreamSink.flagshipStreamJdbc(spark)
    val viaParquet = TwseStreaming.flagshipStream(spark)
    assert(canon(viaJdbc) === canon(viaParquet))
    assert(viaJdbc.count() === 1) // the golden flagship row, exactly once
  }
}
