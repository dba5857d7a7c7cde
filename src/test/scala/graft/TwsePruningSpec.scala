package graft

import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** A1 column pruning: the DSv2 source must push required columns into
  * the scan, and a pruned-out payload column must never be fetched.
  */
class TwsePruningSpec extends SparkTestBase {

  private def source = spark.read.format("graft.sources.TwseFixtureSource")

  test("select(dt) prunes body out of the scan's read schema") {
    val df = source.load().select("dt")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("dt"))
  }

  test("a metadata-only query performs zero HTTP fetches in live mode") {
    val hits = new AtomicInteger()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/BFI82U", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val body = graft.sources.TwseFixtureSource.days.head._2.getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/BFI82U"
      val live = source.option("baseUrl", base).load()
      assert(live.select("dt").collect().map(_.getString(0)).sorted
        === Array("20100106", "20220819", "20220820"))
      assert(live.count() === 3)
      assert(hits.get() === 0, "pruned scans must not re-crawl")
      // sanity: asking for the payload does fetch
      assert(live.select("body").collect().length === 3)
      assert(hits.get() === 3)
    } finally server.stop(0)
  }

  test("ungrouped count(*) pushes into the source: scan emits counts, no rows") {
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    // AQE wraps the physical agg, so inspect the optimized logical scan
    def scanSchema(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r
      }.head.scan.readSchema().fieldNames.toSeq

    val df = source.load().groupBy().count()
    assert(df.head.getLong(0) === 3)
    // the pushed scan's schema IS the aggregate column, not (dt, body)
    assert(scanSchema(df) === Seq("count(*)"))
    // grouped aggregates must NOT push (the source only handles CountStar)
    val grouped = source.load().groupBy("dt").count()
    assert(scanSchema(grouped) === Seq("dt"),
      "grouped count must fall back to a pruned dt-only scan")
    assert(grouped.count() === 3)
  }

  test("reported key-grouped partitioning makes the dt-grouped agg exchange-free") {
    def planOf(bucketing: Boolean): String = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", bucketing)
      try {
        val df = source.load()
          .groupBy("dt").agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("body"))).as("n_bytes"))
        assert(df.collect().length === 3) // values identical either way
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
    // with v2 bucketing on, the scan's KeyGroupedPartitioning(dt)
    // satisfies the aggregation's distribution — no shuffle at all
    assert(!planOf(bucketing = true).contains("Exchange"),
      "day-grouped agg over the day-partitioned source must not shuffle")
    // control: without the conf the same plan pays a hash exchange,
    // proving the report (not plan size) is what removed it
    assert(planOf(bucketing = false).contains("Exchange"))
  }

  test("two key-grouped reads storage-partition-join on dt with no shuffle") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = source.load().select(col("dt"),
        length(col("body")).as("a_bytes"))
      val b = source.load().select(col("dt").as("dt2"),
        length(col("body")).as("b_bytes"))
      val joined = a.join(b, col("dt") === col("dt2"))
        .select(col("dt"), col("a_bytes"), col("b_bytes"))
      val rows = joined.collect()
      assert(rows.length === 3)
      rows.foreach(r => assert(r.getInt(1) === r.getInt(2)))
      // both scans report KeyGroupedPartitioning(dt), so the join is a
      // storage-partitioned join: partitions pair up by key, no exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a storage-partitioned join with zero shuffles:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
