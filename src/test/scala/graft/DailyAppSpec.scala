package graft

import java.nio.charset.StandardCharsets
import java.net.URLDecoder
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions.col

import graft.model.TwseFixtures

/** End-to-end drive of the deployable daily driver ([[DailyApp]]) over
  * the reference's 3-day golden window — open (2022-08-19), closed
  * (2022-08-20), format-drift (2010-01-06) — asserting all three
  * terminal sinks (`Final_app.py:144-149`'s DAG edges): the append, the
  * success notice, the drift alert, and the do_nothing branch; plus the
  * idempotence the checkpoint provides on a re-run, and the DAG-level
  * retry policy (retries=2, 5-min delay) on a fetch that fails twice.
  */
class DailyAppSpec extends SparkTestBase {

  private def withServer[A](
      body: (String, java.util.List[(String, String)]) => A): A = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posts = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    server.createContext("/bot/sendMessage", (ex: HttpExchange) => {
      val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val kv = raw.split("&").map { p =>
        val Array(k, v) = p.split("=", 2)
        k -> URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (ex.getRequestMethod == "POST") posts.add((kv("chat_id"), kv("text")))
      val ok = "{\"ok\":true}".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, ok.length)
      ex.getResponseBody.write(ok)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/bot/sendMessage", posts)
    finally server.stop(0)
  }

  private def freshCfg(notifyUrl: Option[String]) = DailyApp.Config(
    base = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_daily_spec_${java.util.UUID.randomUUID().toString.take(8)}"),
    notifyUrl = notifyUrl,
    useFixtures = true,
    sleep = _ => ()) // no wall-clock waits in specs

  test("one tick over the golden window hits all three terminal sinks") {
    withServer { (url, posts) =>
      val cfg = freshCfg(Some(url))
      val s = DailyApp.runTick(spark, cfg)
      assert(s.inserted === Seq("20220819"))
      assert(s.alerted === Seq("20100106"))
      assert(s.skipped === Seq("20220820"))
      // E1 — the appended investment_data row is the golden row
      val table = spark.read.parquet(cfg.table.toString)
      assert(table.count() === 1)
      val row = table.collect().head
      assert(row.getAs[String]("dt") === "20220819")
      assert(row.getAs[String]("dealer_buy") === "2279109983")
      assert(row.getAs[String]("foreign_dif") === "-7298108131")
      // E2 + E3 — both messages actually POSTed with the DAG's texts
      val byText = {
        import scala.jdk.CollectionConverters._
        posts.asScala.toList
      }
      assert(byText.contains(
        ("809480369", "20220819" + TwseFixtures.successMsgSuffix)))
      assert(byText.contains(("809480369", TwseFixtures.alertMsg)))
      assert(byText.size === 2) // closed day notified nothing
    }
  }

  test("re-running the tick is a no-op: checkpoint dedupes landed files") {
    val cfg = freshCfg(None)
    DailyApp.runTick(spark, cfg)
    val second = DailyApp.runTick(spark, cfg)
    // nothing new landed → nothing inserted/alerted/skipped this tick
    assert(second.inserted.isEmpty && second.alerted.isEmpty &&
      second.skipped.isEmpty)
    // and the table still holds exactly one appended golden row
    assert(spark.read.parquet(cfg.table.toString).count() === 1)
  }

  test("batch replay does not duplicate the append: dt anti-join dedupes") {
    // foreachBatch is at-least-once — simulate the replay a crash between
    // append and checkpoint-commit causes by wiping the checkpoint so the
    // next tick re-processes every landed file against a populated table.
    val cfg = freshCfg(None)
    DailyApp.runTick(spark, cfg)
    org.apache.commons.io.FileUtils.deleteDirectory(cfg.checkpoint.toFile)
    val replay = DailyApp.runTick(spark, cfg)
    // the replayed batch still ROUTES the day (summary reports it) ...
    assert(replay.inserted === Seq("20220819"))
    // ... but appends nothing: exactly one golden row survives the replay
    assert(spark.read.parquet(cfg.table.toString).count() === 1)
  }

  test("notify failure cannot replay the append; its own retry delivers") {
    // a server that 500s the first POST then accepts: the ingest commit
    // happens before any delivery attempt, so the failed notify only
    // re-runs deliverPending — never the insert.
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val posts = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    server.createContext("/bot/sendMessage", (ex: HttpExchange) => {
      val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (failures.getAndDecrement() > 0) {
        ex.sendResponseHeaders(500, -1)
      } else {
        posts.add(URLDecoder.decode(raw.split("&text=", 2)(1), "UTF-8"))
        val ok = "{\"ok\":true}".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, ok.length)
        ex.getResponseBody.write(ok)
      }
      ex.close()
    })
    server.start()
    try {
      val cfg = freshCfg(Some(
        s"http://127.0.0.1:${server.getAddress.getPort}/bot/sendMessage"))
      val s = DailyApp.runTick(spark, cfg)
      assert(s.inserted === Seq("20220819"))
      // the table holds exactly one row despite the notify retry
      assert(spark.read.parquet(cfg.table.toString).count() === 1)
      // both messages eventually delivered (at-least-once is acceptable)
      import scala.jdk.CollectionConverters._
      val delivered = posts.asScala.toSet
      assert(delivered.contains("20220819" + TwseFixtures.successMsgSuffix))
      assert(delivered.contains(TwseFixtures.alertMsg))
      // and the pending ledger drained
      assert(!Files.exists(cfg.notifyPending) ||
        Files.list(cfg.notifyPending).count() === 0)
    } finally server.stop(0)
  }

  test("tick-level retry: two failures then success, 5-min delays observed") {
    val delays = scala.collection.mutable.ListBuffer.empty[Long]
    var attempts = 0
    val out = graft.streaming.RetryRunner.withRetries(
      retries = 2, delayMs = 5 * 60 * 1000L, sleep = delays += _) { a =>
      attempts += 1
      if (a < 2) throw new RuntimeException(s"fetch failed (attempt $a)")
      "ok"
    }
    assert(out === "ok")
    assert(attempts === 3) // 1 initial + retries: 2 (Final_app.py:18)
    assert(delays.toList === List(300000L, 300000L)) // 5-min retry_delay
  }

  test("a third consecutive failure is terminal, like the DAG's task") {
    var attempts = 0
    val e = intercept[RuntimeException] {
      graft.streaming.RetryRunner.withRetries(
        retries = 2, delayMs = 1L, sleep = _ => ()) { _ =>
        attempts += 1
        throw new RuntimeException("still down")
      }
    }
    assert(attempts === 3 && e.getMessage === "still down")
  }

  test("fetchAndLand is idempotent and atomic: re-land skips, no tmp residue") {
    val cfg = freshCfg(None)
    val first = DailyApp.fetchAndLand(cfg)
    assert(first.toSet === Set("20220819", "20220820", "20100106"))
    val second = DailyApp.fetchAndLand(cfg)
    assert(second.isEmpty)
    val listed = Files.list(cfg.landing).toArray.map(_.toString)
    assert(listed.length === 3 && listed.forall(!_.contains(".tmp")))
  }
}
