package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Multimodal}
import graft.streaming.EventsStreaming

class MediaStreamSpec extends SparkTestBase {

  private val d = sf()

  test("media payloads carry the right magic and full text bytes") {
    val m = Multimodal.metadata(spark, d)
    assert(m.filter(!col("kind").isin("image", "audio", "video")).count() === 0)
    // n_bytes = 4-byte header + utf-8 text length
    val bad = Multimodal.media(spark, d)
      .join(sources.Tables.documents(spark, d), "doc_id")
      .filter(length(col("payload")) =!= length(col("text").cast("binary")) + 4)
      .count()
    assert(bad === 0)
  }

  test("real PNG decode reproduces every generated pixel exactly") {
    val a = Multimodal.decode(spark, d, batchSize = 32).collect().sortBy(_.doc_id)
    val b = Multimodal.decode(spark, d, batchSize = 7).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq) // batch size must never change results
    // the payload really is PNG: signature bytes survive the writer
    val payload = Multimodal.pngMedia(spark, d).head().payload
    assert(payload.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    // the decoded sums equal the generator formula computed independently
    a.take(50).foreach { r =>
      val (w, h) = ((r.doc_id % 13 + 1).toInt, (r.doc_id % 11 + 2).toInt)
      assert(r.width === w && r.height === h && r.media_type === "png")
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield (r.doc_id * 31 + 7L * x + 13L * y) % 256).sum
      assert(r.pixel_sum === expect, s"doc ${r.doc_id}: codec mangled pixels")
    }
  }

  test("nearest-neighbor resize samples the real decoded raster") {
    val rs = Multimodal.resize(spark, d, maxDim = 8).collect().sortBy(_.doc_id)
    rs.take(50).foreach { r =>
      val longer = math.max(r.width, r.height)
      val tw = if (longer <= 8) r.width else math.max(1, r.width * 8 / longer)
      val th = if (longer <= 8) r.height else math.max(1, r.height * 8 / longer)
      assert(r.target_w === tw && r.target_h === th)
      val expect = (for (ty <- 0 until th; tx <- 0 until tw) yield {
        val sx = tx * r.width / tw; val sy = ty * r.height / th
        (r.doc_id * 31 + 7L * sx + 13L * sy) % 256
      }).sum
      assert(r.resized_sum === expect, s"doc ${r.doc_id}: resample mismatch")
    }
    // downscaling genuinely happened somewhere (w up to 13 > 8)
    assert(rs.exists(r => r.target_w < r.width || r.target_h < r.height))
  }

  test("metadata query never reads the payload-bearing text column wastefully") {
    val plan = Multimodal.metadata(spark, d).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // metadata needs doc_id/source/text (payload is derived); the point at
    // scale is that a stored binary table prunes to metadata columns —
    // here we assert the scan reads only what the derivation needs.
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"))
  }

  test("streaming daily window equals the batch aggregation") {
    val stream = EventsStreaming.dailyCounts(spark, d)
      .orderBy("day", "event_type").collect().map(_.toSeq)
    val batch = Analytics.eventsDaily(spark, d)
      .orderBy("day", "event_type").collect().map(_.toSeq)
    assert(stream.toSeq === batch.toSeq)
  }

  test("left-outer stream join emits unmatched views with nulls, equals batch left join") {
    import org.apache.spark.sql.functions._
    val stream = EventsStreaming.viewPurchaseLeftJoin(spark, d)
    // null-emission really happened: views with no purchase in the hour
    assert(stream.filter(col("purchase_id").isNull).count() > 0,
      "expected watermark-expired unmatched views with NULL purchase columns")
    val ev = graft.sources.Tables.events(spark, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val batch = v.join(p,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("view_ts")
          && col("purchase_ts") <= col("view_ts") + expr("interval 1 hour"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
    assert(canon(stream) === canon(batch))
  }

  test("stream-static cohort join equals the all-batch formulation") {
    val stream = EventsStreaming.cohortEnrichedCounts(spark, d)
      .orderBy("cohort", "event_type").collect().map(_.toSeq)
    val ev = graft.sources.Tables.events(spark, d)
    val dim = ev.groupBy(col("user_id"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("cohort"))
    val batch = ev.join(dim, "user_id")
      .groupBy(col("cohort"), col("event_type"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("cohort", "event_type").collect().map(_.toSeq)
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq)
  }

  test("streaming sessionization equals the batch gaps-and-islands form") {
    val stream = EventsStreaming.sessionize(spark, d)
      .select(col("user_id"), col("session_id"), col("n_events"))
      .orderBy("user_id", "session_id").collect().map(_.toSeq)
    val batch = Analytics.eventsSessionized(spark, d)
      .select(col("user_id"), col("session_id"), col("n_events"))
      .orderBy("user_id", "session_id").collect().map(_.toSeq)
    assert(stream.toSeq === batch.toSeq)
    // double-valued session sums agree to float tolerance
    val sv = EventsStreaming.sessionize(spark, d)
      .agg(sum(col("session_value"))).collect().head.getDouble(0)
    val bv = Analytics.eventsSessionized(spark, d)
      .agg(sum(col("session_value"))).collect().head.getDouble(0)
    assert(math.abs(sv - bv) < 1e-6)
  }

  test("sessions span micro-batch boundaries without re-emission or crash") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_two_batch_src")
    def writeFile(name: String,
        rows: Seq[(Long, Long, Long, String, Double, String)], mtime: Long): Unit = {
      import spark.implicits._
      val tmp = dir.resolve(name + "_build")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = graft.FsUtil.singleParquetPart(tmp)
      Files.move(part, dir.resolve(name))
      Files.setLastModifiedTime(dir.resolve(name), FileTime.fromMillis(mtime))
    }
    val min = 60L * 1000000000L // one minute in ns
    val base = 1600000000L * 1000000000L
    val t0 = System.currentTimeMillis()
    // user 7's session: two events in batch 1, a within-gap continuation
    // in batch 2, then a far-future sentinel that closes it. The pre-fix
    // code either crashed on the continuation (no open aggregate in
    // state) or double-emitted the batch-1 prefix.
    writeFile("a.parquet", Seq(
      (1L, base, 7L, "view", 1.0, null),
      (2L, base + 10 * min, 7L, "view", 2.0, null)), t0)
    writeFile("b.parquet", Seq(
      (3L, base + 20 * min, 7L, "view", 4.0, null),
      (-1L, base + 600 * min, 7L, "eos", 0.0, null)), t0 + 60000)
    val out = EventsStreaming.sessionizeDir(spark, dir.toString).collect()
    assert(out.length === 1, out.mkString("; "))
    val r = out.head
    assert(r.getAs[Long]("n_events") === 3)
    assert(r.getAs[Int]("session_id") === 1)
    assert(math.abs(r.getAs[Double]("session_value") - 7.0) < 1e-9)
  }
}
