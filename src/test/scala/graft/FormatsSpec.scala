package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Formats}

class FormatsSpec extends SparkTestBase {
  private val d = sf()

  test("orc and json round-trips agree with the parquet-derived summary") {
    val fromParquet = Formats.orcRoundtrip(spark, d) // reads back what it wrote
    val viaJson = Formats.jsonRoundtrip(spark, d)
    assert(canon(fromParquet) === canon(viaJson))
    assert(fromParquet.count() > 0)
  }

  test("scd2 history: intervals chain per customer, change rows only") {
    val h = Formats.scd2PriorityHistory(spark, d)
    // every non-final interval closes exactly where the next one opens
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("custkey")).orderBy(col("effective_from"))
    val bad = h.withColumn("next_from", lead(col("effective_from"), 1).over(w))
      .filter(col("effective_to").isNotNull && col("effective_to") =!= col("next_from"))
    assert(bad.count() === 0)
    // compaction: no two consecutive rows share a priority
    val rep = h.withColumn("next_p", lead(col("priority"), 1).over(w))
      .filter(col("next_p").isNotNull && col("next_p") === col("priority"))
    assert(rep.count() === 0)
    // exactly one open (null effective_to) row per customer with history
    assert(h.filter(col("effective_to").isNull).groupBy(col("custkey"))
      .count().filter(col("count") > 1).count() === 0)
  }

  test("merge upsert: actions partition the key space correctly") {
    val m = Formats.mergeUpsert(spark, d)
    // one row per user, total users preserved
    val users = graft.sources.Tables.events(spark, d)
      .select(col("user_id")).distinct().count()
    assert(m.count() === users)
    assert(m.select(col("user_id")).distinct().count() === users)
    // every action value is one of the three
    assert(m.filter(!col("merge_action").isin("insert", "carry", "update")).count() === 0)
    assert(m.filter(col("merge_action") === "update").count() > 0)
  }

  test("native session_window matches gaps-and-islands on the events table") {
    val native = Formats.sessionWindowNative(spark, d)
      .select("user_id", "session_start", "n_events", "session_value")
    val islands = Analytics.eventsSessionized(spark, d)
      .select("user_id", "session_start", "n_events", "session_value")
    assert(canon(native) === canon(islands))
  }

  test("range join via bucket decomposition equals the direct inequality join") {
    val decomposed = Analytics.activeSessionsPerHour(spark, d)
    // reference: the naive inequality join (fine at spec scale)
    val gapUs = 30L * 60 * 1000000
    val hourUs = 3600L * 1000000
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = graft.sources.Tables.events(spark, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("ns", (col("prev_us").isNull || col("us") - col("prev_us") > gapUs).cast("int"))
      .withColumn("sid", sum(col("ns")).over(byUser.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg((min(col("us")) / hourUs).cast("long").as("h_lo"),
        (max(col("us")) / hourUs).cast("long").as("h_hi"))
    val bounds = sessions.agg(min(col("h_lo")).as("lo"), max(col("h_hi")).as("hi"))
    val grid = bounds.select(explode(sequence(col("lo"), col("hi"))).as("hour_idx"))
    val naive = grid.join(sessions,
        col("h_lo") <= col("hour_idx") && col("hour_idx") <= col("h_hi"), "left")
      .groupBy(col("hour_idx"))
      .agg(count(col("h_lo")).as("n_active"))
      .select(date_format(expr(s"timestamp_micros(hour_idx * $hourUs)"),
        "yyyy-MM-dd HH:00:00").as("hour"), col("n_active"))
    assert(canon(decomposed) === canon(naive))
    // and the decomposed plan must not contain the nested loop the
    // naive one needs
    decomposed.collect()
    val plan = decomposed.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("unpivot melts the wide row and pivoting it back restores the flagship") {
    val long = graft.operators.TwsePipeline.unpivotLong(spark)
    val wide = graft.operators.TwsePipeline.flagship(spark)
    assert(long.count() === graft.model.Schemas.investmentCols.tail.length)
    val restored = long.groupBy(col("dt"))
      .pivot(col("series"), graft.model.Schemas.investmentCols.tail)
      .agg(first(col("amount")))
      .select(wide.columns.map(col).toIndexedSeq: _*)
    assert(canon(restored) === canon(wide))
  }

  test("vocab build: contiguous ids, count-ordered, min-frequency enforced") {
    import graft.operators.TextAnalysis
    val v = TextAnalysis.vocab(spark, d).collect()
    assert(v.nonEmpty)
    assert(v.map(_.getInt(0)).toSeq === v.indices.toSeq) // ids 0..n-1 in order
    val counts = v.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse, "ids must follow count desc")
    assert(counts.forall(_ >= 5))
  }

  test("int8 quantization: values span [0,127], dims preserved, monotone") {
    val q = graft.operators.Similarity.quantize(spark, d)
    assert(q.count() > 0)
    assert(q.filter(col("q_min") < 0 || col("q_max") > 127).count() === 0)
    // a non-constant vector always hits both rails after min-max scaling
    assert(q.filter(col("emb_max") > col("emb_min") &&
      (col("q_min") =!= 0 || col("q_max") =!= 127)).count() === 0)
    assert(q.select(countDistinct(col("n_dims"))).head.getLong(0) === 1)
  }

  test("curation terminal agrees with the standalone gate queries") {
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, d)
    val c = TextAnalysis.curate(spark, d)
    val t = c.agg(sum(col("n_docs")), sum(col("n_canonical")), sum(col("n_kept"))).head()
    assert(t.getLong(0) === docs.count())
    assert(t.getLong(1) === docs.select(md5(col("text"))).distinct().count())
    // recompose kept from the standalone oracle-checked queries
    val canonical = docs.groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val kept = TextAnalysis.qualityScore(spark, d)
      .filter(col("quality_score") >= 3).select("doc_id")
      .join(TextAnalysis.langId(spark, d)
        .filter(col("lang_match")).select("doc_id"), "doc_id")
      .join(canonical, "doc_id")
    assert(t.getLong(2) === kept.count())
    assert(t.getLong(2) > 0, "curation must keep a non-trivial corpus")
  }

  test("session_window boundary is inclusive: exactly gap-after still merges") {
    // Empirically pinned: Spark's session_window window is [ts, ts+gap]
    // for merging purposes — an event exactly `gap` after the previous
    // one joins the SAME session. The gaps-and-islands twin must
    // therefore split only on diff > gap (not >=), and so must the
    // DuckDB oracle.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val gapMs = 30 * 60 * 1000
    def sessions(ts: Long*): Long = ts.map(o => (1L, new java.sql.Timestamp(t0.getTime + o)))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().count()
    assert(sessions(0L, gapMs.toLong) === 1, "exactly +gap must merge")
    assert(sessions(0L, gapMs + 1L) === 2, "one ms past the gap must split")
  }

  test("dynamic-gap session merging: per-event gap, running-max semantics, inclusive boundary") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def sessions(rows: (Long, String)*): Long = rows
      .map { case (o, k) => (1L, new java.sql.Timestamp(t0.getTime + o), k) }
      .toDF("user_id", "ts", "event_type")
      .groupBy(col("user_id"), session_window(col("ts"),
        when(col("event_type") === "view", lit("30 minutes"))
          .otherwise(lit("15 minutes"))))
      .count().count()
    val min = 60 * 1000L
    // the gap is the CURRENT event's: a view holds 30 min, others 15
    assert(sessions((0L, "view"), (30 * min, "click")) === 1,
      "exactly at the view's 30-min end must merge (inclusive)")
    assert(sessions((0L, "click"), (30 * min, "click")) === 2,
      "a click only holds 15 min - same offset must split")
    // running-max: the EARLIER view (30 min) outlasts the later click
    // (15 min); the third event merges through the view's interval even
    // though it is >15 min past the click
    assert(sessions((0L, "view"), (5 * min, "click"), (25 * min, "click")) === 1,
      "an earlier long-gap event must keep the session open (running max, not lag)")
  }

  test("codec round-trip: both layouts lossless, zstd footprint measured") {
    import java.io.File
    import org.apache.spark.sql.functions._
    val both = Formats.codecRoundtrip(spark, sf())
    val z = canon(both.filter(col("codec") === "zstd").drop("codec"))
    val s = canon(both.filter(col("codec") === "snappy").drop("codec"))
    assert(z === s, "zstd and snappy reads must summarize identically")

    def bytes(c: String): Long = {
      val d = new File(s"${sys.props("java.io.tmpdir")}/graft_codec_${c}_sf0.001")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (zb, sb) = (bytes("zstd"), bytes("snappy"))
    assert(zb > 0 && sb > 0)
    info(f"zstd/snappy footprint ratio: ${zb.toDouble / sb}%.3f ($zb vs $sb bytes)")
  }

  test("expectations report passes on the clean fixture and counts violations exactly") {
    import org.apache.spark.sql.functions._
    val rep = graft.operators.Quality.expectations(spark, sf())
    assert(rep.count() === 4)
    assert(rep.filter(!col("pass")).count() === 0,
      "generator-produced orders must satisfy every expectation")
    // constraint math is real: a corrupted row trips the right checks
    val o = graft.sources.Tables.orders(spark, sf()).limit(1)
      .select(lit(-1L).as("o_orderkey"), col("o_custkey"),
        lit("X").as("o_orderstatus"), lit(-5.0).as("o_totalprice"),
        lit(null).cast("timestamp").as("o_orderdate"), col("o_orderpriority"))
    val dirty = graft.sources.Tables.orders(spark, sf()).unionByName(o)
      .unionByName(o) // duplicate bad key too
    dirty.createOrReplaceTempView("graft_exp_dirty")
    val agg = dirty.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)),
      (count(lit(1)) - countDistinct(col("o_orderkey")))).head()
    assert(agg.getLong(0) === 2 && agg.getLong(1) === 2
      && agg.getLong(2) === 2 && agg.getLong(3) === 1)
  }
}
