package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, TextAnalysis}

/** Pins for the round-7 operators — the properties the DuckDB oracle
  * can't express: dominance semantics, reassembly invariants, generator
  * parity with the HOF formulation, and plan shapes.
  */
class Round7OpsSpec extends SparkTestBase {

  test("skyline rows are mutually non-dominating and complete") {
    val parts = graft.sources.Tables.part(spark, sf())
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val expected = parts.filter(p => !parts.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = Analytics.skyline(spark, sf())
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"skyline mismatch: missing=${expected -- got} extra=${got -- expected}")
  }

  test("lineDedup reassembles untouched docs verbatim and only drops corpus-frequent lines") {
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"),
        lower(trim(col("text"))).as("norm")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Dedup.lineDedup(spark, sf()).collect()
    assert(out.length == docs.size, "every document must surface")
    out.foreach { r =>
      val (id, nLines, nKept, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nKept <= nLines)
      if (nKept == nLines)
        assert(clean == docs(id),
          s"doc $id had no boilerplate but was not reassembled verbatim")
      else // cleaned text is a subsequence of the original line structure
        assert(clean.isEmpty || docs(id).contains(clean.split(" ").head))
    }
    // the corpus-frequent lines actually get dropped somewhere
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "fixture contains repeated lines; at least one doc must shrink")
  }

  test("LinesGenerator output equals the HOF segmentation and plans as Generate") {
    val df = TextAnalysis.udtfLines(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected a Generate node:\n$plan")
    val hof = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, size(toks) - 1, 10),
            |  s -> array_join(slice(toks, s + 1, 10), ' '))""".stripMargin))
          .as(Seq("line_idx", "line")))
    assert(canon(df) == canon(hof))
  }

  test("oovRate: n_oov <= n_tokens, ppm bounds, and vocab tokens are never OOV") {
    val rows = TextAnalysis.oovRate(spark, sf()).collect()
    rows.foreach { r =>
      val (n, oov, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(oov <= n && ppm >= 0 && ppm <= 1000000)
      assert(ppm == 1000000L * oov / n)
    }
  }

  test("streaming minhash dedup equals the batch first-wins LSH rule") {
    val bands = Dedup.minhashBands(spark, sf())
    val a = bands.as("a"); val b = bands.as("b")
    val dropped = a.join(b,
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).distinct()
    val expected = graft.sources.Tables.documents(spark, sf())
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"))
    val got = graft.streaming.DocsStreaming.streamDedupMinhash(spark, sf())
    assert(canon(got) == canon(expected))
  }

  test("csvMalformed quarantines exactly the ragged rows, idempotently") {
    val out1 = canon(graft.operators.Formats.csvMalformed(spark))
    val out2 = canon(graft.operators.Formats.csvMalformed(spark))
    assert(out1 == out2, "re-reads must not re-stage or duplicate")
    val rows = graft.operators.Formats.csvMalformed(spark).collect()
    assert(rows.length == 5)
    assert(rows.count(_.getBoolean(3)) == 3)
    rows.filter(_.getBoolean(3)).foreach(r =>
      assert(r.getString(4).nonEmpty, "quarantined rows carry the raw line"))
    rows.filterNot(_.getBoolean(3)).foreach(r =>
      assert(r.getString(4).isEmpty))
  }

  test("bitmap distinct merges partials exactly and fails loudly out of domain") {
    import spark.implicits._
    // 40 partitions of a skewed id stream force real partial merges
    val ids = (0L until 5000L).flatMap(i => Seq(i % 97, i % 89)).toDF("id")
      .repartition(40)
    val n = ids.agg(
      graft.functions.BitmapDistinct.bitmapDistinct(col("id"), 1 << 16)
        .as("n"))
      .head.getLong(0)
    assert(n == 97)
    val err = intercept[Exception] {
      Seq(1L << 30).toDF("id").agg(
        graft.functions.BitmapDistinct.bitmapDistinct(col("id"), 1 << 16))
        .head
    }
    // pin the DOMAIN failure specifically: any other exception class
    // (e.g. an analysis error) must not satisfy this test
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("outside bitmap domain")),
      s"expected the out-of-domain requirement failure, got: $err")
  }

  test("ANALYZE TABLE statistics reach the optimizer's cost model") {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      graft.sources.Tables.nation(spark, sf())
        .write.mode("overwrite").saveAsTable("graft_cbo_nation")
      spark.sql("ANALYZE TABLE graft_cbo_nation COMPUTE STATISTICS " +
        "FOR COLUMNS n_nationkey")
      val plan = spark.table("graft_cbo_nation")
        .queryExecution.optimizedPlan
      val stats = plan.stats
      assert(stats.rowCount.contains(BigInt(25)),
        s"ANALYZE row count must reach the cost model: $stats")
      val colStats = stats.attributeStats.toSeq
        .find(_._1.name == "n_nationkey").map(_._2)
      assert(colStats.exists(_.distinctCount.contains(BigInt(25))),
        s"column-level NDV must reach the cost model: $colStats")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cbo_nation")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("apportionment sums exactly to the budget with quotas off by at most one") {
    val rows = graft.operators.DataPrep.apportion(spark, sf(), budget = 9973L)
      .collect()
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == 9973L, s"largest-remainder must hit the budget: $total")
    val w = rows.map(r => (r.getAs[Long]("weight"), r.getAs[Long]("alloc")))
    val sumW = w.map(_._1).sum
    w.foreach { case (weight, alloc) =>
      val exact = 9973.0 * weight / sumW
      assert(math.abs(alloc - exact) < 1.0,
        s"each allocation stays within one slot of the exact share: $alloc vs $exact")
    }
  }

  test("deterministic shuffle deals shards balanced within one document") {
    val rows = graft.operators.DataPrep.dataShuffle(spark, sf()).collect()
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(rows.length == 8 && counts.max - counts.min <= 1,
      s"round-robin off the global rank must balance exactly: ${counts.toSeq}")
  }

  test("rendezvous removal moves exactly the removed worker's documents") {
    val rows = graft.operators.DataPrep.rendezvousAssign(spark, sf()).collect()
    assert(!rows.exists(_.getString(0) == "w0"), "w0 owns nothing after removal")
    val movedIn = rows.map(_.getAs[Long]("n_moved_in")).sum
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val total = graft.sources.Tables.documents(spark, sf()).count()
    assert(movedIn + kept == total)
    // every kept document's owner is unchanged — so the documents that
    // moved are exactly those w0 owned before (the HRW guarantee)
    assert(movedIn > 0, "fixture must exercise the movement path")
  }

  test("bootstrap replicate multiplicities are Poisson-shaped and deterministic") {
    val a = canon(graft.operators.DataPrep.bootstrapPoisson(spark, sf()))
    val b = canon(graft.operators.DataPrep.bootstrapPoisson(spark, sf()))
    assert(a == b, "identical draws on every run")
    val rows = graft.operators.DataPrep.bootstrapPoisson(spark, sf()).collect()
    rows.foreach { r =>
      val (n, drawn, zero) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_drawn"), r.getAs[Long]("n_zero"))
      // Poisson(1): E[drawn] = n, P(k=0) = 1/e — allow wide slack on
      // the 500-doc fixture, but catch a broken inverse-CDF outright
      assert(math.abs(drawn - n) < n / 2, s"mean multiplicity ~1: $drawn vs $n")
      assert(zero > n / 5 && zero < n / 2, s"zero fraction ~1/e: $zero of $n")
    }
  }

  test("time travel generations stay byte-stable once written") {
    val d1 = canon(graft.operators.Formats.timeTravel(spark, sf()))
    val d2 = canon(graft.operators.Formats.timeTravel(spark, sf()))
    assert(d1 == d2, "re-reads must not rewrite generations")
  }

  test("SQL-defined scalar UDF inlines into the plan (no UDF call node)") {
    val df = SparkEntry.queries("q_sql_udf")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("ScalaUDF"),
      s"SQL UDF must inline, not stay a black-box call:\n$plan")
    assert(canon(df).nonEmpty)
  }
}
