package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev driver: `sbt "Test/runMain graft.Scratch <op> [sfDir]"`.
  * Times individual operators and prints plans — forked JVM, so it
  * avoids the sbt-console REPL/classloader clash with Spark 4.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("graft.scratch.master", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.props.getOrElse("graft.scratch.shuffle", "4"))
      // plan-dump aid: -Dgraft.checkpoint.skip=true disables mid-plan
      // lineage truncation so `explain` shows the WHOLE operator plan
      // (see Checkpoints.SkipKey); harmless default otherwise
      .config(Checkpoints.SkipKey,
        sys.props.getOrElse(Checkpoints.SkipKey, "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"

    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val r = f
      println(f"TIME $n rows=$r ${(System.nanoTime - t0) / 1e9}%.2f s")
    }

    args.headOption.getOrElse("all") match {
      case "text" | "all" =>
        time("minhash_bands") { operators.Dedup.minhashBands(spark, d).count() }
        time("minhash_pairs") { operators.Dedup.minhashPairs(spark, d).count() }
        time("simhash") { operators.Dedup.simhash(spark, d).count() }
        time("ngram_jaccard") { operators.Dedup.ngramJaccard(spark, d).count() }
        time("dedup_exact") { operators.Dedup.exact(spark, d).count() }
        time("dedup_near") { operators.Dedup.near(spark, d).count() }
        time("text_stats") { operators.TextAnalysis.textStats(spark, d).count() }
        time("token_count") { operators.TextAnalysis.tokenCount(spark, d).count() }
        time("lang_id") { operators.TextAnalysis.langId(spark, d).count() }
        time("quality") { operators.TextAnalysis.qualityScore(spark, d).count() }
        time("fingerprints") { operators.TextAnalysis.fingerprints(spark, d).count() }
      case "explain" =>
        SparkEntry.queries(args(2))(spark, d).explain("formatted")
      case "final" => // post-execution adaptive plan (reuse is only visible here)
        val df = SparkEntry.queries(args(2))(spark, d)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      case "twsdebug" =>
        val df = graft.streaming.TwsStreaming.timerSessions(spark, d)
        println("rows=" + df.count())
        graft.streaming.EventsStreaming.lastProgressFor("graft_stream_twssess_")
          .foreach { pr =>
            println(s"batch=${pr.batchId} rows=${pr.numInputRows} " +
              s"wm=${pr.eventTime.get("watermark")} " +
              pr.stateOperators.map(so =>
                s"op=${so.operatorName} out=${so.numRowsUpdated} " +
                s"timers=${so.customMetrics}").mkString(" | "))
          }
      case "sql" => // ad-hoc SQL probe: Test/runMain graft.Scratch sql <sfDir> "<stmt>;;<stmt>"
        // (or @/path/to/file.sql to dodge shell quoting)
        val text = if (args(2).startsWith("@"))
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(args(2).drop(1))))
        else args(2)
        text.split(";;").foreach { stmt =>
          println(s"-- $stmt")
          spark.sql(stmt).show(20, truncate = false)
        }
      case "bitmapdebug" =>
        // decompose q_bitmap_distinct: which stage is superlinear?
        import org.apache.spark.sql.functions._
        val ev = sources.Tables.events(spark, d)
          .select(to_date(col("ts")).cast("string").as("day"),
            col("user_id"))
        val maxId = ev.agg(max(col("user_id"))).head().getLong(0)
        val capacity = java.lang.Long.highestOneBit(
          math.max(maxId * 2 + 1, 64L)).toInt * 2
        println(s"maxId=$maxId capacity=$capacity bits " +
          s"(${capacity / 8 / 1024} KiB/buffer)")
        time("scan_only") { ev.count() }
        time("count_distinct") {
          ev.groupBy(col("day"))
            .agg(countDistinct(col("user_id"))).count()
        }
        time("bitmap_fast_tia") {
          ev.groupBy(col("day"))
            .agg(graft.functions.BitmapDistinct
              .bitmapDistinctFast(col("user_id"), capacity)).count()
        }
        time("combined_tia_plus_distinct") {
          ev.groupBy(col("day"))
            .agg(graft.functions.BitmapDistinct
              .bitmapDistinctFast(col("user_id"), capacity),
              countDistinct(col("user_id"))).count()
        }
        val combined = ev.groupBy(col("day"))
          .agg(graft.functions.BitmapDistinct
            .bitmapDistinctFast(col("user_id"), capacity),
            countDistinct(col("user_id")))
        println(combined.queryExecution.executedPlan.toString.take(4000))

      case "ensdebug" =>
        // phase-by-phase profile of Dedup.containmentEnsemble (mirrors
        // its code path 1:1): where do the sf100 seconds go — the corpus
        // checkpoints, the probe join, the pair-count aggregation, or
        // the exact verification?
        import org.apache.spark.sql.functions._
        import graft.functions.TextFunctions._
        import graft.Checkpoints.TruncateOps
        val (maxDf, numProbes, minHits) = (100, 8, 2)
        val docsArr0 = sources.Tables.documents(spark, d)
          .select(col("doc_id"), shingleFps3(col("text")).as("ds"))
        var docsArr: org.apache.spark.sql.DataFrame = null
        time("p1_shingle_ckpt") { docsArr = docsArr0.truncateLineage(); docsArr.count() }
        var stopDf: org.apache.spark.sql.DataFrame = null
        time("p2_stop_df") {
          stopDf = docsArr.select(explode(col("ds")).as("fp"))
            .groupBy(col("fp")).agg(count(lit(1)).as("df"))
            .filter(col("df") > maxDf).select(col("fp")).truncateLineage()
          stopDf.count()
        }
        val stopArr = stopDf.agg(collect_list(col("fp")).as("stop_arr"))
        var kept: org.apache.spark.sql.DataFrame = null
        time("p3_kept_ckpt") {
          kept = docsArr.crossJoin(broadcast(stopArr))
            .select(col("doc_id"), array_except(col("ds"), col("stop_arr")).as("ks"))
            .truncateLineage()
          kept.count()
        }
        kept = kept.filter(size(col("ks")) > 0)
        time("p3b_postings_vol") {
          kept.agg(sum(size(col("ks")))).head.getLong(0)
        }
        val probes = (0 until numProbes).map { i =>
          array_min(transform(col("ks"),
            x => struct(md5(concat(lit(i + "|"), x.cast("string"))).as("h"),
              x.as("s"))))("s")
        }
        val qmins = kept.select(col("doc_id").as("qdoc"),
          size(col("ks")).as("sz_q"), explode(array(probes: _*)).as("fp"))
        val postings = kept.select(col("doc_id").as("pdoc"),
          size(col("ks")).as("sz_p"), explode(col("ks")).as("fp"))
        val hits = qmins.hint("shuffle_hash").join(postings, "fp")
          .filter(col("sz_q") < col("sz_p") ||
            (col("sz_q") === col("sz_p") && col("qdoc") < col("pdoc")))
        time("p4a_hit_rows") { hits.count() }
        val paircnt = hits.groupBy(col("qdoc"), col("pdoc"))
          .agg(count(lit(1)).as("hits"))
        time("p4b_distinct_pairs") { paircnt.count() }
        var cand: org.apache.spark.sql.DataFrame = null
        time("p4c_cand_ckpt") {
          cand = paircnt.filter(col("hits") >= minHits)
            .select(col("qdoc").as("doc_a"), col("pdoc").as("doc_b"))
            .truncateLineage()
          cand.count()
        }
        time("p5_verify") {
          val docsP = operators.Dedup.pruneToParticipants(spark, kept, cand)
          cand
            .join(docsP.select(col("doc_id").as("doc_a"), col("ks").as("ks_a"))
              .hint("shuffle_hash"), "doc_a")
            .join(docsP.select(col("doc_id").as("doc_b"), col("ks").as("ks_b"))
              .hint("shuffle_hash"), "doc_b")
            .withColumn("n_inter", size(array_intersect(col("ks_a"), col("ks_b"))))
            .filter(col("n_inter") * 10 >= size(col("ks_a")) * 9)
            .count()
        }

      case "paircount" =>
        time("minhash_pairs") { operators.Dedup.minhashPairs(spark, d).count() }
        time("calibration") {
          operators.Dedup.jaccardCalibration(spark, d).count()
        }

      case "sweep" =>
        // plan-shape audit: flag cartesians, count exchanges, check scans
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          if (name.startsWith("q_stream")) println(f"$name%-24s streaming (skipped)")
          else try {
            val plan = fn(spark, d).queryExecution.executedPlan.toString
            val cart = "CartesianProduct".r.findAllIn(plan).length
            val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
            val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
            val scans = "FileScan".r.findAllIn(plan).length
            val sorts = "Sort ".r.findAllIn(plan).length
            // gen counts Generate (explode) nodes: N>1 identical
            // generators in one executed plan = a recompute suspect
            // (the lmScore/winnowPairs round-15 signature)
            val gen = "Generate ".r.findAllIn(plan).length
            println(f"$name%-24s cart=$cart bnlj=$bnlj exch=$ex scans=$scans sorts=$sorts gen=$gen")
          } catch { case e: Throwable =>
            println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
          }
        }
      case "annsweep" =>
        // ANN recall-cost curve: run the REAL operators (topKIvfFrom /
        // topKLsh) over a sample of query vectors and measure recall@k
        // against brute-force ground truth, plus the fraction of the
        // corpus each setting actually scanned. Design evidence for the
        // "ANN survives 100 TB" claim — emits the PLANS.md table.
        import org.apache.spark.sql.functions._
        val emb = sources.Tables.embeddings(spark, d).cache()
        val n = emb.count()
        val k = 10
        val queryIds = emb.select("vec_id").orderBy("vec_id")
          .limit(40).collect().map(_.getLong(0)).filter(_ % 2 == 0).take(20)
        // label/bucket sizes for the fraction-scanned denominator
        val labelSizes = emb.groupBy("label").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        def swapTo0(qid: Long) = emb.withColumn("vec_id",
          when(col("vec_id") === qid, lit(0L))
            .when(col("vec_id") === 0L, lit(qid))
            .otherwise(col("vec_id")))
        def gt(qid: Long): Set[Long] =
          operators.Similarity.topKFrom(swapTo0(qid), k)
            .collect().map(_.getLong(0)).toSet
        val gts = queryIds.map(q => q -> gt(q)).toMap
        println(s"corpus n=$n, ${queryIds.length} queries, k=$k")
        println("| index | setting | mean recall@10 | mean frac scanned |")
        println("|---|---|---|---|")
        // the probe SET (not the labels that happen to appear in the
        // top-k rows) is what the scan pays for — recompute it exactly
        // as topKIvfFrom selects it
        def probeSet(qid: Long, nprobe: Int): Seq[Int] = {
          val e = swapTo0(qid)
          val ex = e.select(col("label"),
              posexplode(col("embedding")).as(Seq("pos", "vf")))
            .select(col("label"), col("pos"), col("vf").cast("double").as("v"))
          val cent = ex.groupBy(col("label"), col("pos"))
            .agg((sum(col("v")) / count(lit(1))).as("c"))
          val qv = e.filter(col("vec_id") === 0)
            .select(posexplode(col("embedding")).as(Seq("pos", "qf")))
            .select(col("pos"), col("qf").cast("double").as("qv"))
          cent.join(broadcast(qv), "pos")
            .groupBy(col("label"))
            .agg(sum(col("c") * col("qv")).as("dot"),
              sum(col("c") * col("c")).as("na"),
              sum(col("qv") * col("qv")).as("nb"))
            .select(col("label"),
              (col("dot") / (sqrt(col("na")) * sqrt(col("nb")))).as("csim"))
            .orderBy(col("csim").desc, col("label")).limit(nprobe)
            .collect().map(_.getInt(0)).toSeq
        }
        for (nprobe <- Seq(1, 2, 3, 5, 10)) {
          val (recalls, fracs) = queryIds.map { qid =>
            val rows = operators.Similarity
              .topKIvfFrom(swapTo0(qid), k, nprobe).collect()
            val ids = rows.map(_.getLong(0)).toSet
            val scanned = probeSet(qid, nprobe)
              .map(labelSizes(_)).sum.toDouble / n
            (gts(qid).count(ids).toDouble / k, scanned)
          }.unzip
          println(f"| IVF | nprobe=$nprobe | ${recalls.sum / recalls.length}%.3f " +
            f"| ${fracs.sum / fracs.length}%.4f |")
        }
        for (planes <- Seq(2, 3, 4, 5, 6)) {
          val bSizes = operators.Similarity.lshBucketsFrom(emb, planes)
            .groupBy("bucket").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val (recalls, fracs) = queryIds.map { qid =>
            val rows = operators.Similarity
              .topKLshFrom(swapTo0(qid), k, planes).collect()
            val ids = rows.map(_.getLong(0)).toSet
            val bucket = if (rows.nonEmpty) rows.head.getString(1) else ""
            val scanned = bSizes.getOrElse(bucket, 0L).toDouble / n
            (gts(qid).count(ids).toDouble / k, scanned)
          }.unzip
          println(f"| LSH | planes=$planes | ${recalls.sum / recalls.length}%.3f " +
            f"| ${fracs.sum / fracs.length}%.4f |")
        }
        // PQ-ADC: scans EVERY row but touches only m code-bytes per row
        // instead of d×4 float bytes — its cost axis is bytes, not rows,
        // so "frac" here is bytes-touched / raw-corpus-bytes (constant
        // in the codebook size; recall is what the codes buy).
        for (codes <- Seq(8, 16, 32)) {
          val recalls = queryIds.map { qid =>
            val ids = operators.Similarity
              .topKPqAdcFrom(swapTo0(qid), topK = k, m = 8, k = codes)
              .collect().map(_.getLong(0)).toSet
            gts(qid).count(ids).toDouble / k
          }
          val bytesFrac = 8.0 / (64 * 4)
          println(f"| PQ-ADC | m=8,codes=$codes " +
            f"| ${recalls.sum / recalls.length}%.3f | $bytesFrac%.4f (bytes) |")
        }
        // Composed IVF→PQ-ADC→exact-rerank (the production plan): ADC
        // code-bytes are only read inside the probed lists, raw floats
        // only for the rerank rows — bytes-touched =
        // probedRowsFrac × m/(4d) + rerank/n.
        for ((nprobe, rerank) <- Seq((1, 50), (2, 50), (3, 100))) {
          val (recalls, fracs) = queryIds.map { qid =>
            val e = swapTo0(qid)
            val (res, af, cent) = operators.Similarity
              .topKIvfPqFrom(e, k, nprobe = nprobe, rerank = rerank)
            val ids = res.collect().map(_.getLong(0)).toSet
            val sizes = af.groupBy("cid").count().collect()
              .map(r => r.getLong(0) -> r.getLong(1)).toMap
            val probed = operators.Similarity.ivfProbe(e, cent, nprobe)
              .collect().map(_.getLong(0))
            val rowsFrac = probed.map(sizes.getOrElse(_, 0L)).sum.toDouble / n
            val bytesFrac = rowsFrac * 8.0 / (64 * 4) + rerank.toDouble / n
            (gts(qid).count(ids).toDouble / k, bytesFrac)
          }.unzip
          println(f"| IVF+PQ+rerank | nprobe=$nprobe,rerank=$rerank " +
            f"| ${recalls.sum / recalls.length}%.3f " +
            f"| ${fracs.sum / fracs.length}%.4f (bytes) |")
        }
      case q =>
        time(q) { SparkEntry.queries(q)(spark, d).count() }
    }
    spark.stop()
  }
}
