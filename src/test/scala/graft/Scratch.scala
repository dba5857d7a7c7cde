package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev driver: `sbt "Test/runMain graft.Scratch <op> [sfDir]"`.
  * Times individual operators and prints plans — forked JVM, so it
  * avoids the sbt-console REPL/classloader clash with Spark 4.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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
            println(f"$name%-24s cart=$cart bnlj=$bnlj exch=$ex scans=$scans sorts=$sorts")
          } catch { case e: Throwable =>
            println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
          }
        }
      case q =>
        time(q) { SparkEntry.queries(q)(spark, d).count() }
    }
    spark.stop()
  }
}
