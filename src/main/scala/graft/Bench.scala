package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus,3]") // G3: retries=2 → 3 task attempts
      .config("spark.task.maxFailures", "3")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 81 distinct query plans thrash the default 100-entry generated-
      // class cache; recompiles (~100ms+) then land on later queries
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // 162 query executions accumulate thousands of broadcast/RDD refs;
      // blocking ContextCleaner storms otherwise stall whichever
      // multi-job query is running when GC triggers them
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: one untimed warm pass over every query
    // (session, codegen classes, file indexes, JIT), then the timed pass.
    // Single-JVM cold runs otherwise land ~10 s of one-time costs on
    // arbitrary queries run-to-run. All side-effecting queries are
    // idempotent (overwrite modes / unique stream dirs), so the double
    // run is safe.
    // Noop sink, not count(): count() lets Catalyst prune every
    // per-row projection (a scalar-function query would time only the
    // scan), while the noop writer evaluates all output columns and
    // discards them — the honest cost of producing the result.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // Drain warm-pass garbage before timing starts — otherwise the GC
    // debt of the whole warm pass lands on whichever timed query runs
    // first (observed as 4× run-to-run variance on q1_agg).
    System.gc()
    Thread.sleep(500)
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch {
        case e: Throwable => // keep benching, but never hide a failure
          System.err.println(s"[bench] $name failed: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's log tail truncates long lines (53/117 timings lost in
    // round 4) — persist the complete per-query map alongside it.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), line + "\n")
    spark.stop()
  }
}
