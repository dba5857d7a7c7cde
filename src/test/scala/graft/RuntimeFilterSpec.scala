package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the engine-injected form of what
  * `decontaminateBloom` builds by hand: when a shuffle join has a
  * selective (filtered) creation side, `InjectRuntimeFilter` plants a
  * bloom filter built from the dim side's join keys as a predicate on
  * the FACT side's scan, so rows that cannot join are dropped before
  * the exchange. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~join-surviving fraction.
  *
  * The default size thresholds (10 MB creation side / 10 GB application
  * side) exist to keep tiny joins from paying sketch overhead; the spec
  * lowers them to prove the MECHANISM on test data. Values must be
  * identical with and without the filter — blooms have no false
  * negatives, so injected pruning can never change results.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joinDf = {
    val d = sf()
    // selective dim side: one priority slice of orders
    val dim = graft.sources.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val fact = graft.sources.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"))
    // disable broadcast so the join shuffles — the case runtime
    // filtering exists for (a broadcast join already prunes via DPP)
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
  }

  test("a selective shuffle join injects a bloom filter on the fact scan") {
    val (withFilter, n1) = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val df = joinDf
      (df.queryExecution.optimizedPlan.toString, df.head.getLong(0))
    }
    assert(withFilter.contains("might_contain"),
      s"expected an injected runtime bloom filter:\n$withFilter")

    val (noFilter, n2) = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      val df = joinDf
      (df.queryExecution.optimizedPlan.toString, df.head.getLong(0))
    }
    assert(!noFilter.contains("might_contain"))
    // no false negatives: pruned and unpruned plans agree exactly
    assert(n1 === n2 && n1 > 0)
  }
}
