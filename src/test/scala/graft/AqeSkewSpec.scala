package graft

import org.apache.spark.sql.functions._

/** Scale resilience: AQE's runtime skew-join handling must fire on the
  * hot-key shape the salted aggregate guards against — the runtime
  * complement to compile-time salting (Analytics `q_agg_salted`).
  */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the thresholds so the test-sized hot key counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // no broadcast escape hatch: force the shuffled join under test
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one pathological key (500k rows) among 100 near-empty keys — the
      // hot shuffle partition is ~100× the median
      val left = spark.range(500000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(5000).select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val right = spark.range(101).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = left.join(right, "k").groupBy(col("name"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getAs[Long]("n")).sum === 505000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-handled join in the final adaptive plan:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
