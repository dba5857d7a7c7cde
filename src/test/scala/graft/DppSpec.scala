package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning over a dt-partitioned landing layout (the
  * q_sink_partitioned shape at warehouse scale): a join-driven scan of
  * a partitioned fact must read ONLY the partitions the filtered
  * dimension selects — at 100 TB the difference between a 2-month read
  * and a full-table scan. The partitioned layout exists FOR this; the
  * spec pins the plan marker (`dynamicpruningexpression` in the fact
  * scan's PartitionFilters) so a regression to full scans turns red
  * instead of silently costing 50× IO.
  */
class DppSpec extends SparkTestBase {

  test("join-driven scan prunes dt partitions via dynamicpruningexpression") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dpp_orders_sf0_001"
    if (!new java.io.File(dir, "_SUCCESS").exists())
      graft.sources.Tables.orders(spark, sf())
        .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val fact = spark.read.parquet(dir)
    val months = fact.select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(months.length > 3, "need several partitions for pruning to matter")
    val target = months.take(2)

    // dimension with a selective predicate — the join-driven prune
    // source. Two traps pinned here: it must be a REAL datasource
    // relation (a local relation's filter is constant-folded away by
    // ConvertToLocalRelation), and the predicate must be one Spark's
    // isLikelySelective recognizes — attribute-vs-literal comparison,
    // not a bare boolean column.
    val dimDir = s"${sys.props("java.io.tmpdir")}/graft_dpp_dim_sf0_001"
    months.toDF("dt")
      .withColumn("grp",
        when(col("dt").isin(target: _*), lit("target")).otherwise(lit("other")))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("grp") === "target"), Seq("dt"))
      .groupBy(col("dt")).agg(count(lit(1)).as("n"))
    val rows = joined.collect()

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan is NOT dynamically pruned — full-table read at scale:\n$plan")
    // correctness of the pruned read: exactly the 2 selected months, with
    // the same counts an unpruned filter produces
    assert(rows.map(_.getString(0)).sorted.toSeq == target)
    val expected = fact.filter(col("dt").isin(target: _*))
      .groupBy(col("dt")).agg(count(lit(1)).as("n"))
    assert(canon(joined) == canon(expected))
  }
}
