package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Formats, Similarity}

/** Round-5 layout/serving operators:
  *   - z-order: the write-side property the profile query can't see —
  *     after repartitionByRange + sortWithinPartitions on the z-key,
  *     per-FILE z-ranges are disjoint, which is exactly what makes
  *     min/max stats prune multi-dimensional scans;
  *   - batch kNN join: per-query result parity with the single-query
  *     brute-force path, and the WindowGroupLimit partial top-k in the
  *     physical plan (the shuffle stays O(k·queries) per partition);
  *   - partial-agg merge: merged per-day partials == direct aggregate.
  */
class LayoutSpec extends SparkTestBase {

  test("zorder16 interleaves bits exactly") {
    import spark.implicits._
    // bit i of x -> 2i, bit i of y -> 2i+1: (x=1,y=0)->1, (x=0,y=1)->2,
    // (x=3,y=5) -> 1|2·1 + 4·1|8·0 + 16·0|32·1 = 0b100111 = 39
    val out = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Formats.zorder16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-ordered write produces disjoint per-file z-ranges") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val z = graft.sources.Tables.orders(spark, sf())
      .withColumn("zvalue", Formats.zorder16(col("o_orderkey"), col("o_custkey")))
    z.repartitionByRange(8, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
      .write.mode("overwrite").parquet(dir)
    // per input_file_name: the [min,max] z-intervals must not overlap
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zvalue")).as("lo"), max(col("zvalue")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(ranges.length > 1, "expected multiple files from 8-way range partitioning")
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"file z-ranges overlap: ${a} vs ${b} — layout would not prune")
      case _ =>
    }
  }

  test("knnJoin at query_id=0 matches the single-query brute-force top-k") {
    val knn = Similarity.knnJoin(spark, sf(), numQueries = 1, k = 5)
      .filter(col("query_id") === 0)
      .select(col("neighbor_id"), col("score"))
    // topK includes the query vector itself at rank 1 (score 1.0) —
    // knnJoin excludes self, so compare against topK minus vec 0
    val brute = Similarity.topK(spark, sf(), k = 6)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("score"))
    assert(canon(knn) === canon(brute))
  }

  test("knnJoin plan contains the partial WindowGroupLimit") {
    val plan = Similarity.knnJoin(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected partial top-k (WindowGroupLimit) before the exchange:\n$plan")
  }

  test("merged per-day partials equal the direct aggregate") {
    import graft.sources.Tables
    val direct = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
    val merged = Analytics.mergePartialAggs(spark, sf())
      .select(col("l_returnflag"), col("sum_qty"), col("n_rows"))
    assert(canon(merged) === canon(direct.select(col("l_returnflag"), col("sum_qty"), col("n_rows"))))
  }
}
