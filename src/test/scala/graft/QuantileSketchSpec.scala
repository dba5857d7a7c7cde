package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch.quantile_sketch
import graft.operators.Analytics

/** The deterministic MRL/KLL quantile-sketch aggregate: exactness below
  * capacity, rank-bounded error above it, and partition-layout
  * independence of the GUARANTEE (not the bitwise estimate — compaction
  * depends on merge order by design; the rank band is what's invariant).
  */
class QuantileSketchSpec extends SparkTestBase {

  test("below capacity the sketch IS exact: ladder never compacts") {
    import spark.implicits._
    // 0..999 with k=1024 → all items at level 0, weight 1 ⇒ the walk
    // returns the exact ceil-rank order statistics
    val est = (0L until 1000L).toDF("v").repartition(7)
      .agg(quantile_sketch(col("v")).as("q"))
      .head.getSeq[Long](0)
    assert(est === Seq(249L, 499L, 749L))
  }

  test("above capacity the rank error stays inside the analytic band") {
    import spark.implicits._
    val n = 200000L
    // adversarial-ish order: values interleaved mod 17, many partitions
    val est = spark.range(n)
      .select(((col("id") * 17) % n).as("v")).repartition(13)
      .agg(quantile_sketch(col("v")).as("q"))
      .head.getSeq[Long](0)
    // worst-case rank error n·levels/k ≈ 200000·8/1024 ≈ 1.6k ranks;
    // assert the 5% audit band with room to spare
    Seq(0.25, 0.5, 0.75).zip(est).foreach { case (q, e) =>
      val rank = e.toDouble / n // value v has exact rank v+1 here
      assert(math.abs(rank - q) < 0.05, s"p$q estimate $e rank $rank")
    }
  }

  test("the audit query verdicts hold at sf0.001") {
    val out = Analytics.quantileSketchAudit(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("p25_ok") && r.getAs[Boolean]("p50_ok")
        && r.getAs[Boolean]("p75_ok"), s"audit failed for $r")
    }
  }
}
