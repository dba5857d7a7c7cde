package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, DataPrep, Graph}

/** Invariants for the round-6 additions that the value-level oracle
  * can't state directly: CMS sketch laws on controlled data, mixture
  * quota accounting, BFS frontier monotonicity, and the recursive
  * CTE's plan shape (UnionLoop, not a driver loop).
  */
class SketchAuditSpec extends SparkTestBase {

  test("count-min sketch: merge equals single build, estimates never undercount") {
    import org.apache.spark.util.sketch.CountMinSketch
    val whole = CountMinSketch.create(0.001, 0.9999, 42)
    val a = CountMinSketch.create(0.001, 0.9999, 42)
    val b = CountMinSketch.create(0.001, 0.9999, 42)
    val data = (1L to 500L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k))
    data.foreach { k =>
      whole.add(k)
      (if (k % 2 == 0) a else b).add(k)
    }
    a.mergeInPlace(b)
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, n) =>
      assert(a.estimateCount(k) === whole.estimateCount(k),
        s"merged vs whole differ for key $k")
      assert(whole.estimateCount(k) >= n, s"undercount for key $k")
    }
  }

  test("cms audit query: all verdicts true, watchlist fully covered") {
    val row = Analytics.cmsPointCheck(spark, sf()).head()
    val nKeys = row.getAs[Long]("n_keys")
    assert(nKeys > 0)
    assert(row.getAs[Long]("n_merge_equal") === nKeys)
    assert(row.getAs[Long]("n_est_ge_exact") === nKeys)
  }

  test("mixture sample honors integer quotas and never exceeds availability") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val avail = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wts = avail.keys.map(s => s -> (1L + s.drop(3).toLong % 3)).toMap
    val tw = wts.values.sum
    val out = DataPrep.mixtureSample(spark, sf(), budget = 200)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    out.foreach { case (s, n) =>
      val quota = 200L * wts(s) / tw
      assert(n === math.min(quota, avail(s)),
        s"source $s kept $n, expected min(quota=$quota, avail=${avail(s)})")
    }
  }

  test("reach BFS: hop-0 pairs = seed count, frontier counts are sane") {
    val res = Graph.reachBfs(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_pairs")).toMap
    val seeds = graft.sources.Tables.documents(spark, sf())
      .filter(col("doc_id") % 20 === 0).count()
    assert(res(0L) === seeds, "every seed reaches itself at hop 0")
    // min-hop sets at successive hops are disjoint; no hop beyond the cap
    assert(res.keys.max <= 3)
    assert(res.values.forall(_ > 0))
  }

  test("reach BFS plans as an engine-managed UnionLoop, not a driver loop") {
    val plan = Graph.reachBfs(spark, sf())
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"expected recursive UnionLoop in plan:\n${plan.take(500)}")
  }
}
