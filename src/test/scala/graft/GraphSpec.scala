package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank invariants the value-level oracle can't express: mass
  * accounting under floor division, the isolated-node base rank, and
  * determinism across runs (integer fixed-point has no float path to
  * drift through).
  */
class GraphSpec extends SparkTestBase {

  private val Scale = 1000000000000L

  test("pagerank never creates mass and every rank holds at least the teleport base") {
    val pr = Graph.pagerank(spark, sf())
    val n = pr.count()
    val total = pr.agg(sum(col("pagerank_f"))).head.getLong(0)
    // floor division and evaporating dangling (isolated-node) mass can
    // only leak mass DOWN from the injected Scale, never create it
    assert(total <= Scale, s"rank mass $total exceeds the injected $Scale")
    val base = (15L * Scale) / (100L * n)
    assert(pr.filter(col("pagerank_f") < base).count() === 0,
      "every node receives at least the teleport term")
    // connected docs accumulate strictly more than base
    assert(pr.filter(col("degree") > 0 && col("pagerank_f") > base).count() > 0)
    assert(n === graft.sources.Tables.documents(spark, sf()).count())
  }

  test("isolated documents hold exactly the teleport base") {
    val pr = Graph.pagerank(spark, sf())
    val n = pr.count()
    val base = (15L * Scale) / (100L * n)
    val isolated = pr.filter(col("degree") === 0)
    assert(isolated.count() > 0, "fixture corpus should have isolated docs")
    assert(isolated.filter(col("pagerank_f") =!= base).count() === 0)
  }

  test("pagerank is deterministic across executions") {
    assert(canon(Graph.pagerank(spark, sf())) === canon(Graph.pagerank(spark, sf())))
  }
}
