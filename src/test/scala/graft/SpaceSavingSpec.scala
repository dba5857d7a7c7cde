package graft

import org.apache.spark.sql.functions._
import graft.functions.SpaceSaving.space_saving
import graft.functions.TextFunctions.wsTokens
import graft.operators.TextAnalysis
import graft.sources.Tables

/** The space-saving sketch's load-bearing property is the
  * no-false-negative guarantee — every item with true frequency > N/k
  * appears among the ≤k candidates — because the heavy-hitters pipeline
  * derives its EXACTNESS from it (candidates ⊇ heavy set, exact recount,
  * exact threshold). Checked here across capacities against brute-force
  * counts, including a deliberately tiny k where eviction churns hard.
  */
class SpaceSavingSpec extends SparkTestBase {

  private def toks = Tables.documents(spark, sf())
    .select(explode(wsTokens(col("text"))).as("token"))

  test("candidates always cover the exact heavy-hitter set, at any capacity") {
    val total = toks.count()
    for (k <- Seq(8, 32, 256)) {
      val cand = toks
        .agg(space_saving(col("token"), k).as("hh"))
        .select(explode(col("hh")).as("token"))
        .collect().map(_.getString(0)).toSet
      assert(cand.size <= k, s"sketch k=$k returned ${cand.size} candidates")
      val heavy = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .filter(col("c") * k > total)
        .collect().map(_.getString(0)).toSet
      assert(heavy.subsetOf(cand),
        s"k=$k lost heavy hitters: ${(heavy -- cand).take(5)}")
    }
  }

  test("heavy-hitters pipeline equals the brute-force exact answer") {
    val total = toks.count()
    val brute = canon(
      toks.groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * 512 > total))
    assert(brute.nonEmpty, "fixture should have heavy tokens at k=512")
    assert(canon(TextAnalysis.heavyHitters(spark, sf())) === brute)
  }

  test("sketch survives partial/merge across a forced repartition") {
    // many small partitions force serialize/merge of partial buffers
    val total = toks.count()
    val cand = toks.repartition(16)
      .agg(space_saving(col("token"), 64).as("hh"))
      .select(explode(col("hh")).as("token"))
      .collect().map(_.getString(0)).toSet
    val heavy = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .filter(col("c") * 64 > total)
      .collect().map(_.getString(0)).toSet
    assert(heavy.subsetOf(cand))
  }
}
