package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.AsOf
import graft.plans.AsofJoinSupport

/** The custom AsofJoin Catalyst operator: agreement with the
  * compositional union+window construction (the oracle-checked one),
  * plan shape, outer-match semantics, and partition invariance.
  */
class AsofJoinSpec extends SparkTestBase {
  private val d = sf()


  test("native as-of join equals the union+window composition row-for-row") {
    val native = AsOf.purchaseToLastViewNative(spark, d)
    val composed = AsOf.purchaseToLastView(spark, d)
    assert(native.columns.toSeq === composed.columns.toSeq)
    assert(canon(native) === canon(composed))
    // non-vacuous: some purchases matched, and (if any user purchased
    // before ever viewing) unmatched rows carry nulls, not drops
    assert(native.filter(col("view_id").isNotNull).count() > 0)
  }

  test("as-of plan: AsofJoinExec with one exchange per side, no range explosion") {
    val df = AsOf.purchaseToLastViewNative(spark, d)
    df.collect() // finalize AQE
    // AQE toString repeats the pre-adaptive plan under "== Initial Plan ==";
    // count shapes in the final section only.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    val nExch = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nExch == 2, s"expected exactly 2 exchanges, got $nExch:\n$plan")
  }

  test("as-of semantics: backward inclusive match, tiebreak by id, outer nulls") {
    import spark.implicits._
    val quotes = Seq( // key, t, qid
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 20L, 3L), ("b", 5L, 4L))
      .toDF("k", "qt", "qid")
    val trades = Seq( // key, t, tid
      ("a", 9L, 100L),  // before any quote → null match
      ("a", 20L, 101L), // tie on t=20 → qid 3 (last under tiebreak)
      ("a", 25L, 102L), // after all → latest (qid 3)
      ("b", 5L, 103L),  // exact equality is inclusive → qid 4
      ("c", 1L, 104L))  // key with no quotes at all → null match
      .toDF("tk", "tt", "tid")
    val r = AsofJoinSupport.asofJoin(trades, quotes,
        leftKey = "tk", rightKey = "k",
        leftTime = "tt", rightTime = "qt",
        rightTiebreak = Seq("qid"))
      .select("tid", "qid").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(r === Map(100L -> -1L, 101L -> 3L, 102L -> 3L, 103L -> 4L, 104L -> -1L))
  }

  test("as-of edge cases: empty right side, all-later right side, empty left") {
    import spark.implicits._
    val left = Seq(("a", 10L, 1L), ("b", 20L, 2L)).toDF("lk", "lt", "lid")
    val emptyRight = Seq.empty[(String, Long, Long)].toDF("rk", "rt", "rid")
    val r1 = AsofJoinSupport.asofJoin(left, emptyRight, "lk", "rk", "lt", "rt")
      .select("lid", "rid").collect()
    assert(r1.length === 2 && r1.forall(_.isNullAt(1)), "empty right → all null matches")

    val laterRight = Seq(("a", 11L, 9L), ("b", 21L, 8L)).toDF("rk", "rt", "rid")
    val r2 = AsofJoinSupport.asofJoin(left, laterRight, "lk", "rk", "lt", "rt")
      .select("lid", "rid").collect()
    assert(r2.length === 2 && r2.forall(_.isNullAt(1)), "all-later right → all null matches")

    val emptyLeft = Seq.empty[(String, Long, Long)].toDF("lk", "lt", "lid")
    val r3 = AsofJoinSupport.asofJoin(emptyLeft, laterRight, "lk", "rk", "lt", "rt")
    assert(r3.count() === 0)
  }

  test("optimizer rule pushes left-side filters through AsofJoin to the scan") {
    // filter AFTER the as-of join on a left-side column: without the
    // rule it stalls above the custom node (Catalyst cannot see through
    // unknown operators) and the scan reads every user
    val df = AsOf.purchaseToLastViewNative(spark, d)
      .filter(col("user_id") <= 10)
    // logical proof: no Filter remains above the AsofJoin node...
    val optimized = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val stalled = optimized.collect {
      case LFilter(_, _: graft.plans.AsofJoin) => true
    }
    assert(stalled.isEmpty, s"filter stalled above AsofJoin:\n$optimized")
    // ...and physical proof: the predicate reached the parquet scans of
    // BOTH sides? No — only the LEFT side legally; assert the left scan
    // carries the pushed user_id filter.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // (the PushedFilters list is truncated in toString, so match the
    // predicate name without its literal)
    assert(plan.contains("LessThanOrEqual(user_id"), plan)
    // results equal the driver-side-filtered unoptimized formulation
    val viaPre = AsOf.purchaseToLastViewNative(spark, d)
      .collect().filter(_.getLong(1) <= 10)
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(df) === viaPre)
  }

  test("as-of join is partition-invariant (pre-scrambled inputs)") {
    import spark.implicits._
    val n = 500
    val right = (1 to n).map(i => (s"k${i % 7}", (i * 13 % 101).toLong, i.toLong))
      .toDF("k", "rt", "rid").repartition(11)
    val left = (1 to n).map(i => (s"k${i % 5}", (i * 7 % 97).toLong, (1000 + i).toLong))
      .toDF("lk", "lt", "lid").repartition(3)
    val viaJoin = left.join(right, col("lk") === col("k") && col("rt") <= col("lt"), "left")
      .groupBy("lid").agg(max(struct(col("rt"), col("rid"))).as("m"))
      .select(col("lid"), col("m.rid").as("rid"))
    val viaAsof = AsofJoinSupport.asofJoin(left, right,
        "lk", "k", "lt", "rt", Seq("rid"))
      .select("lid", "rid")
    assert(canon(viaAsof) === canon(viaJoin))
  }
}
