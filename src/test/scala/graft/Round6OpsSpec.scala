package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, DataPrep, TextAnalysis}

/** Pins for the round-6 session-3 operators — the properties the DuckDB
  * oracle can't express: plan shapes, coverage invariants, and registry
  * idempotence.
  */
class Round6OpsSpec extends SparkTestBase {

  test("chunkStride covers every token exactly; overlap = chunk - stride") {
    val chunk = 64; val stride = 48
    val chunks = DataPrep.chunkStride(spark, sf(), chunk, stride)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tok_chunk")).collect()
      .groupBy(_.getLong(0)).values

    chunks.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      // chunk ids are contiguous from 0, starts are exact multiples
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i && r.getInt(2) == i * stride)
      }
      // every token position is covered: chunk i reaches past the next
      // start (overlap chunk-stride) or the document end
      val covered = sorted.map(r => (r.getInt(2), r.getInt(2) + r.getInt(3)))
      covered.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 > s2,
          "consecutive chunks must overlap — a gap loses boundary n-grams")
        case _ => ()
      }
      // the last chunk ends exactly at the document's token count
      val n = covered.last._2
      assert(covered.last._1 < n && n - covered.last._1 <= chunk)
    }
  }

  test("q4 plans the correlated EXISTS as one left-semi hash join") {
    val plan = Analytics.q4OrderPriority(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected a left-semi join, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"the date residual must ride the equi join, not force a loop join:\n$plan")
  }

  test("sql function registration is idempotent and survives reuse") {
    val a = canon(TextAnalysis.sqlFunctionRegistry(spark, sf()))
    val b = canon(TextAnalysis.sqlFunctionRegistry(spark, sf())) // re-register
    assert(a == b && a.nonEmpty)
  }

  test("linearScore keep decision is exactly the sign of the score") {
    val rows = TextAnalysis.linearScore(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) > 0L))
    }
  }
}
