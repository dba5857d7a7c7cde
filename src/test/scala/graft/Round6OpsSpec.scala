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

  test("q16 NOT IN plans the null-aware anti join, not a loop join") {
    val plan = Analytics.q16SupplierCount(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    // Spark marks the null-aware variant on the broadcast hash join;
    // a BroadcastNestedLoopJoin here would be the quadratic fallback
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"NOT IN must stay a hash join on this non-null key:\n$plan")
  }

  test("q21 plans the quantifiers as one grouped pass, no self-joins") {
    // round-12 rewrite: EXISTS/NOT-EXISTS other (late) supplier is a
    // per-order cardinality aggregate — the plan must carry NO semi or
    // anti self-join and at most ONE mid-plan hash exchange (the
    // orderkey shuffle both aggregation levels reuse); the supplier
    // probe broadcasts
    val plan = Analytics.q21WaitingSuppliers(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      s"the quantifiers must be aggregated, not self-joined:\n$plan")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"no product joins:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // at broadcast scale: (orderkey,suppkey) + orderkey + the
    // |suppliers|-sized s_name rollup = 3. At SMJ scale the join's
    // orderkey partitioning satisfies BOTH aggregate clusterings
    // (subset-hash co-location), so the aggregates add none. Either
    // way: never a corpus re-exchange per quantifier like the old
    // semi+anti form's five.
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$plan")
  }

  test("domainCap kept-branch pre-limits per map task (WindowGroupLimit)") {
    val plan = DataPrep.domainCap(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=cap filter should trigger the partial group limit:\n$plan")
  }

  test("domainCap accounting: kept + dropped = total, kept <= cap") {
    val rows = DataPrep.domainCap(spark, sf(), cap = 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1))
      assert(r.getLong(2) <= 20)
    }
  }

  test("length buckets: every doc in the smallest holding bucket, fill <= 1") {
    val rows = DataPrep.lengthBuckets(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getLong(0); val nDocs = r.getLong(1)
      val total = r.getLong(2); val pad = r.getLong(3)
      assert(pad == bucket * nDocs - total && pad >= 0)
      // smallest-holding-bucket: average fill must exceed the next
      // bucket down (if everyone fit in bucket/2, they'd be there)
      if (bucket > 16) assert(total > (bucket / 2 - 1) * (nDocs - 1),
        s"bucket $bucket holds docs that fit a smaller bucket")
    }
  }

  test("dupNgrams: bp identity holds and sharing is symmetric") {
    val rows = graft.operators.Dedup.dupNgrams(spark, sf()).collect()
    assert(rows.nonEmpty)
    var anyDup = 0L
    rows.foreach { r =>
      val n = r.getLong(1); val dup = r.getLong(2); val bp = r.getLong(3)
      assert(dup >= 0 && dup <= n && n > 0)
      assert(bp == dup * 10000 / n)
      anyDup += dup
    }
    // sharing is symmetric: a duplicated shingle is duplicated in at
    // least TWO documents, so the global dup count can never be 1
    assert(anyDup != 1L)
    // the fixture's near-dup corpus guarantees SOME boilerplate overlap
    assert(anyDup > 0L, "expected at least one cross-document shingle")
  }
}
