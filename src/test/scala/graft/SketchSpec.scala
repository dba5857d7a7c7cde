package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions._
import graft.operators.Dedup

/** Bloom-filter sketch surface + the bloom-prefiltered decontamination
  * path: no false negatives ever, exact end-to-end parity with the
  * broadcast-set implementation, and the prefilter must actually prune
  * (otherwise it's just overhead in front of the verify join).
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom has no false negatives and prunes most non-members") {
    val members = (0 until 1000).map(i => s"member_$i").toDF("s")
    val bloom = buildBloom(members, col("s"), expectedItems = 1000L, numBits = 1L << 16)

    val missedMembers = members.filter(!bloom_might_contain(bloom, col("s"))).count()
    assert(missedMembers === 0, "bloom false negative — must be impossible")

    val nonMembers = (0 until 10000).map(i => s"other_$i").toDF("s")
    val passed = nonMembers.filter(bloom_might_contain(bloom, col("s"))).count()
    // 2^16 bits / 1000 items ≈ 65 bits/key → FP rate well under 5%
    assert(passed < 500, s"bloom passed $passed of 10000 non-members — not pruning")
  }

  test("decontaminateBloom is exactly decontaminate (false positives verified away)") {
    val exact = canon(Dedup.decontaminate(spark, sf()))
    val bloomed = canon(Dedup.decontaminateBloom(spark, sf()))
    assert(bloomed === exact)
  }

  test("incremental dedup equals the boundary-crossing slice of full-batch pairs") {
    val bound = 450L
    val inc = Dedup.dedupIncremental(spark, sf(), bound)
    // from-scratch truth: all candidate pairs with one side old, one new
    val pairs = Dedup.minhashPairs(spark, sf())
    val crossing = pairs
      .filter((col("doc_a") < bound && col("doc_b") >= bound)
        || (col("doc_b") < bound && col("doc_a") >= bound))
      .select(
        when(col("doc_a") >= bound, col("doc_a")).otherwise(col("doc_b")).as("doc_id"),
        when(col("doc_a") < bound, col("doc_a")).otherwise(col("doc_b")).as("corpus_doc"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_candidates"), min(col("corpus_doc")).as("first_match"))
    val incHits = inc.filter(col("is_duplicate"))
      .select(col("doc_id"), col("n_dup_candidates"), col("first_match"))
    assert(canon(incHits) === canon(crossing))
    assert(inc.count() > 0)
  }

  test("buildBloom fails loudly on an empty build side (never a silent filter-everything NULL)") {
    val empty = Seq.empty[String].toDF("s")
    val e = intercept[IllegalArgumentException] {
      buildBloom(empty, col("s"), expectedItems = 10L, numBits = 1L << 10)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("band index is a managed appendable table: ingest N+1 probes ingest N's append") {
    val d = sf()
    val bound = 400L
    val table = Dedup.ensureBandIndex(spark, d, bound)
    val bands = Dedup.minhashBands(spark, d)
    val batch1 = bands.filter(col("doc_id") >= bound && col("doc_id") < 450)
    val batch2 = bands.filter(col("doc_id") >= 450)
    val batch1Docs = batch1.select(col("doc_id")).distinct().count()
    assert(batch1Docs > 0)

    // ingest N: batch1 probes the seed index, then appends its own bands
    val hitsPre = Dedup.probeBandIndex(spark, table, batch2)
      .agg(coalesce(sum(col("n_dup_candidates")), lit(0L))).head().getLong(0)
    Dedup.appendToBandIndex(spark, table, batch1)

    // ingest N+1: batch1's bands are now IN the index — every batch1 doc
    // self-hits when re-probed, proving the append is visible
    val selfProbe = Dedup.probeBandIndex(spark, table, batch1)
    assert(selfProbe.count() == batch1Docs)
    assert(selfProbe.filter(col("n_dup_candidates") >= 1).count() == batch1Docs)

    // and batch2's candidate pool can only GROW with the index
    val hitsPost = Dedup.probeBandIndex(spark, table, batch2)
      .agg(coalesce(sum(col("n_dup_candidates")), lit(0L))).head().getLong(0)
    assert(hitsPost >= hitsPre)

    // the seed fingerprint ignores appended (≥ bound) rows: ensure must
    // REUSE the appended table, not clobber it with a rebuild
    assert(Dedup.ensureBandIndex(spark, d, bound) == table)
    assert(spark.table(table).filter(col("doc_id") >= bound).count() > 0,
      "ensureBandIndex rebuilt the table and lost the appended batch")
  }

  test("decontaminateBloom flags contaminated docs at sf0.001") {
    val out = Dedup.decontaminateBloom(spark, sf())
    assert(out.count() > 0)
    assert(out.filter(col("contaminated")).count() > 0,
      "fixture corpus shares shingles with the benchmark slice; expected hits")
  }
}
