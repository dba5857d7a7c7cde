package graft

import graft.operators.TextAnalysis

/** Pins the BPE trainer's two load-bearing behaviors on a corpus small
  * enough to hand-compute: greedy LEFT-TO-RIGHT non-overlapping merge
  * application (the `aaaa` + merge `(a,a)` → `[aa, aa]` case the
  * gaps-and-islands parity trick exists for), and deterministic
  * (count desc, pair asc) tie-breaking.
  */
class BpeSpec extends SparkTestBase {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("greedy non-overlapping merge: aaaa collapses to two aa, not three") {
    // corpus: "aaaa" x2. Pairs round 1: (a,a) weighted 3 per word x 2 = 6.
    // Greedy left-to-right application: [aa, aa] — so round 2 sees ONE
    // (aa,aa) pair per word, weight 2. An overlapping (or right-greedy)
    // application would leave [aa, a, ...] shapes and a different count.
    val m = TextAnalysis.bpeMergesFrom(spark, docs("aaaa", "aaaa"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 6L)))
    assert(m(1) == ((2, "aa", "aa", 2L)))
  }

  test("odd run keeps the leftover singleton: aaa -> [aa, a]") {
    // "aaa": round 1 pair (a,a) weight 2. After merge: [aa, a] — round 2
    // must see pair (aa, a) weight 1, proving pos1's candidate was
    // consumed by pos0's merge and pos2 survived as a singleton.
    val m = TextAnalysis.bpeMergesFrom(spark, docs("aaa"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 2L)))
    assert(m(1) == ((2, "aa", "a", 1L)))
  }

  test("ties break on pair lexicographic order, not plan order") {
    // "ab" and "cd", equal frequency: pairs (a,b) and (c,d) both weight
    // 2 — the (count desc, pair asc) rule must pick (a,b) first on any
    // engine, any partitioning.
    val m = TextAnalysis.bpeMergesFrom(spark, docs("ab cd", "ab cd"), 1)
      .collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "b")
  }

  test("merges are learned on word frequency, punctuation splits words") {
    // "er" dominates via the word-frequency weighting even though it
    // appears in distinct surface forms; non-letters never form pairs.
    val m = TextAnalysis.bpeMergesFrom(spark, docs("er, er! er? xy"), 1)
      .collect()
    assert(m(0).getString(1) == "e" && m(0).getString(2) == "r"
      && m(0).getLong(3) == 3L)
  }
}
