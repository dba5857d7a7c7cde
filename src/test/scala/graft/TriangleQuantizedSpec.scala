package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}
import graft.functions.VectorExpressions.{cosine_similarity, quantized_cosine}

/** Invariants for the round-6 additions the value oracle can't express:
  * the degree-oriented triangle count agrees with an independent
  * id-oriented brute-force enumeration (the orientations count the same
  * triangles, by different wedge owners), and the quantized cosine sits
  * within 2⁻²⁰-level error of the full-double cosine while being exact
  * integer arithmetic underneath.
  */
class TriangleQuantizedSpec extends SparkTestBase {

  test("degree-oriented triangles match an id-oriented brute force") {
    val pairs = Dedup.minhashPairs(spark, sf())
      .select(col("doc_a"), col("doc_b")).cache()
    // independent enumeration: canonical a<b<c via three id-ordered joins
    val e = pairs
    val brute = e.as("ab").join(e.as("bc"), col("ab.doc_b") === col("bc.doc_a"))
      .join(e.as("ac"),
        col("ac.doc_a") === col("ab.doc_a") && col("ac.doc_b") === col("bc.doc_b"))
      .select(col("ab.doc_a").as("a"), col("ab.doc_b").as("b"), col("bc.doc_b").as("c"))
    val bruteCount = brute.count()
    val perNode = Graph.triangles(spark, sf())
    val total = perNode.agg(sum(col("n_triangles"))).head.getLong(0)
    // every triangle contributes participation 3
    assert(total === 3 * bruteCount,
      s"per-node participation sum $total != 3 x $bruteCount")
    assert(bruteCount > 0, "fixture corpus should contain triangles")
    pairs.unpersist()
  }

  test("quantized cosine tracks the double cosine within quantization error") {
    val e = graft.sources.Tables.embeddings(spark, sf())
    val self = e.select(
      quantized_cosine(col("embedding"), col("embedding")).as("q"))
    // self-similarity is 1 up to sqrt(x)^2 rounding
    assert(self.filter(abs(col("q") - 1.0) > 1e-12).count() === 0)
    val x = e.orderBy(col("vec_id")).limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = x.as("a").crossJoin(x.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        cosine_similarity(col("a.embedding"), col("b.embedding")).as("full"),
        quantized_cosine(col("a.embedding"), col("b.embedding")).as("quant"))
    // floor quantization at 2^20 on ~unit-norm 64-dim vectors: abs error
    // bounded well under 1e-4
    assert(pairs.filter(abs(col("full") - col("quant")) > 1e-4).count() === 0)
  }

  test("quantized cosine is bit-deterministic across executions") {
    val e = graft.sources.Tables.embeddings(spark, sf()).limit(100)
    def run() = canon(e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        quantized_cosine(col("a.embedding"), col("b.embedding")).as("s")))
    assert(run() === run())
  }
}
