package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.cosine_similarity
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkTestBase {
  private val d = sf()

  test("cosine of a vector with itself is 1.0") {
    val self = Tables.embeddings(spark, d)
      .select(cosine_similarity(col("embedding"), col("embedding")).as("s"))
      .agg(min(col("s")), max(col("s"))).collect().head
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k: query vector ranks itself first") {
    val top = Similarity.topK(spark, d, 5).collect()
    assert(top.head.getAs[Long]("vec_id") === 0L)
    assert(top.head.getAs[Double]("score") === 1.0)
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("cosine participates in whole-stage codegen") {
    val df = Tables.embeddings(spark, d)
      .crossJoin(broadcast(Tables.embeddings(spark, d).limit(1)
        .select(col("embedding").as("q"))))
      .select(cosine_similarity(col("embedding"), col("q")).as("s"))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen stage in the plan string; the
    // cosine projection must sit inside one (i.e. not fall back).
    assert("""\*\(\d+\) Project \[cosine_similarity""".r.findFirstIn(plan).isDefined, plan)
  }

  test("LSH buckets partition all vectors into 4-bit buckets") {
    val b = Similarity.lshBuckets(spark, d)
    assert(b.count() === Tables.embeddings(spark, d).count())
    val badBuckets = b.filter(!col("bucket").rlike("^[01]{4}$")).count()
    assert(badBuckets === 0)
  }

  test("LSH top-k returns only candidates from the query's bucket, led by the query") {
    val r = Similarity.topKLsh(spark, d).collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[Long]("vec_id") === 0L)
    assert(r.map(_.getAs[String]("bucket")).distinct.length === 1)
  }

  test("cosine handles mismatched vector lengths by the common prefix") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f, 5.0f), Seq(1.0f, 0.0f)))
      .toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b")).as("s"))
    // prefix [1,0]·[1,0] = 1 exactly (the trailing element is ignored)
    assert(df.collect().head.getDouble(0) === 1.0)
  }

  test("malformed payload bodies parse to null and fall out at the filter") {
    import spark.implicits._
    val bad = Seq("{not json", """{"stat": 5}""", "").toDF("body")
      .select(org.apache.spark.sql.functions.from_json(
        col("body"), graft.model.Schemas.twsePayload).as("p"))
      .select(col("p.*"))
      .filter(col("stat") === "OK")
    assert(bad.count() === 0) // no crash, no rows — the closed-day semantics
  }

  test("nearest pair per label: ≤1 row per label, scores in [-1, 1]") {
    val r = Similarity.nearestPairPerLabel(spark, d).collect()
    val labels = Tables.embeddings(spark, d).select(col("label")).distinct().count()
    // LSH-blocked: a label whose vectors never share a bucket yields no
    // pair (the price of adaptive-plane blocking staying linear in N) —
    // at most one winner per label, and most labels keep one.
    assert(r.length <= labels && r.length > 0)
    assert(r.map(_.get(r.head.fieldIndex("label"))).distinct.length === r.length)
    assert(r.forall { row =>
      val s = row.getAs[Double]("score")
      s >= -1.0 && s <= 1.0 && row.getAs[Long]("vec_a") < row.getAs[Long]("vec_b")
    })
  }

  private def recallAt(emb: org.apache.spark.sql.DataFrame, k: Int, nprobe: Int): Double = {
    val brute = Similarity.topKFrom(emb, k)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.topKIvfFrom(emb, k, nprobe)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    brute.intersect(ivf).size.toDouble / brute.size
  }

  test("IVF multi-probe: recall@10 ≥ 0.9 at nprobe=2 on clustered embeddings") {
    // IVF's operating regime: data with genuine coarse structure. Ten
    // well-separated clusters (seeded gaussian centers, sigma=0.05
    // noise); the query (vec_id 0) sits BETWEEN clusters 0 and 1, and its
    // ten true nearest neighbors are planted near it — five carrying
    // label 0, five label 1 — so the ground-truth top-k straddles the
    // partition boundary: the exact failure mode nprobe exists to fix.
    // One probe can only reach one side (recall ≤ 0.6); two probes must
    // recover ≥ 0.9.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    def member(c: Int, noise: Double): Array[Float] =
      unit(centers(c).map(_ + noise * rnd.nextGaussian()))
    val between = unit(centers(0).zip(centers(1)).map { case (a, b) => a + b })
    val planted = (1 to 10).map { j =>
      (500L + j, if (j <= 5) 0L else 1L,
        unit(between.map(_.toDouble + 0.01 * rnd.nextGaussian())))
    }
    val rows =
      ((0L, 0L, between) +: (1 to 500).map { i =>
        val c = (i - 1) % 10
        (i.toLong, c.toLong, member(c, 0.05))
      }) ++ planted
    val emb = rows.toDF("vec_id", "label", "embedding")
    val r1 = recallAt(emb, 10, 1)
    val r2 = recallAt(emb, 10, 2)
    assert(r2 >= 0.9, s"recall@10 at nprobe=2 was $r2")
    assert(r1 < r2, s"boundary query must under-recall at nprobe=1 ($r1 -> $r2)")
  }

  test("IVF recall on the fixture is monotone in nprobe and exact at full probe") {
    val emb = Tables.embeddings(spark, d)
    val labels = emb.select(col("label")).distinct().count().toInt
    val rs = Seq(1, 2, labels).map(np => recallAt(emb, 10, np))
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b }, rs.toString)
    assert(rs.last === 1.0) // nprobe = #partitions ⇒ exact search
  }
}
