package graft

import org.apache.spark.sql.functions._
import graft.operators.DataPrep
import graft.sources.Tables

class DataPrepSpec extends SparkTestBase {
  private val d = sf()

  test("train split is a stable partition with roughly 80/10/10 mass") {
    val s = DataPrep.trainSplit(spark, d)
    val total = Tables.documents(spark, d).count()
    assert(s.count() === total)
    val frac = s.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / total).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
    // growth stability: a document's split is a pure function of its id
    val twice = DataPrep.trainSplit(spark, d)
      .join(DataPrep.trainSplit(spark, d).withColumnRenamed("split", "s2"), "doc_id")
      .filter(col("split") =!= col("s2")).count()
    assert(twice === 0)
  }

  test("stratified sample takes exactly k per stratum") {
    val k = 5
    val bad = DataPrep.stratifiedSample(spark, d, k)
      .groupBy(col("lang")).count().filter(col("count") =!= k).count()
    assert(bad === 0)
  }

  test("sequence packing: per-shard packs are contiguous and budget-aligned") {
    val p = DataPrep.packSequences(spark, d, budget = 512)
      .orderBy("source", "doc_id").collect()
    // within each source shard, tokens_before is the running sum of
    // everything earlier in the shard and pack ids are non-decreasing
    p.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("tokens_before") === cum)
        assert(r.getAs[Long]("pack_id") === cum / 512)
        cum += r.getAs[Int]("n_tokens")
      }
    }
  }

  test("weighted sample is deterministic, sized k, and weight really biases selection") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s1 = graft.operators.DataPrep.weightedSample(spark, sf())
    assert(s1.count() === 50)
    assert(canon(s1) === canon(graft.operators.DataPrep.weightedSample(spark, sf())))
    // mechanism check with real weight contrast: 100 docs at weight 20
    // vs 100 at weight 1 — the heavy class must dominate the sample
    // (deterministic: the md5 u-draws are fixed by the doc_ids)
    val synth = (0L until 200L).map(i => (i, if (i < 100) "heavy" else "light"))
      .toDF("doc_id", "lang")
    val sample = graft.operators.DataPrep.weightedSampleFrom(
      synth, when(col("lang") === "heavy", 20.0).otherwise(1.0), 50)
    val heavy = sample.filter(col("lang") === "heavy").count()
    assert(heavy >= 40, s"only $heavy/50 heavy docs sampled at 20x weight")
  }

  test("leakage-safe split keeps every near-dup component in one split") {
    import org.apache.spark.sql.functions._
    val split = graft.operators.DataPrep.leakageSafeSplit(spark, sf())
    // the guard itself: one split per component, no exceptions
    val mixed = split.groupBy(col("component_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.count() === 0, "a near-dup cluster was split across train/val/test")
    // and in particular every candidate PAIR co-locates
    val pairs = graft.operators.Dedup.minhashPairs(spark, sf())
    val bySplit = split.select(col("doc_id"), col("split"))
    val crossSplit = pairs
      .join(bySplit.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(bySplit.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(crossSplit.count() === 0, "near-dup pair straddles a split boundary")
    // still a full partition of the corpus
    assert(split.count() ===
      graft.sources.Tables.documents(spark, sf()).count())
  }
}
