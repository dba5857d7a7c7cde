package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators over the `documents` corpus — the core of a
  * training-data pipeline. Five escalating strategies:
  *
  *   1. exact        — md5(text) hash groups
  *   2. near         — md5 of aggressively-normalized text
  *   3. minhash LSH  — shingle → 16-row minhash signature → 4-band
  *                     bucket keys → bucket join for candidate pairs
  *   4. simhash      — 64-bit sign-aggregated token hash, prefix buckets
  *   5. n-gram Jaccard — exact set overlap on candidate pairs
  *
  * Scale shape: 1/2/4 are map + one hash-shuffle on a short key. 3 is the
  * canonical 100 TB near-dup design: signatures and band keys are computed
  * per-row (narrow), and only (band_id, band_key, doc_id) tuples — a few
  * dozen bytes per document, not the text — flow into the bucket shuffle.
  * 5 runs only on candidate pairs (here: same-source blocking; at scale:
  * the minhash buckets), never all-pairs.
  */
object Dedup {

  /** I1 — exact dedup groups: canonical (minimum) doc_id per md5(text). */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** I2a — near-dup groups by normalized key: lowercase, strip
    * non-alphanumerics, collapse whitespace. Catches punctuation/casing
    * variants that exact hashing misses.
    */
  def near(spark: SparkSession, sfDir: String): DataFrame = {
    val key = md5(regexp_replace(
      regexp_replace(normText(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " "))
    Tables.documents(spark, sfDir)
      .groupBy(key.as("norm_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
  }

  /** Per-document minhash band keys (the narrow half of LSH): doc_id ×
    * 4 rows, each `(band_id, band_key)`. This is the *entire* per-document
    * state the shuffle ever sees.
    */
  def minhashBands(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(graft.functions.HashExpressions.minhash_band_keys(col("text")))
          .as(Seq("band_id", "band_key")))

  /** I2b — minhash LSH candidate pairs: documents sharing ≥1 band bucket.
    * The join is on (band_id, band_key) — collision buckets only, never
    * all-pairs.
    */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val b = minhashBands(spark, sfDir)
    val a = b.as("a"); val c = b.as("b")
    a.join(c, col("a.band_id") === col("b.band_id")
        && col("a.band_key") === col("b.band_key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** I2c — simhash: 64-bit signature string + 16-bit prefix bucket.
    * Near-dups differ in O(1) bits; bucketing the prefix (or rotations,
    * at scale) turns Hamming search into a hash join.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.HashExpressions.simhash64(col("text")).as("simhash"))
      .withColumn("bucket16", substring(col("simhash"), 1, 16))

  /** I2d — n-gram Jaccard on blocked candidate pairs (same `source`):
    * exact distinct-shingle overlap, with the ≥0.8 threshold expressed as
    * a cross-multiplication (no division anywhere).
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    // Repartition on the blocking key BEFORE the self-join: the exchange
    // materializes the shingle arrays once per document. Without it,
    // Catalyst collapses the projection into the join filter and rebuilds
    // both sides' shingle sets for every candidate pair — O(pairs·len)
    // instead of O(docs·len).
    def sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        array_distinct(shingles3(col("text"))).as("sh"))
      .repartition(col("source"))
    val joined = sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("n_inter"),
        (size(col("a.sh")) + size(col("b.sh"))).as("sz_sum"))
    joined
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("sz_sum") - col("n_inter")).as("n_union"),
        (col("n_inter") * 10 >= (col("sz_sum") - col("n_inter")) * 8).as("near_dup"))
      .filter(col("n_inter") > 0)
  }
}
