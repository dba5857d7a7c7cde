package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge.{column => expressionColumn, expression => expressionOf}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter sketch surface over Spark's built-in
  * `BloomFilterAggregate` / `BloomFilterMightContain` catalyst
  * expressions — the same machinery Catalyst injects for runtime
  * row-level join filtering, exposed here as explicit Column functions.
  *
  * The membership test is codegen'd (`BloomFilterMightContain.doGenCode`)
  * and the filter blob rides the plan as a binary literal, so a
  * 100 TB-side scan probes the sketch inside whole-stage codegen with no
  * UDF boundary and no broadcast-hash-set memory cost: a bloom of 10 M
  * keys at 8 bits/key is ~10 MB, where a broadcast string set of the
  * same keys is gigabytes.
  *
  * Both sides MUST hash identically: the aggregate stores
  * `xxhash64(item)` longs and the probe tests `xxhash64(item)` — these
  * wrappers apply the hash themselves so callers pass raw columns and
  * cannot mismatch.
  */
object SketchFunctions {

  /** Aggregate: build a bloom filter over `xxhash64(c)` across the
    * group. Returns the serialized filter (binary). Size the bits ~8-10×
    * the expected distinct count for ~2-1% false-positive rate.
    */
  def bloom_filter_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    expressionColumn(
      new BloomFilterAggregate(
        expressionOf(xxhash64(c)),
        expressionOf(lit(expectedItems)),
        expressionOf(lit(numBits))).toAggregateExpression())

  /** Predicate: might `c` be in the serialized bloom filter `bloomBits`?
    * No false negatives; false positives at the configured rate — pair
    * with an exact verify when exact semantics are required.
    */
  def bloom_might_contain(bloomBits: Array[Byte], c: Column): Column =
    expressionColumn(
      BloomFilterMightContain(
        expressionOf(lit(bloomBits)),
        expressionOf(xxhash64(c))))

  /** Driver-side build: collapse `df`'s single column into one bloom
    * blob. The input is expected to be small relative to the corpus the
    * blob will later prune (benchmark suites, blocklists); the collect
    * moves only the ~numBits/8-byte sketch, never the rows.
    */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val blob = df.select(bloom_filter_agg(c, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // BloomFilterAggregate yields NULL on an empty build side, and
    // bloom_might_contain(NULL, …) filters EVERY row — a decontamination
    // pass would silently report zero contamination. Fail loudly instead.
    require(blob != null,
      "buildBloom: build side is empty — refusing to return a NULL bloom " +
        "sketch (it would silently filter every probe row)")
    blob
  }
}
