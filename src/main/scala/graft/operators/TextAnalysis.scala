package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table: per-document
  * statistics, token counting, language identification, quality scoring,
  * and content fingerprinting (SURVEY.md §2.I4 + the driver's north-star
  * LLM-pipeline surface).
  *
  * Everything here is a narrow per-row map over the corpus (higher-order
  * functions, no UDFs, no shuffles) followed by at most one aggregation —
  * the shape that scans 100 TB at I/O speed.
  */
object TextAnalysis {

  /** Per-document statistics: sizes, token counts, vocabulary size,
    * longest token, and a consistency check of the stored n_chars.
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    // token stats via the single-pass custom expression: the HOF form
    // (3 splits + distinct + transform/max per row, all interpreted)
    // costs ~1 ms/document — interpreter-bound, not scan-bound.
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("len_text"),
      (length(col("text")) === col("n_chars")).as("n_chars_ok"),
      graft.functions.HashExpressions.token_stats(col("text")).as("ts"))
      .select(col("doc_id"), col("len_text"), col("n_chars_ok"),
        col("ts.n_tokens").as("n_tokens"),
        col("ts.n_uniq_tokens").as("n_uniq_tokens"),
        col("ts.max_token_len").as("max_token_len"))

  /** Token counting three ways: whitespace tokens, BPE-ish regex tokens
    * (letter runs ∣ digit runs ∣ single punctuation), and non-space
    * character count — the denominators a tokenizer-budget pipeline needs.
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("ws_tokens"),
      patternCount(col("text"), "[a-z]+|[0-9]+|[^a-z0-9\\s]").as("re_tokens"),
      length(regexp_replace(normText(col("text")), "\\s", "")).as("n_chars_nospace"))

  private val langMarkers: Seq[(String, String)] = Seq(
    "zh" -> "[\\x{4e00}-\\x{9fff}]",
    "en" -> "\\b(the|and|of|to|is)\\b",
    "es" -> "\\b(el|la|los|de|que)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|les|des|et|est)\\b")

  /** Language ID by marker n-gram/stopword counts with a fixed precedence
    * (zh > en > es > de > fr) on ties; zero evidence → 'und'. A heuristic,
    * not a model — but a deterministic, engine-portable one.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir).select(
      col("doc_id") +: col("lang").as("claimed_lang") +:
        langMarkers.map { case (l, p) => patternCount(col("text"), p).as(s"${l}_n") }: _*)
    val m = greatest(langMarkers.map { case (l, _) => col(s"${l}_n") }: _*)
    val pred = langMarkers.foldLeft(when(m === 0, lit("und"))) {
      case (acc, (l, _)) => acc.when(col(s"${l}_n") === m, lit(l))
    }
    scored.withColumn("pred_lang", pred)
      .withColumn("lang_match", col("pred_lang") === col("claimed_lang"))
  }

  /** Quality scoring with integer-exact arithmetic (ratio thresholds are
    * expressed as cross-multiplications so no engine ever divides):
    * +1 each for: ≥10 tokens, ≥50 chars, punctuation ≤5% of chars,
    * contains a common-English stopword.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val nTokens = size(wsTokens(col("text")))
    val nChars = length(col("text"))
    val punct = nChars - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val stop = patternCount(col("text"), "\\b(the|a|of|and|to)\\b")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      nTokens.as("n_tokens"), nChars.as("n_chars"),
      punct.as("n_punct"), stop.as("n_stopwords"),
      ((nTokens >= 10).cast("int") + (nChars >= 50).cast("int")
        + (punct * 20 <= nChars).cast("int") + (stop > 0).cast("int"))
        .as("quality_score"))
  }

  /** Regex row-generation (UDTF-shaped): every digit-run in every
    * document becomes a row — `regexp_extract_all` + `posexplode`, the
    * generator pattern for mining structured fragments out of text. Runs
    * over text ∥ source so the generator is exercised on real matches
    * (the fixture's text column is digit-free; source is not).
    */
  def extractNumbers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(
          concat(col("text"), lit(" "), col("source")), lit("[0-9]+"), lit(0)))
          .as(Seq("match_idx", "number_str")))
      .withColumn("number_val", col("number_str").cast("bigint"))

  /** Per-column data-quality audit of the documents table in long
    * format: null counts, distinct counts, and min/max rendered as
    * strings — the profiling pass a pipeline runs before trusting a new
    * drop of data. One aggregation job for all columns.
    */
  def qualityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct, min_str, max_str)"))
  }

  /** TF-IDF: the most characteristic token per document. Long-format
    * shape — explode tokens, tf per (doc, token), df per token, score =
    * tf · ln(N/df) — two hash aggregations and a broadcast-size df side.
    * Ties break on the token string so ranking is deterministic.
    */
  def tfidfTop(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // Corpus size N stays inside the plan: a broadcast 1-row aggregate
    // joined in (BNLJ over 1 row), so the whole query is one job — no
    // separate driver-side count() scan.
    val n = broadcast(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    val toks = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(n)
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("token").as("top_token"),
        col("tf").as("top_tf"), col("df").as("top_df"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Content fingerprints: order-insensitive md5-prefix fingerprint plus
    * an order-sensitive rolling hash over the token stream.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp64"),
      rollingHash(col("text")).as("rolling_fp"))

  /** Vocabulary build — the tokenizer-training step: corpus-wide token
    * frequencies, a minimum-frequency cut, and contiguous ids for the
    * top-K by (count desc, token). The frequency table and the top-K
    * prune are fully distributed (hash aggregate + TakeOrdered); only
    * the id-assigning row_number runs single-partition, and only over
    * the K surviving rows — bounded by the vocab size, not the corpus,
    * so the shape holds at 100 TB.
    */
  def vocab(spark: SparkSession, sfDir: String, minCount: Int = 5, k: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, sfDir)
      .select(explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("token"))
      .limit(k)
    counts.withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
      .select(col("token_id"), col("token"), col("n"))
  }

  /** The corpus-curation terminal: exact dedup ∧ quality gate ∧
    * language verification composed into one pass, reported per
    * (source, lang) stratum — raw count, post-dedup canonical count,
    * kept count, and the kept token budget. This is the end-of-pipeline
    * accounting a training-data run emits before writing shards.
    *
    * One scan, one (content-hash) window exchange for canonicality, one
    * final aggregation — the per-document metrics are the same
    * codegen'd expressions the standalone q_quality_score / q_lang_id
    * queries use, so every filter stays scan-speed at 100 TB.
    */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTokens = size(wsTokens(col("text")))
    val nChars = length(col("text"))
    val punct = nChars - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val stop = patternCount(col("text"), "\\b(the|a|of|and|to)\\b")
    val quality = (nTokens >= 10).cast("int") + (nChars >= 50).cast("int") +
      (punct * 20 <= nChars).cast("int") + (stop > 0).cast("int")
    val m = greatest(langMarkers.map { case (l, p) => patternCount(col("text"), p) }: _*)
    val pred = langMarkers.foldLeft(when(m === 0, lit("und"))) {
      case (acc, (l, p)) => acc.when(patternCount(col("text"), p) === m, lit(l))
    }
    val canon = col("doc_id") === min(col("doc_id"))
      .over(Window.partitionBy(md5(col("text"))))
    val kept = col("canon") && col("q") >= 3 && col("pred_lang") === col("lang")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        nTokens.as("n_tok"), quality.as("q"), pred.as("pred_lang"),
        canon.as("canon"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("canon").cast("int")).as("n_canonical"),
        sum(kept.cast("int")).as("n_kept"),
        sum(when(kept, col("n_tok")).otherwise(0)).cast("bigint").as("kept_tokens"))
  }
}
