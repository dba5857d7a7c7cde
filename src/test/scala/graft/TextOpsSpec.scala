package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Invariants for the round-5 text operators: PII redaction exactness on
  * constructed rows, and bigram-LM score semantics at sf0.001 (the
  * value-level check is the DuckDB oracle; these pin the semantics the
  * oracle can't read — placeholders really replace the match, scores are
  * true log-probs).
  */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii replaces emails, urls, phones and counts matches") {
    val df = Seq(
      (1L, "write bob.smith@corp.io or alice@x.org today"),
      (2L, "see https://a.example/path?q=1 and http://b.example"),
      (3L, "call +1-555-0199 or +886-223-4455"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Int]("n_email") === 2)
    assert(out(2L).getAs[Int]("n_url") === 2)
    assert(out(3L).getAs[Int]("n_phone") === 2)
    assert(out(4L).getAs[Int]("n_email") === 0)
    assert(out(4L).getAs[Int]("n_url") === 0)
    assert(out(4L).getAs[Int]("n_phone") === 0)

    // the hash is of the fully-redacted text — placeholders in, PII out
    val expected = Map(
      1L -> "write [EMAIL] or [EMAIL] today",
      2L -> "see [URL] and [URL]",
      3L -> "call [PHONE] or [PHONE]",
      4L -> "nothing sensitive here")
    val hashes = expected.map { case (k, v) =>
      k -> spark.range(1).select(md5(lit(v))).head.getString(0)
    }
    expected.keys.foreach { k =>
      assert(out(k).getAs[String]("redacted_hash") === hashes(k), s"doc $k")
      assert(out(k).getAs[Long]("redacted_len") === expected(k).length.toLong)
    }
  }

  test("lm_score is a mean log-prob: non-positive, zero only for fully-predictable docs") {
    val out = TextAnalysis.lmScore(spark, sf())
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      if (n > 0) {
        val s = r.getAs[Double]("lm_score")
        assert(s <= 0.0, s"doc ${r.get(0)}: mean log-prob $s must be <= 0")
      } else assert(r.isNullAt(r.fieldIndex("lm_score")))
    }
    // corpus docs share a small vocab: scores must be informative, not
    // all zero (which would mean a degenerate one-continuation model)
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("lm_score")) &&
      r.getAs[Double]("lm_score") < -0.5))
  }
}
