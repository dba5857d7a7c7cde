package graft

import org.apache.spark.sql.functions._

/** Round-9 pins: generational compaction of the streaming dedup band
  * index — probe cost must stay bounded by (one generation + K
  * subdirs) no matter how many batches the stream has run, and the
  * compacted path must stay oracle-equal to the global batch LSH rule.
  */
class Round9OpsSpec extends SparkTestBase {

  test("band-index compaction stays oracle-equal and bounds the probe set") {
    // 6 shards → 6 micro-batches; K=2 → compactions at batches 2 and 4,
    // i.e. MORE staged batches than K, the growth scenario compaction
    // exists for
    val k = 2
    val got = graft.streaming.DocsStreaming
      .streamDedupMinhash(spark, sf(), shards = 6)
    // global batch oracle: drop doc iff a smaller doc_id shares a band
    val bands = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"),
        posexplode(graft.functions.HashExpressions
          .minhash_band_keys(col("text"))).as(Seq("band_id", "band_key")))
    val dropped = bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id")
          && col("a.band_key") === col("b.band_key")
          && col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).distinct()
    val expected = graft.sources.Tables.documents(spark, sf())
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"))
    assert(canon(got) == canon(expected))

    // structural bound: after 6 batches the index holds exactly ONE
    // closed generation and at most K per-batch subdirs newer than it —
    // the folded b0..b3 and the superseded gen2 are gone
    val mhDirs = new java.io.File(sys.props("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_stream_mh_graft_stream_docs_mh_"))
    val latest = mhDirs.maxBy(_.lastModified)
    val idx = new java.io.File(latest, "index").listFiles().map(_.getName)
    val gens = idx.filter(_.startsWith("gen"))
    val bs = idx.filter(_.startsWith("b")).map(_.drop(1).toLong)
    assert(gens.toSeq == Seq("gen4"),
      s"expected exactly gen4 to survive, got ${idx.toSeq.sorted}")
    assert(bs.length <= k && bs.forall(_ >= 4L),
      s"probe subdirs must be the ≤K batches after the generation, " +
        s"got ${idx.toSeq.sorted}")
  }
}
