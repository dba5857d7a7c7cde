package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.Formats
import graft.sources.Tables

/** Table maintenance: small-file compaction must shrink the file count
  * to the byte-derived target while leaving content untouched.
  */
class CompactionSpec extends SparkTestBase {

  private def partFiles(dir: String): Seq[java.nio.file.Path] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      } finally s.close()
    }
  }

  test("compaction hits the byte-derived file count and preserves content") {
    val root = Files.createTempDirectory("graft_compact").toString
    val frag = s"$root/frag"
    val out = s"$root/out"
    val orders = Tables.orders(spark, sf("sf0.01"))
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    assert(partFiles(frag).length === 64)

    val target = 1L << 20 // 1 MB files
    val back = Formats.compact(spark, frag, out, target)

    val bytes = Formats.tableBytes(spark, frag)
    val expected = math.max(1L, (bytes + target - 1) / target).toInt
    assert(partFiles(out).length === expected)
    assert(partFiles(out).length < 64)

    // content identical: same rows, same checksum-style aggregates
    assert(back.count() === orders.count())
    val s1 = orders.agg(sum(col("o_orderkey")), countDistinct(col("o_custkey"))).head
    val s2 = back.agg(sum(col("o_orderkey")), countDistinct(col("o_custkey"))).head
    assert(s1 === s2)
  }

  test("an already-compact table compacts to a single file, not zero") {
    val root = Files.createTempDirectory("graft_compact_small").toString
    val frag = s"$root/frag"
    Tables.region(spark, sf()).write.mode("overwrite").parquet(frag)
    val back = Formats.compact(spark, frag, s"$root/out", 64L << 20)
    assert(partFiles(s"$root/out").length === 1)
    assert(back.count() === 5)
  }
}
