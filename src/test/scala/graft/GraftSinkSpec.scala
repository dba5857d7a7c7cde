package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** The DSv2 transactional batch-writer protocol: staged per-attempt
  * files, at-most-one commit per partition, driver-side atomic publish
  * gated on _SUCCESS. The retry test is the point: a task that fails
  * AFTER writing rows must not double-land them.
  */
class GraftSinkSpec extends SparkTestBase {

  private def outDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sink_$tag")
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def readBack(dir: String): Seq[String] = {
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_SUCCESS")), "commit must drop _SUCCESS")
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("part-"))
    files.flatMap(f =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala).toSeq.sorted
  }

  test("batch write commits staged files atomically and reads back exactly") {
    val dir = outDir("basic")
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("row_"), col("id")).as("tag"))
      .repartition(4)
    df.write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("append").save()
    val lines = readBack(dir)
    assert(lines.length === 100)
    assert(lines.contains("7\trow_7"))
    // no stray staging leftovers after publish
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_staging")))
  }

  test("mode(overwrite) replaces the previous generation, never appends to it") {
    val dir = outDir("overwrite")
    def write(n: Int, tag: String, mode: String): Unit =
      spark.range(0, n)
        .select(col("id"), lit(tag).as("tag")).repartition(3)
        .write.format("graft.sources.GraftCommitSink")
        .option("path", dir).mode(mode).save()
    write(50, "gen1", "append")
    assert(readBack(dir).length === 50)
    write(20, "gen2", "overwrite")
    val lines = readBack(dir)
    assert(lines.length === 20,
      s"overwrite must drop the 50 gen1 rows, got ${lines.length}")
    assert(lines.forall(_.endsWith("\tgen2")),
      "no gen1 row may survive an overwrite")
    // and a subsequent append still accumulates on top of gen2
    write(5, "gen3", "append")
    assert(readBack(dir).length === 25)
  }

  test("the provider is write-only: a read without an explicit schema fails loudly") {
    val dir = outDir("writeonly")
    spark.range(0, 3).select(col("id"), lit("x").as("tag"))
      .write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("append").save()
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.GraftCommitSink")
        .option("path", dir).load().collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[UnsupportedOperationException]),
      s"expected the write-only UnsupportedOperationException, got $ex")
  }

  test("a task that fails after writing rows lands them exactly once on retry") {
    val dir = outDir("retry")
    GraftSinkSpec.attempts.set(0)
    val df = spark.range(0, 40).repartition(2)
      .select(col("id"), lit("x").as("tag"))
      // first attempt of the partition holding id=13 dies mid-write,
      // after its writer has already staged rows — that attempt never
      // commits; the retry stages a fresh file. The counter is resolved
      // through the companion object INSIDE the lambda: a captured
      // reference would serialize a private copy per task attempt and
      // the retry would see a fresh zero (and fail forever).
      .filter(udf { (id: Long) =>
        if (id % 40 == 13 && GraftSinkSpec.attempts.incrementAndGet() == 1)
          throw new RuntimeException("injected post-write failure")
        true
      }.apply(col("id")))
    df.write.format("graft.sources.GraftCommitSink")
      .option("path", dir).mode("append").save()
    val lines = readBack(dir)
    assert(lines.length === 40, s"retry must land rows exactly once: $lines")
    assert(GraftSinkSpec.attempts.get() >= 2,
      "the failure must actually have fired")
  }
}

object GraftSinkSpec {
  val attempts = new AtomicInteger()
}
