package graft

import java.io.File

import graft.operators.Formats

/** The oracle proves the backfill's VALUES; this spec proves its
  * MECHANISM: dynamic partition overwrite must physically rewrite only
  * the target day's directory. If dynamic mode ever degraded to a
  * static overwrite, every other day's files would be deleted and
  * rewritten — invisible to a value-level check, catastrophic as an
  * I/O pattern at 100 TB.
  */
class BackfillSpec extends SparkTestBase {

  private def partitionFiles(dir: String): Map[String, Set[(String, Long)]] = {
    val root = new File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet
      }.toMap
  }

  test("repair rewrites only the corrupt day's partition") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_backfill_spec"
    val badDay = Formats.backfillBadDay(spark, sf())
    Formats.backfillInitialLoad(spark, sf(), dir, badDay)
    val before = partitionFiles(dir)
    assert(before.size > 1, "fixture should span multiple days")
    assert(before.contains(s"day=$badDay"))

    Formats.backfillRepair(spark, sf(), dir, badDay)
    val after = partitionFiles(dir)
    assert(after.keySet == before.keySet,
      "dynamic overwrite must not add or drop partitions")
    before.keys.foreach { p =>
      if (p == s"day=$badDay")
        assert(after(p) != before(p), "target partition should be rewritten")
      else
        assert(after(p) == before(p),
          s"partition $p was touched by a backfill of day=$badDay")
    }
  }
}
