package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Round-8 plan-shape pins: the two diagnostics that ranked keys with a
  * partition-less window (every row on ONE task) now use the
  * distributed range-partition + prefix-sum rank / banded two-pass
  * running max — and these tests keep them that way, the same style as
  * the WindowGroupLimit pins.
  */
class Round8OpsSpec extends SparkTestBase {

  private def emptyKeyWindows(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  test("skewProfile plans no partition-less window") {
    val df = Analytics.skewProfile(spark, sf())
    assert(emptyKeyWindows(df).isEmpty,
      s"skew profile must rank via the distributed prefix-sum, not an " +
        s"empty-key window:\n${df.queryExecution.executedPlan}")
    // and it still answers: one row, all-integer profile
    val r = df.head()
    assert(r.getAs[Long]("n_keys") > 0 && r.getAs[Long]("max_g") > 0)
  }

  test("skyline plans no partition-less window and stays a frontier") {
    val df = Analytics.skyline(spark, sf())
    assert(emptyKeyWindows(df).isEmpty,
      s"skyline frontier must use the banded two-pass running max:\n" +
        s"${df.queryExecution.executedPlan}")
    // mutual non-domination: no row may dominate another on
    // (price lower-or-equal, size higher-or-equal, one strict)
    val rows = df.select(
        (col("p_retailprice").cast("decimal(12,2)") * 100).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (a <- rows; b <- rows if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates $b — not a frontier")
  }
}
