package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Schemas

/** Analytics-layer views over the TWSE data: typed casts, date handling,
  * and the D-series scalar semantics of SURVEY.md §2.
  *
  * The reference stores every amount as TEXT because the values "easily
  * exceed the float limit" (reference `README.md:292`) — i.e. the semantic
  * type is an exact signed integer. The analytics layer makes that
  * explicit: DECIMAL(38,0) (38 digits ≫ the 11 observed), never Double.
  */
object TwseAnalytics {

  /** The exact-integer Spark type for TWD amounts. */
  val amountType: DecimalType = DecimalType(38, 0)

  /** C4 — row-wise development view of the payload (ipynb cell-4/cell-7):
    * one record per institution row, positional columns (unit, buy, sell,
    * dif). `explode` preserves array order via the paired position.
    */
  def explodeRows(spark: SparkSession): DataFrame =
    TwsePipeline.open(spark)
      .select(col("date"), posexplode(col("data")).as(Seq("pos", "row")))
      .select(
        col("date"), col("pos"),
        element_at(col("row"), 1).as("unit"),
        try_element_at(col("row"), lit(2)).as("buy"),
        try_element_at(col("row"), lit(3)).as("sell"),
        try_element_at(col("row"), lit(4)).as("dif"))

  /** D2 — exact cast: comma-stripped amount strings → DECIMAL(38,0)
    * internally; the FINAL projection re-casts to BIGINT (observed
    * magnitudes ≤ 11 digits ≪ 2^63) because decimal-typed output is not
    * hash-canonical across engines while int64 is bit-exact. Any Double
    * in this path is a correctness bug (oracle hash-compare would catch
    * it).
    */
  def castExact(spark: SparkSession): DataFrame = {
    val casts = Schemas.investmentCols.tail
      .map(c => col(c).cast(amountType).cast("long").as(c))
    TwsePipeline.flagship(spark).select(col("dt") +: casts: _*)
  }

  /** D5 + D3 — `yyyyMMdd` string ↔ DateType round-trip (`dt` format fixed
    * at reference `Final_app.py:23`): parse, derive calendar fields,
    * re-format. One row per golden date.
    */
  def parseDate(spark: SparkSession): DataFrame =
    TwsePipeline.parsed(spark).select(
      col("date").as("dt"),
      to_date(col("date"), "yyyyMMdd").as("day"),
      year(to_date(col("date"), "yyyyMMdd")).as("yr"),
      month(to_date(col("date"), "yyyyMMdd")).as("mo"),
      date_format(to_date(col("date"), "yyyyMMdd"), "yyyyMMdd").as("roundtrip"))

  /** D4 — UTC → Asia/Taipei (UTC+8) conversion (reference
    * `time_zone.py:17`): the scheduler must evaluate "today" in Taiwan
    * time so the request date is the TW trading day (`README.md:224`).
    * Fixed instants (golden dates at 10:00 UTC = 18:00 TW, the pipeline's
    * effective run time) keep the query deterministic.
    */
  def tzConvert(spark: SparkSession): DataFrame =
    TwsePipeline.parsed(spark).select(
      col("date").as("dt"),
      date_format(
        from_utc_timestamp(
          to_timestamp(concat(col("date"), lit(" 10:00:00")), "yyyyMMdd HH:mm:ss"),
          "Asia/Taipei"),
        "yyyy-MM-dd HH:mm:ss").as("tw_time"),
      // D3 — the request-parameter date string derived in TW time
      date_format(
        from_utc_timestamp(
          to_timestamp(concat(col("date"), lit(" 10:00:00")), "yyyyMMdd HH:mm:ss"),
          "Asia/Taipei"),
        "yyyyMMdd").as("request_date"))

  /** Date arithmetic surface over the golden dates: offsets, diffs,
    * month boundaries, weekday — the calendar toolkit a daily pipeline
    * leans on (engine-portable subset only).
    */
  def dateArith(spark: SparkSession): DataFrame = {
    val day = to_date(col("date"), "yyyyMMdd")
    TwsePipeline.parsed(spark).select(
      col("date").as("dt"),
      date_add(day, 30).as("plus30"),
      datediff(lit("2023-01-01").cast("date"), day).as("days_to_2023"),
      last_day(day).as("month_end"),
      trunc(day, "MM").as("month_start"),
      dayofweek(day).as("dow"))
  }

  /** Array-function surface over the cleaned 12-vector: ordering,
    * membership, position, slicing, dedup cardinality, joining.
    */
  def arrayFuncs(spark: SparkSession): DataFrame =
    TwsePipeline.cleaned(spark)
      .filter(col("date") === "20220819")
      .select(
        col("date").as("dt"),
        array_join(sort_array(col("vec")), ",").as("sorted_csv"),
        array_contains(col("vec"), "461439550").as("has_dealer_dif"),
        array_position(col("vec"), "461439550").as("pos_dealer_dif"),
        array_join(slice(col("vec"), lit(2), lit(3)), ",").as("slice24"),
        size(array_distinct(col("vec"))).as("n_distinct"),
        element_at(col("vec"), -1).as("last_amount"))

  /** D6 — signed-difference consistency: the payload's 買賣差額 column is
    * buy − sell (observable in the golden payload, e.g. −7,298,108,131 =
    * 52,999,169,995 − 60,297,278,126). Re-derive in exact decimal
    * arithmetic and assert equality per institution row.
    */
  def signMath(spark: SparkSession): DataFrame = {
    def amt(c: String) = regexp_replace(col(c), ",", "").cast(amountType)
    // Arithmetic and the consistency compare stay in exact DECIMAL(38,0);
    // only the FINAL emitted amounts re-cast to BIGINT (hash-canonical).
    explodeRows(spark)
      .filter(col("dif").isNotNull) // drift payload rows carry no dif column
      .select(
        col("date"), col("unit"),
        amt("buy").cast("long").as("buy"), amt("sell").cast("long").as("sell"),
        amt("dif").cast("long").as("dif"),
        (amt("buy") - amt("sell")).cast("long").as("derived_dif"),
        (amt("dif") === amt("buy") - amt("sell")).as("consistent"))
  }
}
