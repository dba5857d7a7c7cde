package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types.StringType
import graft.model.Schemas
import graft.sources.JdbcStore

/** A3/E1 production fidelity: pin the Postgres URL/dialect/DDL mapping
  * to the reference's `database/sql/create_table.sql:2-16` (no Postgres
  * server in the sandbox; Derby exercises the same codepath live in
  * TwsePipelineSpec).
  */
class PostgresDialectSpec extends SparkTestBase {

  private val opts = JdbcStore.postgresWriteOptions("db-host:5432", "twse")

  test("the Postgres URL resolves to Spark's PostgresDialect") {
    val dialect = JdbcDialects.get(opts("url"))
    assert(dialect.getClass.getSimpleName.contains("Postgres"))
    assert(opts("driver") === "org.postgresql.Driver")
  }

  test("StringType maps to TEXT under the Postgres dialect — the reference's column type") {
    val dialect = JdbcDialects.get(opts("url"))
    val jt = dialect.getJDBCType(StringType)
    assert(jt.isDefined && jt.get.databaseTypeDefinition === "TEXT")
  }

  test("the emitted DDL matches create_table.sql column for column") {
    // reference order: dt first, then the 4 dealer / 3 investment /
    // 3 foreign amount columns, every one TEXT
    val expected = Seq(
      "dt", "dealer_buy", "dealer_sell", "dealer_dif",
      "dealer_buy_hedge", "dealer_sell_hedge", "dealer_dif_hedge",
      "investment_buy", "investment_sell", "investment_dif",
      "foreign_buy", "foreign_sell", "foreign_dif")
    assert(Schemas.investmentCols === expected)
    assert(opts("dbtable") === "investment_data")
    assert(opts("createTableColumnTypes") ===
      expected.map(c => s"$c TEXT").mkString(", "))
    // NOT NULL fidelity: the write schema carries non-nullable columns
    assert(Schemas.investmentData.fields.forall(!_.nullable))
  }
}
