package graft

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ClickHouseDialect

/** The ClickHouse dialect's pure surface: URL routing, DDL type mapping,
  * readback mapping, truncate statement. (Loader semantics — truncate +
  * chunked insert — are covered against embedded Derby in JdbcSinkSpec;
  * there is no ClickHouse server in this environment.) */
class ClickHouseDialectSpec extends AnyFunSuite {

  test("registry routes clickhouse URLs to the dialect and nothing else") {
    ClickHouseDialect.register()
    assert(JdbcDialects.get("jdbc:clickhouse://dwh:8123/default") eq ClickHouseDialect)
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://x/y"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:g"))
  }

  test("Spark types map to ClickHouse DDL names, not SQL-92") {
    def ddl(dt: DataType): String = ClickHouseDialect.getJDBCType(dt).get.databaseTypeDefinition
    assert(ddl(StringType) == "String") // Spark default would be TEXT
    assert(ddl(LongType) == "Int64") // ... BIGINT
    assert(ddl(DoubleType) == "Float64") // ... DOUBLE PRECISION
    assert(ddl(FloatType) == "Float32")
    assert(ddl(BooleanType) == "UInt8")
    assert(ddl(DateType) == "Date")
    assert(ddl(TimestampType) == "DateTime64(6)")
    assert(ddl(DecimalType(18, 2)) == "Decimal(18, 2)")
    // the canonical schema's array columns (images, subways)
    assert(ddl(ArrayType(StringType)) == "Array(String)")
    assert(ddl(ArrayType(LongType)) == "Array(Int64)")
    assert(ClickHouseDialect.getJDBCType(ArrayType(CalendarIntervalType)).isEmpty)
  }

  test("every canonical-schema field has a ClickHouse DDL mapping") {
    graft.etl.Canonical.targetSchema.foreach { f =>
      assert(ClickHouseDialect.getJDBCType(f.dataType).isDefined,
        s"no ClickHouse type for ${f.name}: ${f.dataType}")
    }
  }

  test("unsigned readback types widen to fit signed Catalyst types") {
    val md = new MetadataBuilder
    def cat(name: String) =
      ClickHouseDialect.getCatalystType(Types.OTHER, name, 0, md)
    assert(cat("UInt8").contains(ShortType))
    assert(cat("UInt32").contains(LongType))
    assert(cat("UInt64").contains(DecimalType(20, 0)))
    assert(cat("DateTime64(3)").contains(TimestampType))
    assert(cat("Int32").isEmpty) // signed types fall through to defaults
    // nullable columns report as Nullable(T) — the pre-created-DWH-table
    // mainline — and must unwrap to the same mappings
    assert(cat("Nullable(UInt32)").contains(LongType))
    assert(cat("Nullable(UInt64)").contains(DecimalType(20, 0)))
    assert(cat("Nullable(DateTime64(3))").contains(TimestampType))
    assert(cat("Nullable(Int32)").isEmpty)
  }

  test("identifier quoting and truncate match ClickHouse syntax") {
    assert(ClickHouseDialect.quoteIdentifier("Company ID") == "`Company ID`")
    assert(ClickHouseDialect.quoteIdentifier("a`b") == "`a``b`")
    assert(ClickHouseDialect.getTruncateQuery("dwh.offers", Some(true)) ==
      "TRUNCATE TABLE dwh.offers")
    assert(ClickHouseDialect.isCascadingTruncateTable().contains(false))
  }
}
