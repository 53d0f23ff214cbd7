package graft.etl

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse JDBC dialect — the dialect half of the reference's
  * ClickHouseLoader (`/root/reference/src/etl/loading.py:14-53`, client
  * config `:16-23`): the loader semantics (TRUNCATE + chunked insert) live
  * in [[Pipeline.Sinks.jdbc]] and are proven against embedded Derby in
  * `JdbcSinkSpec`; this supplies the ClickHouse-specific surface Spark
  * consults when the URL is a real `jdbc:clickhouse:` endpoint:
  *
  *  - Spark→ClickHouse DDL type mapping for `createTableColumnTypes`-less
  *    writes (`String`/`Int64`/`Float64`/`DateTime64`/`Array(T)`/
  *    `Decimal(p,s)` — not the SQL-92 names Spark would emit by default,
  *    which ClickHouse rejects);
  *  - ClickHouse→Catalyst readback for its unsigned/typed columns
  *    (`UInt8`→short, `UInt32`→long, `DateTime*`→timestamp);
  *  - backtick identifier quoting;
  *  - non-cascading `TRUNCATE TABLE` (what the loader issues before the
  *    chunked insert).
  *
  * Nullability caveat (documented, inherent to the JdbcDialect contract):
  * ClickHouse spells nullable columns `Nullable(T)` rather than omitting
  * `NOT NULL`, and `getJDBCType` sees only the DataType — so pre-create
  * tables carrying nullable columns (the reference does exactly this: its
  * loader inserts into an existing DWH table and never emits DDL).
  *
  * Registration is explicit ([[ClickHouseDialect.register]]) — standard
  * `JdbcDialects.registerDialect` mechanism, identical on a cluster.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:clickhouse:")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    case BooleanType => Some(JdbcType("UInt8", Types.BOOLEAN))
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case DateType => Some(JdbcType("Date", Types.DATE))
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case ArrayType(et, _) =>
      getJDBCType(et).map(inner =>
        JdbcType(s"Array(${inner.databaseTypeDefinition})", Types.ARRAY))
    case _ => None
  }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    // Nullable columns report as `Nullable(T)` — and pre-created DWH tables
    // are exactly where nullable columns live (see the nullability caveat
    // above), so unwrap before matching or the mainline readback path would
    // silently fall through to the driver default.
    val t =
      if (typeName.startsWith("Nullable(") && typeName.endsWith(")"))
        typeName.substring("Nullable(".length, typeName.length - 1)
      else typeName
    t match {
      // ClickHouse's unsigned ints need one size up to fit in Catalyst's
      // signed types.
      case "UInt8" => Some(ShortType)
      case "UInt16" => Some(IntegerType)
      case "UInt32" => Some(LongType)
      case "UInt64" => Some(DecimalType(20, 0))
      case s if s.startsWith("DateTime") => Some(TimestampType)
      case _ => None
    }
  }

  override def quoteIdentifier(colName: String): String =
    "`" + colName.replace("`", "``") + "`"

  override def getTruncateQuery(table: String,
      cascade: Option[Boolean]): String = s"TRUNCATE TABLE $table"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Idempotent registration with Spark's dialect registry. */
  def register(): Unit = {
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}
