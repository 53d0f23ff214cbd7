package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.util.Try

/** Parquet/CSV source layer.
  *
  * The reference reads whole CSVs from S3 (`src/etl/extraction.py:17-33`) with
  * tolerant missing-key semantics (`:36-112`). Here: parquet scans over the
  * harness testdata (predicate pushdown + column pruning reach the scan), plus
  * the tolerant-read and schema-declared CSV equivalents used by the ETL layer.
  */
object Tables {

  /** Standard table scan: `dir/name.parquet`. Filters/projections push down. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) — illegal for Spark's parquet
    * reader by default. Read nanos as long, then floor-divide to microseconds
    * (matches DuckDB's ns→µs truncation, so oracles agree). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Two testdata generations exist (the r11 driver regenerated the
    // fixtures): `ts` was parquet timestamp[ns] — unreadable natively by
    // Spark, hence nanosAsLong + div 1000 — and is now timestamp[us],
    // which Spark reads as TIMESTAMP_NTZ. Adapt on the READ SCHEMA, not a
    // flag: both shapes normalize to the session-UTC TimestampType the
    // downstream operators (windows, as-of joins) were built against.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** A2 — tolerant scan: missing path → None, caller skips (the reference
    * skips a platform whose S3 key is absent rather than failing the run). */
  def tableIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Try(spark.read.parquet(path)).toOption else None

  /** Existence check through the Hadoop FS API — works for file://, hdfs://,
    * s3a:// alike, so the same code path runs on a real cluster. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p)
  }

  /** A1 — CSV scan with a *declared* schema (never inferred: inference is a
    * second full pass over 100 TB and nondeterministic on dirty data). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** A3 — test-mode capped read (`pd.read_csv(nrows=5000)`,
    * reference `src/etl/datapipeline.py:92-108`). */
  def csvCapped(spark: SparkSession, path: String, schema: StructType, n: Int): DataFrame =
    csv(spark, path, schema).limit(n)
}
