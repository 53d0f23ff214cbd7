package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Pipeline
import graft.sources.Tables

/** A28 — the reference's ClickHouse loader semantics (TRUNCATE then chunked
  * insert, src/etl/loading.py:14-53) as JDBC overwrite+truncate, exercised
  * against embedded Derby (the only RDBMS in the container). */
class JdbcSinkSpec extends SparkSpec {

  test("jdbc sink truncate-and-reload is idempotent") {
    val db = Files.createTempDirectory("graft-jdbc").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val df = Tables.table(spark, sf001, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))

    Pipeline.Sinks.jdbc(df, url, "nations")
    Pipeline.Sinks.jdbc(df, url, "nations") // full-refresh: must not duplicate

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nations").load()
    assert(back.count() == df.count())
    val want = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
