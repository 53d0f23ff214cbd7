package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Pipeline
import graft.sources.Tables

/** A29 CSV sink + A1 schema-declared CSV scan round-trip (the reference's
  * test-mode loader path, src/etl/loading.py:56-75). */
class SinksSpec extends SparkSpec {

  test("csv sink writes a header file that the declared-schema reader round-trips") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val out = s"$dir/listings"
    val df = Tables.table(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
    Pipeline.Sinks.csv(df, out)

    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val back = Tables.csv(spark, out, schema).orderBy("c_custkey")

    assert(back.count() == df.count())
    val a = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(a.sameElements(b))
  }

  test("capped csv read limits rows (A3 test-mode semantics)") {
    val dir = Files.createTempDirectory("graft-sink-cap").toString
    val out = s"$dir/capped"
    val df = Tables.table(spark, sf001, "customer").select(col("c_custkey"))
    Pipeline.Sinks.csv(df, out)
    val schema = StructType(Seq(StructField("c_custkey", LongType)))
    assert(Tables.csvCapped(spark, out, schema, 7).count() == 7)
  }
}
