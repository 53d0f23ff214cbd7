package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** True Structured Streaming: replay the events table as a file stream,
  * run the same event-time windowed aggregation the batch query (st01)
  * declares, and check the streamed result equals the batch result. */
class StreamingSpec extends SparkSpec {

  test("streamed tumbling-window agg equals the batch answer") {
    // Stage the events as a stream source dir (one file = one micro-batch).
    val tmp = java.nio.file.Files.createTempDirectory("stream-src").toString
    val batchEvents = Tables.events(spark, sf001).cache()
    batchEvents.write.mode("overwrite").parquet(tmp)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

    val q = streamed.writeStream
      .format("memory")
      .queryName("st_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamedRows = spark.sql("SELECT * FROM st_test").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batchRows = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamedRows == batchRows)
    assert(streamedRows.nonEmpty)
  }

  test("stateful dedup within watermark drops replayed event ids") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-dd").toString
    val ev = Tables.events(spark, sf001).select("event_id", "ts", "event_type")
    // write the same data twice -> two files, duplicated ids across batches
    ev.write.mode("overwrite").parquet(tmp)
    ev.write.mode("append").parquet(tmp)

    val q = spark.readStream.schema(ev.schema).parquet(tmp)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy()
      .count()
      .writeStream.format("memory").queryName("dd_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val n = spark.sql("SELECT * FROM dd_test").collect()(0).getLong(0)
    assert(n == ev.count()) // duplicates from the second file dropped
  }
}
