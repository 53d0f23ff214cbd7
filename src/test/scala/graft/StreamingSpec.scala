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

  test("mapGroupsWithState running counts equal batch counts") {
    val tmp = java.nio.file.Files.createTempDirectory("stream-st").toString
    val ev = Tables.events(spark, sf001).select("user_id", "event_type", "ts")
    ev.write.mode("overwrite").parquet(tmp)

    val streamed = graft.streaming.Stateful.runningUserCounts(
      spark.readStream.schema(ev.schema).parquet(tmp))
    val q = streamed.writeStream.format("memory").queryName("st_counts")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT user_id, max(n_events), max(n_purchases) FROM st_counts GROUP BY 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = ev.groupBy("user_id")
      .agg(count(lit(1)), count(when(col("event_type") === "purchase", 1)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("flatMapGroupsWithState sessionization closes sessions at the gap") {
    import spark.implicits._
    val gapMs = 5 * 60 * 1000L
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:02:00")),
      (1L, ts("2024-01-01 10:20:00")), // new session after 18-min gap
      (2L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts")
    // batch-mode flatMapGroupsWithState: one "batch", no timeouts fire — the
    // closed (first) session of user 1 is emitted; open tails stay in state.
    val out = graft.streaming.Stateful.sessionize(ev, gapMs).collect()
    assert(out.length == 1)
    assert(out(0).user_id == 1L && out(0).n_events == 2L)
    assert(out(0).session_start == ts("2024-01-01 10:00:00"))
    assert(out(0).session_end == ts("2024-01-01 10:02:00"))
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
