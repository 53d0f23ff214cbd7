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

  test("foreachBatch bridges the stream into the batch JDBC sink") {
    // The production load path for a streaming pipeline: per micro-batch,
    // reuse the SAME batch sink (Pipeline.Sinks-style JDBC write) — here an
    // idempotent-by-append Derby table, proving streaming output composes
    // with the engine's sink layer rather than needing a parallel one.
    val tmp = java.nio.file.Files.createTempDirectory("stream-fb").toString
    val ev = Tables.events(spark, sf001)
      .select("event_id", "user_id", "event_type")
    ev.write.mode("overwrite").parquet(tmp)
    val url = "jdbc:derby:memory:fbsink;create=true"

    val q = spark.readStream.schema(ev.schema).parquet(tmp)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("jdbc").option("url", url).option("dbtable", "fb_events")
          .save()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val loaded = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "fb_events").load()
    assert(loaded.count() == ev.count())
    assert(loaded.select(sum(col("event_id"))).head.getLong(0) ==
      ev.select(sum(col("event_id"))).head.getLong(0))
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

  test("watermark drops late data in append-mode windowed aggregation") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val src = java.nio.file.Files.createTempDirectory("late-src").toString
    val out = java.nio.file.Files.createTempDirectory("late-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("late-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

    // Two checkpointed AvailableNow runs = two genuine micro-batch epochs
    // with the watermark persisted between them.
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum("value").as("s"), count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("s"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // epoch 1: on-time events; watermark advances to 12:00 - 10min = 11:50
    Seq((ts("2024-01-01 10:10:00"), 1.0), (ts("2024-01-01 12:00:00"), 2.0))
      .toDF("ts", "value").repartition(1).write.mode("append").parquet(src)
    runOnce()
    // epoch 2: one event 90 min LATE (10:20 < watermark 11:50) + one on-time
    Seq((ts("2024-01-01 10:20:00"), 100.0), (ts("2024-01-01 12:30:00"), 4.0))
      .toDF("ts", "value").repartition(1).write.mode("append").parquet(src)
    runOnce()

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    val w10 = rows.find(_._1.startsWith("2024-01-01 10:00"))
    // the 10:00 window is finalized with ONLY the on-time event — the late
    // 100.0 was dropped by the watermark
    assert(w10.isDefined && w10.get._2 == 1.0 && w10.get._3 == 1L,
      s"late event leaked into a closed window: ${rows.mkString(", ")}")
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

  test("stream-static anti-join dedups a stream against a static corpus (dd07 twin)") {
    val docs = Tables.table(spark, sf001, "documents").select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(lower(trim(col("text"))).cast("binary")).as("fp")).distinct()
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    docs.filter(col("doc_id") % 2 === 1).write.mode("overwrite").parquet(tmp)

    val out = graft.streaming.Stateful.incrementalDedup(
      spark.readStream.schema(docs.schema).parquet(tmp), existing)
    val q = out.writeStream.format("memory").queryName("incdedup_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // the surviving fingerprint SET matches the batch operator exactly;
    // WHICH duplicate doc_id represents a fingerprint is arrival-order in
    // the stream vs min-id in batch (documented on incrementalDedup)
    val streamed = spark.sql("SELECT fp FROM incdedup_test").collect()
      .map(_.getString(0)).toSet
    val batch = graft.operators.Dedup.queries("dd07_incremental_dedup")(spark, sf001)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(streamed == batch,
      s"stream kept ${streamed.size} fps, batch kept ${batch.size}")
  }

  test("bloom-prefiltered streaming dedup (dd08 twin) keeps exactly the plain form's fp set") {
    val docs = Tables.table(spark, sf001, "documents").select("doc_id", "text")
    val existingDocs = docs.filter(col("doc_id") % 2 === 0)
    val existing = existingDocs
      .select(md5(lower(trim(col("text"))).cast("binary")).as("fp")).distinct()
    // distributed sketch build over the static corpus, like dd08's
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => C, expression => E}
    val bfAgg = C(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(E(xxhash64(col("fp"))),
        E(lit(4096L)), E(lit(4096L * 8))).toAggregateExpression())
    val sketch = spark.sparkContext.broadcast(
      existing.agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0))
    val tmp = java.nio.file.Files.createTempDirectory("incdedup-bloom").toString
    docs.filter(col("doc_id") % 2 === 1).write.mode("overwrite").parquet(tmp)

    val out = graft.streaming.Stateful.incrementalDedupBloom(
      spark.readStream.schema(docs.schema).parquet(tmp), existing, sketch)
    // the broadcast probe must be IN the streaming plan (replanned per
    // micro-batch — the transport this expression exists for)
    assert(out.queryExecution.analyzed.toString
      .contains("bloom_might_contain_broadcast"))
    val q = out.writeStream.format("memory").queryName("incdedup_bloom_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val bloomed = spark.sql("SELECT fp FROM incdedup_bloom_test").collect()
      .map(_.getString(0)).toSet
    val batch = graft.operators.Dedup.queries("dd07_incremental_dedup")(spark, sf001)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(bloomed == batch,
      s"bloom stream kept ${bloomed.size} fps, batch kept ${batch.size}")
  }

  test("st07 ingest near-dup pairs: exact subset of the odd-vs-even truth, recall logged") {
    // ss08's contract exactly: every emission is exact-cosine verified, so
    // precision is 1 by construction — assert the subset (guards the
    // probe join's columns); recall is LSH-bounded on this near-isotropic
    // corpus and is logged, not pinned.
    val e = Tables.table(spark, sf001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", graft.functions.SketchExprs.l2Norm(col("v")))
    val odd = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("new_id"), col("v").as("nv"), col("nrm").as("nn"))
    val even = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("ex_id"), col("v").as("ev"), col("nrm").as("en"))
    val truth = odd.crossJoin(even)
      .withColumn("cos", graft.functions.SketchExprs.dotProduct(col("nv"), col("ev"))
        / (col("nn") * col("en")))
      .filter(col("cos") > 0.3)
      .select("new_id", "ex_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.streaming.EventWindows
      .queries("st07_ann_ingest_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "gate corpus must contain cross-parity near-dups")
    assert(got.subsetOf(truth), s"st07 emitted non-near-dup pairs: ${got -- truth}")
    assert(got.nonEmpty, "the probe must surface at least one verified pair")
    info(f"st07 recall = ${got.size.toDouble / truth.size}%.3f (${got.size}/${truth.size})")
  }

  test("st07's streaming form emits the batch twin's pair set (stateless stream-static probe)") {
    val e = Tables.table(spark, sf001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val existing = graft.operators.Similarity
      .bandedIndex(e.filter(col("vec_id") % 2 === 0), tables = 2, planes = 8)
    val tmp = java.nio.file.Files.createTempDirectory("st07").toString
    e.filter(col("vec_id") % 2 === 1).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestNeardupPairs(
      spark.readStream.schema(e.schema).parquet(tmp), existing,
      tables = 2, planes = 8, threshold = 0.3)
    val q = stream.writeStream.format("memory").queryName("st07_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT new_id, ex_id FROM st07_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.streaming.EventWindows
      .queries("st07_ann_ingest_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"stream emitted ${streamed.size} distinct pairs, batch twin ${batch.size}")
  }

  test("st08 streaming substring ingest: one-file-at-a-time equals the batch twin") {
    // The helper's contract is micro-batch-boundary INVARIANCE (each doc
    // is judged against the static corpus alone), so the strongest test
    // feeds the same rows one file per trigger and demands the batch
    // twin's exact row set.
    val Dd = graft.operators.Dedup
    val corpusH = spark.read
      .parquet(s"${Dd.ddWinIndexPath(spark, sf001)}/wins")
      .filter(col("par") === 0).select("h").distinct()
    val batchDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val expected = graft.streaming.EventWindows
      .queries("st08_substring_ingest")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(expected.nonEmpty, "gate corpus must contain cross-parity substring dups")
    val tmp = java.nio.file.Files.createTempDirectory("st08").toString
    batchDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestSubstringCut(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(batchDocs.schema).parquet(tmp),
      corpusH, Dd.substringK)
    val q = stream.writeStream.format("memory").queryName("st08_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st08_test").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(streamed == expected,
      s"stream emitted ${streamed.size} rows, batch twin ${expected.size}")
  }

  test("st10 streaming decontam gate: one-file-at-a-time equals the batch twin") {
    // Same invariance contract as st08 (each doc judged against the
    // frozen eval window set alone), different static side: the eval
    // slice of the persisted window index. The equality also pins
    // st10 ≡ tx30-minus-ratio — the serving path IS the analysis query.
    val Dd = graft.operators.Dedup
    val evalH = spark.read
      .parquet(s"${Dd.ddWinIndexPath(spark, sf001)}/wins")
      .filter(col("par") === 0).filter(col("doc_id") % 10 === 0)
      .select("h").distinct()
    val trainDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val expected = graft.streaming.EventWindows
      .queries("st10_decontam_gate_ingest")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(expected.nonEmpty, "gate corpus must contain cross-fold contamination")
    val tx30 = graft.SparkEntry.queries("tx30_substring_decontam")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(tx30 == expected, "st10 must equal tx30 minus the ratio projection")
    val tmp = java.nio.file.Files.createTempDirectory("st10").toString
    trainDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestSubstringCut(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(trainDocs.schema).parquet(tmp),
      evalH, Dd.substringK)
    val q = stream.writeStream.format("memory").queryName("st10_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st10_test").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(streamed == expected,
      s"stream emitted ${streamed.size} rows, batch twin ${expected.size}")
  }

  test("st11 streaming attribution: one-file-at-a-time equals the batch twin and tx32") {
    // The fold flipped relative to st10: arriving docs are a NEW eval
    // set screened against the frozen train corpus. The equality to
    // tx32 pins that recomputing eval windows at ingest time (the
    // honesty contract) reproduces the index-side analysis exactly.
    val Dd = graft.operators.Dedup
    val trainAgg = spark.read
      .parquet(s"${Dd.ddWinIndexPath(spark, sf001)}/wins")
      .filter(col("doc_id") % 10 =!= 0)
      .groupBy("h", "source").agg(count(lit(1)).as("n_occ"))
    val evalDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val expected = graft.streaming.EventWindows
      .queries("st11_attribution_ingest")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "gate corpus must contain cross-fold leakage")
    val tx32 = graft.SparkEntry.queries("tx32_contam_attribution")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(tx32 == expected, "st11 must equal tx32 over the same fold")
    val tmp = java.nio.file.Files.createTempDirectory("st11").toString
    evalDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestAttribution(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(evalDocs.schema).parquet(tmp),
      trainAgg, Dd.substringK)
    val q = stream.writeStream.format("memory").queryName("st11_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st11_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == expected,
      s"stream emitted ${streamed.size} rows, batch twin ${expected.size}")
  }

  test("st15 streaming eval screen: one-file-at-a-time equals the batch twin and qp07") {
    // The serving capstone: arriving eval docs probe BOTH frozen index
    // halves (substring (h → occ, srcs) aggregate + banded LSH postings
    // with the full band vector for first-match pair dedup) and emit
    // qp07's per-doc triage. Equality to qp07 pins that the
    // union-of-evidence single-aggregation serving form reproduces the
    // batch analysis (two countDistincts and a pair-distinct included)
    // exactly; the one-file-at-a-time run pins micro-batch-boundary
    // invariance of the whole composition.
    val Dd = graft.operators.Dedup
    val Sk = graft.functions.SketchExprs
    val idx = Dd.ddWinIndexPath(spark, sf001)
    val trainAggH = spark.read.parquet(s"$idx/wins")
      .filter(col("doc_id") % 10 =!= 0)
      .groupBy("h", "source").agg(count(lit(1)).as("n_occ"))
      .groupBy("h").agg(sum("n_occ").as("occ_h"),
        sort_array(collect_set("source")).as("srcs"))
    val tsigs = Dd.fuzzySigs(
      Tables.table(spark, sf001, "documents").filter(col("doc_id") % 10 =!= 0))
    val postings = tsigs
      .select(col("doc_id").as("train_id"),
        array((0 until 16).map(b =>
          Sk.longSliceHash(col("sig"), b * 4, 4)): _*).as("tbb"))
      .select(col("train_id"), col("tbb"),
        posexplode(col("tbb")).as(Seq("band", "bucket")))
    val sidecar = tsigs.select(col("doc_id").as("train_id"), col("sh").as("sh_t"))
    val evalDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    def asTuples(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), Option(r.get(6)), r.getString(7))).toSet
    val expected = asTuples(graft.streaming.EventWindows
      .queries("st15_eval_screen_ingest")(spark, sf001).collect())
    assert(expected.map(_._8).contains("exact") && expected.map(_._8).contains("clean"),
      "gate corpus must contain both leaked and clean eval docs")
    assert(expected.exists(_._6 > 0), "gate corpus must contain near-dup pairs")
    val qp07 = asTuples(SparkEntry.queries("qp07_eval_screen")(spark, sf001).collect())
    assert(qp07 == expected, "st15 must equal qp07 over the same folds")
    val tmp = java.nio.file.Files.createTempDirectory("st15").toString
    evalDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestEvalScreen(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(evalDocs.schema).parquet(tmp),
      trainAggH, postings, sidecar, Dd.substringK)
    val q = stream.writeStream.format("memory").queryName("st15_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = asTuples(spark.sql("SELECT * FROM st15_test").collect())
    assert(streamed == expected,
      s"stream emitted ${streamed.size} rows, batch twin ${expected.size}")
  }

  test("st09 streaming quality gate: one-file-at-a-time equals the batch twin") {
    // The gate is stateless per doc (score + broadcast threshold
    // compare), so batch-boundary invariance is by construction — this
    // pins it stays that way (a future change that sneaks corpus-global
    // state into the serving path breaks the per-trigger equality).
    val Tx = graft.operators.TextAnalysis
    val thr = Tx.qualityThresholds(Tx.qualityScored(
      Tables.table(spark, sf001, "documents").filter(col("doc_id") % 2 === 0)))
    val batchDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "text")
    val expected = graft.streaming.EventWindows
      .queries("st09_quality_gate_ingest")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "gate corpus must admit some batch docs")
    val tmp = java.nio.file.Files.createTempDirectory("st09").toString
    batchDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestQualityGate(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(batchDocs.schema).parquet(tmp),
      thr)
    val q = stream.writeStream.format("memory").queryName("st09_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st09_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == expected,
      s"stream admitted ${streamed.size} docs, batch twin ${expected.size}")
  }

  test("st12 streaming gopher gate: one-file-at-a-time equals the batch twin") {
    // The gate is stateless per doc with NO trained state at all (the
    // Gopher rules are constants), so batch-boundary invariance is by
    // construction — this pins it stays that way.
    val batchDocs = Tables.table(spark, sf001, "documents")
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val expected = graft.streaming.EventWindows
      .queries("st12_gopher_gate_ingest")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "gate corpus must admit some batch docs")
    val tmp = java.nio.file.Files.createTempDirectory("st12").toString
    batchDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestGopherGate(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(batchDocs.schema).parquet(tmp))
    val q = stream.writeStream.format("memory").queryName("st12_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st12_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"stream admitted ${streamed.size} docs, batch twin ${expected.size}")
  }

  test("st13 streaming ANN serving: one-file-at-a-time equals the batch twin") {
    // The index (trained centroids + cell-assigned even half) is frozen
    // offline; each query's group completes within its own micro-batch,
    // so per-trigger output must equal the batch twin bit-for-bit. Also
    // the scale contract: the TopKAgg buffer caps per-group state at k.
    val Sim = graft.operators.Similarity
    val e = Tables.table(spark, sf001, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val (cents, assigned) = Sim.trainedIvfIndex(e.filter(col("vec_id") % 2 === 0))
    val queries = e.filter(col("vec_id") % 2 === 1)
    // The DECLARED twin serializes the two arrays for the driver's gate
    // (r15, the e05/e06 convention); parse them back so this spec still
    // compares rank-ordered lists against the helper's raw-array output.
    val expected = graft.streaming.EventWindows
      .queries("st13_ann_serving")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0),
        r.getString(1).split('|').filter(_.nonEmpty).map(_.toLong).toList,
        r.getString(2).split('|').filter(_.nonEmpty).map(_.toLong).toList))
      .toSet
    assert(expected.nonEmpty)
    assert(expected.forall { case (_, ids, ds) =>
      ids.size == ds.size && ids.size <= 10 &&
        ds.zip(ds.tail).forall { case (a, b) => a <= b }
    }, "batch twin arrays must be rank-ordered and capped at k")
    val tmp = java.nio.file.Files.createTempDirectory("st13").toString
    queries.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestAnnTopK(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(queries.schema).parquet(tmp),
      cents, assigned, nprobe = 3, k = 10)
    val q = stream.writeStream.format("memory").queryName("st13_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st13_test").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))
      .toSet
    graft.Caches.releaseAll()
    assert(streamed == expected,
      s"stream served ${streamed.size} queries, batch twin ${expected.size}")
  }

  test("st14 streaming media gate: one-file-at-a-time equals the batch twin") {
    // Stateless per asset (checksum + frozen-set anti-join), so
    // batch-boundary invariance is by construction — this pins it.
    val Mm = graft.multimodal.Multimodal
    val media = Mm.mediaFromDocuments(spark, sf001)
    val corpus = Mm.withMeta(media.filter(col("asset_id") % 2 === 0))
      .select(col("meta.checksum").as("checksum")).distinct()
    val arriving = media.filter(col("asset_id") % 2 === 1)
    val expected = graft.streaming.EventWindows
      .queries("st14_media_gate_ingest")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(expected.nonEmpty, "gate corpus must admit some arriving assets")
    val tmp = java.nio.file.Files.createTempDirectory("st14").toString
    arriving.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.Stateful.ingestMediaGate(
      spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(arriving.schema).parquet(tmp),
      corpus)
    val q = stream.writeStream.format("memory").queryName("st14_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM st14_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == expected,
      s"stream admitted ${streamed.size} assets, batch twin ${expected.size}")
  }

  test("st06's keep-first pre-reduction is fp-set-invariant through the bloom helper") {
    // st06 pre-reduces the batch to keep-first-by-doc_id before the
    // streaming helper so the kept doc_id is deterministic (the helper's
    // own dropDuplicates is arrival-order). The SURVIVING FP SET must be
    // identical with or without that pre-reduction — the anti-join and
    // dedup operate on whole fingerprints — which is exactly what lets
    // st06 share dd07/dd08's oracle verbatim.
    val d = Tables.table(spark, sf001, "documents")
      .select(col("doc_id"), col("text"),
        md5(lower(trim(col("text"))).cast("binary")).as("fp"))
    val existing = d.filter(col("doc_id") % 2 === 0).select("fp")
    val raw = d.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val sketch = graft.operators.Dedup.bloomSketch(spark, sf001)
    val rawFps = graft.streaming.Stateful
      .incrementalDedupBloom(raw, existing, sketch)
      .select("fp").collect().map(_.getString(0)).toSet
    val st06Rows = graft.streaming.EventWindows
      .queries("st06_bloom_ingest_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(st06Rows.map(_._2).toSet == rawFps,
      "pre-reduction changed the surviving fp set")
    // and st06's rows are exactly dd07's (the shared-oracle claim)
    val dd07 = graft.operators.Dedup
      .queries("dd07_incremental_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(st06Rows.toSeq == dd07.toSeq, "st06 diverged from dd07")
  }

  test("watermarked incremental dedup (bounded state) keeps the same fp set here") {
    // Same contract as the unbounded variant when every in-stream duplicate
    // falls inside the watermark window (all synthetic ts within one hour
    // here, watermark 2 hours) — but state is bounded by the window instead
    // of growing with the stream's life (the ADVICE-flagged hazard).
    val docs = Tables.table(spark, sf001, "documents").select("doc_id", "text")
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, CAST(doc_id % 3600 AS DOUBLE))"))
    val existing = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(lower(trim(col("text"))).cast("binary")).as("fp")).distinct()
    val tmp = java.nio.file.Files.createTempDirectory("incdedup-wm").toString
    docs.filter(col("doc_id") % 2 === 1).write.mode("overwrite").parquet(tmp)

    val out = graft.streaming.Stateful.incrementalDedup(
      spark.readStream.schema(docs.schema).parquet(tmp), existing,
      eventTimeCol = Some("ts"), watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("incdedup_wm_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.sql("SELECT fp FROM incdedup_wm_test").collect()
      .map(_.getString(0)).toSet
    val batch = graft.operators.Dedup.queries("dd07_incremental_dedup")(spark, sf001)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(streamed == batch,
      s"watermarked stream kept ${streamed.size} fps, batch kept ${batch.size}")
  }

  test("watermarked stream-stream interval join equals the batch join") {
    val ev = Tables.events(spark, sf001).cache()
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("purchase_id"))
    val lDir = java.nio.file.Files.createTempDirectory("ssj-l").toString
    val rDir = java.nio.file.Files.createTempDirectory("ssj-r").toString
    clicks.write.mode("overwrite").parquet(lDir)
    purchases.write.mode("overwrite").parquet(rDir)

    val joined = graft.streaming.Stateful.intervalJoin(
      spark.readStream.schema(clicks.schema).parquet(lDir),
      spark.readStream.schema(purchases.schema).parquet(rDir),
      watermark = "30 minutes", windowMinutes = 10)
    val q = joined.select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.sql("SELECT * FROM ssj_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.streaming.Stateful.intervalJoin(clicks, purchases,
      watermark = "30 minutes", windowMinutes = 10) // watermark is a no-op in batch
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs vs batch ${batch.size}")
    assert(batch.nonEmpty) // the interval actually matched something
  }
}
