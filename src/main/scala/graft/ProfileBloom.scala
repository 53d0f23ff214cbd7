package graft

import org.apache.spark.sql.functions._

/** Literal-vs-broadcast sketch transport at the 1 MB sizing that ruled the
  * literal form out (diagnostic main, not driver contract).
  *
  * Round 7 measured dd08's first cut — a fixed 1M-item / 1 MB sketch
  * inlined via `BloomFilterMightContain(lit(bytes), …)` — at ~+0.7 s PER
  * INVOCATION over the KB form, with the build memoized: Catalyst
  * canonicalization hashes literal byte arrays repeatedly across rule
  * batches, so the cost is PLAN time and scales with sketch bytes. Round 8
  * ships the sketch as a broadcast variable read by
  * [[graft.functions.BloomMightContainBroadcast]]; this harness re-runs
  * the 1 MB comparison to show the overhead is gone.
  *
  * Each rep builds a FRESH DataFrame so every invocation pays full
  * analysis/optimization — that is where the literal form bleeds. REPS
  * round-robin, read min. ITEMS scales the sketch (default 1M ≈ 1 MB at
  * 8 bits/item; 10M ≈ 10 MB shows the literal's cost growing with bytes
  * while the broadcast form stays flat). */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => C, expression => E}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "7").toInt
    val spark = Sessions.build("graft-profile-bloom")
    spark.sparkContext.setLogLevel("WARN")

    def batch() = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), md5(lower(trim(col("text"))).cast("binary")).as("fp"))
      .filter(col("doc_id") % 2 === 1)

    // default 1M items / ~1 MB — the sizing that exposed the literal cost
    val items = sys.env.getOrElse("ITEMS", "1000000").toLong
    val bfAgg = C(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(E(xxhash64(col("fp"))),
        E(lit(items)), E(lit(items * 8))).toAggregateExpression())
    val sketch = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), md5(lower(trim(col("text"))).cast("binary")).as("fp"))
      .filter(col("doc_id") % 2 === 0)
      .agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    println(s"PROF bloom/sketch_bytes=${sketch.length}")
    val bc = spark.sparkContext.broadcast(sketch)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "literal" -> (() => time {
        batch().filter(C(org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(E(lit(sketch)), E(xxhash64(col("fp")))))).count()
      }),
      "broadcast" -> (() => time {
        batch().filter(graft.functions.BloomMightContainBroadcast
          .bloomMightContain(bc, xxhash64(col("fp")))).count()
      }),
      // no probe at all — the floor both forms sit on
      "no_filter" -> (() => time { batch().count() }))

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, run) <- variants)
      times(name) = times(name) :+ run()
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"PROF bloom/$name%-14s min=${ts.min}%.3f  ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
