package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Layout}

/** Stage-level breakdown of dd06 (diagnostic main, not driver contract) —
  * the round-6 verdict's open measurement: dd06's quiet time failed to
  * return to its r4 level (1.22 s) after the refusal metric moved from a
  * codegen-breaking UDF (r5, 1.69 s) to a pass-through CollectMetrics
  * (r6, 1.72 s). The r4-vs-now plan delta is ONLY that CollectMetrics
  * node (`git show 3fc54ee:...Layout.scala` — same window cap, same
  * Caches.track cache, same joins), so this harness times:
  *
  *   full     — the declared dd06 (observe + cache), as benched
  *   noobs    — identical but metric-free capHotKeys = the EXACT r4 plan
  *   nocache  — the observe form without the postings cache
  *   stages   — within one run: cache materialization (postings window),
  *              then the pair join + size joins off the warm cache
  *   explode  — the pre-window explode subtree (scan + shingle hashing)
  *
  * REPS reps each (default 5), interleaved round-robin like ProfileQ;
  * caches/observations cleared between reps so every rep pays the same
  * work. Prints per-rep seconds; read min as the quiet cost. */
object ProfileDd06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "5").toInt
    val spark = Sessions.build("graft-profile-dd06")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    def explodeSubtree(): DataFrame =
      graft.sources.Tables.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          explode(graft.functions.SketchExprs.shingleHashes(col("text"), 3)).as("h"))

    // metric-free capHotKeys — bit-identical to the r4 Layout.capHotKeys
    def capNoObserve(df: DataFrame, keys: Seq[String], cap: Long): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
      df.withColumn("__grp_sz", count(lit(1)).over(w))
        .filter(col("__grp_sz") <= cap)
        .drop("__grp_sz")
    }

    def dd06Body(kept: DataFrame): DataFrame = {
      val inter = Dedup.cappedCandidatePairs(kept)
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_sh"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
        .withColumn("jaccard", col("inter") / col("uni"))
        .filter(col("jaccard") >= 0.02)
        .select("id_a", "id_b", "inter", "uni", "jaccard")
        .orderBy("id_a", "id_b")
    }

    def clear(): Unit = {
      spark.catalog.clearCache(); Caches.releaseAll(); Layout.resetRefusedCounters()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "full" -> (() => time {
        SparkEntry.queries("dd06_capped_jaccard")(spark, sfDir).count()
      }),
      "noobs" -> (() => time {
        val kept = capNoObserve(explodeSubtree(), Seq("lang", "source", "h"), 2L).cache()
        dd06Body(kept).count()
      }),
      "nocache" -> (() => time {
        dd06Body(Dedup.cappedPostings(spark, sfDir, 2L)).count()
      }),
      "stage_cache" -> (() => time {
        Caches.track(Dedup.cappedPostings(spark, sfDir, 2L)).count()
      }),
      // pair+size joins off an ALREADY-WARM cache (materialize, then time)
      "stage_joins" -> (() => {
        val kept = Caches.track(Dedup.cappedPostings(spark, sfDir, 2L))
        kept.count()
        time { dd06Body(kept).count() }
      }),
      "explode" -> (() => time { explodeSubtree().count() }))

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, run) <- variants) {
      clear()
      times(name) = times(name) :+ run()
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"PROF dd06/$name%-12s min=${ts.min}%.2f  ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
