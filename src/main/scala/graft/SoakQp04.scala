package graft

import scala.util.control.NonFatal

import graft.operators.TextAnalysis

/** qp04 hot-eval soak (diagnostic main, not driver contract; r13 verdict
  * ask #6). The declared qp04 freezes a 10% eval slice (doc_id % 10 = 0);
  * the regular soak varies vocabulary skew but never the fold, so the
  * decontamination stage has only ever been priced at a thin eval side.
  * This main re-runs the SAME pipeline ([[TextAnalysis
  * .decontaminatedManifest]], byte-identical plan) with evalMod=2 — HALF
  * the corpus held out — so tx30's span surgery dominates the composed
  * cost, and reports whether the span-merge window (partitioned by
  * doc_id) holds:
  *
  *  - wall per rep for evalMod=10 (the declared query) vs evalMod=2 on
  *    the same corpus, CLEAR=1 min-of-reps protocol;
  *  - the flagged-occurrence distribution entering the doc-partitioned
  *    window per train doc (max / p99 / mean of n_flagged, vs the per-doc
  *    window-count bound n_ws − K + 1): doc_id partitioning means the
  *    worst window partition is ONE doc's own windows no matter how hot
  *    the eval side is — the soak verifies the bound empirically.
  *
  * Run: SPARK_GRAFT_SF_DIR=soak/sf1.0 REPS=3 runMain graft.SoakQp04
  */
object SoakQp04 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "soak/sf1.0")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = Sessions.build("graft-soak-qp04")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count() // warm FS/JIT

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }

    for (evalMod <- Seq(10, 2)) {
      val walls = (1 to reps).map { _ =>
        spark.catalog.clearCache(); Caches.releaseAll()
        val (n, t) = timed(
          TextAnalysis.decontaminatedManifest(spark, dir, evalMod).count())
        (n, t)
      }
      println(f"QP04SOAK dir=$dir evalMod=$evalMod rows=${walls.head._1}%d " +
        s"walls=${walls.map(w => f"${w._2}%.2f").mkString(" ")}")
    }

    // span-merge window shape at the hot fold: per-train-doc flagged
    // window mass vs the structural per-doc bound (n_ws - K + 1)
    spark.catalog.clearCache(); Caches.releaseAll()
    val occ = TextAnalysis.contamOccPerDoc(spark, dir, evalMod = 2)
      .localCheckpoint()
    val stats = occ.selectExpr(
      "count(*) AS n_docs", "max(n_flagged) AS mx",
      "percentile(n_flagged, 0.99) AS p99", "avg(n_flagged) AS mean").head()
    val idx = operators.Dedup.ddWinIndexPath(spark, dir)
    val bound = spark.read.parquet(s"$idx/docs")
      .selectExpr(s"max(CAST(n_ws - ${operators.Dedup.substringK} + 1 AS BIGINT)) AS b")
      .head().getLong(0)
    println(f"QP04SOAK occ/doc: docs=${stats.getLong(0)}%d max=${stats.getLong(1)}%d " +
      f"p99=${stats.getDouble(2)}%.1f mean=${stats.getDouble(3)}%.1f " +
      f"per-doc window bound=$bound%d holds=${stats.getLong(1) <= bound}%b")

    try spark.stop() catch { case NonFatal(_) => () }
  }
}
