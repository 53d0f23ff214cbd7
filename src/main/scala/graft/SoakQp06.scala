package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis
import graft.sources.Tables

/** qp06 Gopher-screen soak (diagnostic main, not driver contract). The
  * qp06 scaladoc claims the composition order matters: the map-side
  * shape screen ([[TextAnalysis.gopherQuality]]) leads so the repetition
  * stage's (doc, n, gram) explode+aggregate — the only exchange-heavy
  * stage, ~4 exploded rows per token position — runs over the survivor
  * subset only. This main prices that claim on the soak corpora:
  *
  *  - wall for the repetition report over the UNSCREENED corpus vs over
  *    the shape-screen survivors (the qp06 interior), CLEAR=1
  *    min-of-reps protocol — the delta is what screen-first buys;
  *  - the composed qp06 manifest wall and the per-stage selectivity
  *    funnel (docs → shape survivors → repetition survivors → manifest
  *    rows), so a corpus where the screen keeps ~everything (and the
  *    reorder buys nothing) is visible instead of assumed.
  *
  * Run: SPARK_GRAFT_SF_DIR=soak/sf1.0 REPS=3 runMain graft.SoakQp06
  */
object SoakQp06 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "soak/sf1.0")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = Sessions.build("graft-soak-qp06")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count() // warm FS/JIT

    def docs = Tables.table(spark, dir, "documents")
    def shaped = TextAnalysis.gopherQuality(docs, minStopWords = 1)
      .filter(col("keep")).select("doc_id", "text")

    def minWall(f: => Long): (Long, Seq[Double]) = {
      val runs = (1 to reps).map { _ =>
        spark.catalog.clearCache(); Caches.releaseAll()
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2))
    }

    val (nAll, wAll) = minWall(
      TextAnalysis.gopherRepetition(docs).filter(col("keep")).count())
    val (nScr, wScr) = minWall(
      TextAnalysis.gopherRepetition(shaped).filter(col("keep")).count())
    val (nMan, wMan) = minWall(
      TextAnalysis.queries("qp06_gopher_manifest")(spark, dir).count())
    val nDocs = docs.count()
    val nShaped = shaped.count()

    def fmt(ws: Seq[Double]) = ws.map(w => f"$w%.2f").mkString(" ")
    println(s"QP06SOAK dir=$dir docs=$nDocs shaped=$nShaped " +
      s"repKeepAll=$nAll repKeepScreened=$nScr manifest=$nMan")
    println(s"QP06SOAK walls repetitionUnscreened=[${fmt(wAll)}] " +
      s"repetitionScreened=[${fmt(wScr)}] composedManifest=[${fmt(wMan)}]")

    try spark.stop() catch { case NonFatal(_) => () }
  }
}
