package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity

/** Trained-ANN family soak (diagnostic main, not driver contract). The
  * sf dirs top out at 2k vectors — too small to exercise the claims the
  * ss18/ss19/ss20/st13 scaladocs make about scan fractions and frozen
  * index serving — so this main synthesizes a DETERMINISTIC clustered
  * corpus (NVEC vectors, 64 dims, 32 well-separated blobs: per-(blob,
  * dim) pseudo-random centers via integer hashing, per-vector jitter two
  * orders of magnitude under the blob separation — the regime IVF
  * indexes exist for; no rand(), so reruns are bit-identical) and prices:
  *
  *  - brute-force exact integer top-10 for the 5 standard queries (what
  *    every search pays with no index);
  *  - ss18 trained-IVF and ss19 trained-IVF-PQ END TO END (training
  *    included — the honest one-shot cost);
  *  - ss20 range search end to end, with its hit count;
  *  - the production split st13 serves under: the index (centroids +
  *    assignment) is built ONCE and frozen (cached + materialized), then
  *    ~NVEC/100 arriving queries are served through
  *    [[graft.streaming.Stateful.ingestAnnTopK]] against it — per-query
  *    cost is what a serving deployment actually pays.
  *
  * CLEAR min-of-reps protocol as in the other soak mains.
  * Run: NVEC=100000 REPS=3 runMain graft.SoakAnn
  */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val nVec = sys.env.getOrElse("NVEC", "100000").toLong
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val skew = sys.env.get("SKEW").contains("1")
    val blobs = 32
    val spark = Sessions.build("graft-soak-ann")
    spark.sparkContext.setLogLevel("WARN")

    // deterministic clustered corpus: center ∈ [-0.8, 0.8) per (blob,
    // dim) via a Knuth-hash residue, jitter ∈ [-0.01, 0.01) per (vec,
    // dim) — separation ~1.4e13 on the integer grid vs in-blob spread
    // ~2.6e10. SKEW=1 assigns blobs by the square of a uniform draw —
    // floor(pmod(id,32)²/32) maps residues 0..5 to blob 0, so it holds
    // ~19% of the corpus (6/32, ~6× a uniform blob's share) and the
    // tail blobs thin out — the hot CELL shape (an ANN index's tx26
    // analogue: the probe that lands in the hot cell scans ~6× the
    // uniform cell's share; the question is whether serving degrades
    // gracefully, not whether it stays flat).
    val blobExpr =
      if (skew) s"CAST(pmod(id, $blobs) * pmod(id, $blobs) / $blobs AS BIGINT)"
      else s"pmod(id, $blobs)"
    def corpus = spark.range(nVec).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, 63), d ->
        (pmod(($blobExpr) * 2654435761 + d * 40503, 1000) / 1000.0) * 1.6 - 0.8
        + (pmod(id * 31 + d, 101) / 101.0) * 0.02 - 0.01)""").as("v"))
    corpus.count() // warm JIT

    def minWall(f: => Long): (Long, Seq[Double]) = {
      val runs = (1 to reps).map { _ =>
        spark.catalog.clearCache(); Caches.releaseAll()
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2))
    }

    // exact integer brute force for the 5 standard queries — the ss01
    // twin on ss14's grid, what an index-free search pays
    def brute: Long = {
      val feats = Similarity.intFeatures(corpus)
      val q = feats.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("f").as("qf"))
      val w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
      feats.join(broadcast(q), feats("vec_id") =!= q("query_id"))
        .withColumn("dist", expr(
          "long_sqdist(qf, f)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10).count()
    }

    // SOAK_SKIP_BASE=1 skips the standing family rows (brute/ss18/ss19/
    // ss20/ss21/serve) so a gated NN-Descent run prices ONLY its target
    // — ss21 alone is ~8 min/rep at 100k, and re-paying it to measure
    // the linear twin would bury the comparison the run exists to make.
    val baseOn = !sys.env.get("SOAK_SKIP_BASE").contains("1")
    def baseWall(f: => Long): (Long, Seq[Double]) =
      if (baseOn) minWall(f) else (0L, Seq.empty[Double])
    val (nBr, wBr) = baseWall(brute)
    val (n18, w18) = baseWall(Similarity.ivfTrainedAnn(corpus).count())
    val (n19, w19) = baseWall(Similarity.ivfPqAnn(corpus).count())
    // in-blob radius ~2.6e10; r = 5e10 keeps hits within a blob
    val (n20, w20) = baseWall(
      Similarity.ivfRangeSearch(corpus, k = 8, r = 50000000000L).count())
    // ss21's cell-local pair join is the family's (n/k)² bound — the
    // place a hot cell (SKEW=1) concentrates QUADRATIC cost where
    // serving/search concentrate linear scan cost; the row prices that
    // directly (edges shuffle, not pairs — WindowGroupLimit keeps a
    // kG-row heap per vector map-side)
    val (n21, w21) = baseWall(Similarity.knnGraphEdges(corpus).count())
    // NNDESCENT=1 adds ss22's row: the full refinement pipeline REBUILDS
    // the ss21 seed inside its plan, so (w22 − w21) prices the marginal
    // cost of one NN-Descent round — the ≤(4kG)² candidates/vertex
    // linear claim, measured. Gated because it re-pays the quadratic
    // seed (~w21 per rep) on top of the default soak.
    val nnd = sys.env.get("NNDESCENT").contains("1")
    val (n22, w22) =
      if (nnd) minWall(Similarity.nnDescentEdges(corpus).count())
      else (0L, Seq.empty[Double])
    // NNDESCENT2=1 adds ss23's row: the linear-end-to-end twin — the
    // projection-rank seed + BOTH NN-Descent rounds at working width 8,
    // nothing quadratic anywhere — so w23 vs w21 is the round's headline
    // comparison (r16 verdict #1: the declared twin's 100k wall must sit
    // far under the 472 s quadratic seed). Runs fine under the default
    // 8 GB heap since the re-rank ships pack_ints features (r16 #2).
    val nnd2 = sys.env.get("NNDESCENT2").contains("1")
    val (n23, w23) =
      if (nnd2) minWall(Similarity.nnDescentIterEdges(corpus).count())
      else (0L, Seq.empty[Double])
    // NND2_RECALL=1 measures ss23's recall AT SCALE (r17 verdict #6):
    // the 0.943 recall pin lives on the 2k fixture, and two-round
    // convergence at 50x the corpus was asserted by the seed-connectivity
    // argument, not measured. Sample ~100 query vectors, take ss23's
    // top-4 for them, and compare against the exact brute-force top-4
    // for JUST those queries (nQ × n distance evals — linear, a broadcast
    // of 100 query rows against one corpus scan, never all-pairs).
    // Ties at the rank-4/5 boundary count against recall; both sides
    // break ties by (dist, neighbor_id), so the penalty is shared.
    // NND2_ROUNDS / NND2_KWORK / NND2_BUCKETW override the declared
    // query's parameters (2 / 8 / 16): the r18 measurement found two
    // rounds reach only ~0.60 at 100k — NN-Descent's round count is the
    // convergence knob and grows slowly with n (Dong et al. report ~5
    // iterations at web scale), so the soak prices the recall-vs-rounds
    // curve each round being O(n).
    val recallOn = sys.env.get("NND2_RECALL").contains("1")
    if (recallOn) {
      val rRounds = sys.env.getOrElse("NND2_ROUNDS", "2").toInt
      val rKWork = sys.env.getOrElse("NND2_KWORK", "8").toInt
      val rBucketW = sys.env.getOrElse("NND2_BUCKETW", "16").toInt
      val rSystems = sys.env.getOrElse("NND2_SYSTEMS", "4").toInt
      spark.catalog.clearCache(); Caches.releaseAll()
      val qStep = math.max(1L, nVec / 100)
      // residue guaranteed in range (r18 advice): pmod(id, qStep) === 3
      // selects ZERO queries whenever qStep <= 3 (NVEC < ~400) and the
      // soak would print a plausible-looking recall=0 line
      val qRes = math.min(3L, qStep - 1)
      val feats = Similarity.intFeatures(corpus)
      val q = feats.filter(pmod(col("vec_id"), lit(qStep)) === qRes)
        .select(col("vec_id").as("query_id"), col("f").as("qf"))
      val w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
      val exact = feats.join(broadcast(q), feats("vec_id") =!= q("query_id"))
        .withColumn("dist", expr("long_sqdist(qf, f)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 4)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val approx = Similarity
        .nnDescentIterEdges(corpus, kWork = rKWork, bucketW = rBucketW,
          rounds = rRounds, systems = rSystems)
        .filter(pmod(col("vec_id"), lit(qStep)) === qRes)
        .select(col("vec_id").as("query_id"), col("neighbor_id"))
      // Timed SEPARATELY (r18 advice): the old single 'wall=' conflated
      // the NN-Descent graph build with the brute-force truth
      // construction + match join — oracle-harness cost that no serving
      // deployment pays — skewing the recall-vs-cost curve the SOAK
      // notes quote. approx_wall prices the ANN chain; harness_wall the
      // truth/match scaffolding.
      val tA = System.nanoTime()
      val approxCached = approx.cache()
      approxCached.count()
      val wallApprox = (System.nanoTime() - tA) / 1e9
      val tT = System.nanoTime()
      val exactCached = exact.cache()
      val truthRows = exactCached.count()
      val matched = exactCached
        .join(approxCached, Seq("query_id", "neighbor_id")).count()
      val wallHarness = (System.nanoTime() - tT) / 1e9
      exactCached.unpersist(); approxCached.unpersist(); Caches.releaseAll()
      val recall = if (truthRows == 0) 0.0 else matched.toDouble / truthRows
      val empty = if (truthRows == 0) " NO_QUERIES_SAMPLED" else ""
      println(f"ANNSOAK ss23recall nvec=$nVec rounds=$rRounds kWork=$rKWork " +
        f"bucketW=$rBucketW systems=$rSystems nQueries=${truthRows / 4} " +
        f"truthRows=$truthRows matched=$matched recall=$recall%.4f " +
        f"approx_wall=$wallApprox%.2f harness_wall=$wallHarness%.2f$empty")
    }

    // frozen-index serving (st13's split): build + cache the index ONCE
    // outside the timed region, then serve ~NVEC/100 arriving queries
    val (nArr, wServe) =
      if (!baseOn) (0L, Seq.empty[Double])
      else {
        val (cents, assigned) = Similarity.trainedIvfIndex(corpus)
        val frozenC = cents.cache(); val frozenA = assigned.cache()
        frozenC.count(); frozenA.count()
        val arrivals = corpus.filter(col("vec_id") % 100 === 7)
        val na = arrivals.count()
        val ws = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.streaming.Stateful
            .ingestAnnTopK(arrivals, frozenC, frozenA, nprobe = 3, k = 10).count()
          (System.nanoTime() - t0) / 1e9
        }
        frozenC.unpersist(); frozenA.unpersist(); Caches.releaseAll()
        (na, ws)
      }

    def fmt(ws: Seq[Double]) = ws.map(w => f"$w%.2f").mkString(" ")
    val nndRows = (if (nnd) s" nnDescentEdges=$n22" else "") +
      (if (nnd2) s" nnDescentIterEdges=$n23" else "")
    val nndWalls = (if (nnd) s" ss22nnd=[${fmt(w22)}]" else "") +
      (if (nnd2) s" ss23nndIter=[${fmt(w23)}]" else "")
    println(s"ANNSOAK nvec=$nVec blobs=$blobs skew=$skew skipBase=${!baseOn} " +
      s"rowsBrute=$nBr rows18=$n18 " +
      s"rows19=$n19 rangeHits=$n20 knnEdges=$n21$nndRows servedQueries=$nArr")
    println(s"ANNSOAK walls brute5q=[${fmt(wBr)}] ss18e2e=[${fmt(w18)}] " +
      s"ss19e2e=[${fmt(w19)}] ss20range=[${fmt(w20)}] ss21knn=[${fmt(w21)}]$nndWalls " +
      s"serveFrozen${nArr}q=[${fmt(wServe)}]")

    try spark.stop() catch { case NonFatal(_) => () }
  }
}
