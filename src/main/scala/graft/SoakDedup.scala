package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchExprs
import graft.operators.Dedup

/** Fuzzy-dedup family soak (diagnostic main, not driver contract — the
  * dd-family analogue of [[SoakAnn]], r18 verdict optional #7). The sf
  * dirs top out at ~500 documents — enough to prove dd10/dd11's
  * gate-scale recall-1 license but silent on what the banded-LSH
  * S-curve actually buys at corpus scale — so this main synthesizes a
  * DETERMINISTIC ~100k-doc corpus with PLANTED near-duplicates at a
  * known perturbation rate (no rand(): per-(doc, position) words via
  * integer hashing, twins replace a fixed residue class of positions,
  * so reruns are bit-identical) and sweeps the (bands × rows) knob at
  * fixed signature budget k = bands·rows, measuring per config:
  *
  *  - candidate pairs out of the banded bucket join (the blocking cost
  *    a config spends),
  *  - verified edges (exact jaccard ≥ 0.7 — precision is structurally 1
  *    post-verify, so candidates/verified is the wasted-verification
  *    ratio),
  *  - RECALL against the planted truth: the planted pairs whose EXACT
  *    shingle-hash jaccard is ≥ 0.7 (computed pair-local — a linear
  *    join on the planted ids, never all-pairs) that the verified edge
  *    set recovers. The S-curve p = 1-(1-j^rows)^bands predicts it;
  *    the soak measures it.
  *
  * Corpus: `NDOC` base docs of 60 words from a 5,000-word integer-hash
  * vocabulary; every 10th doc gets a NEAR twin (every 20th word
  * replaced → ~15 % of 3-shingles destroyed → jaccard ≈ 0.74, just
  * above the 0.7 threshold — the hard case for a band config) and
  * every-10th-plus-one a FAR twin (every 4th word replaced → j ≈ 0.14,
  * must NOT be flagged). CLEAR + min-of-reps protocol as in the other
  * soak mains. Run: NDOC=80000 REPS=1 runMain graft.SoakDedup
  * (defaults sweep (16,4)/(8,8)/(32,2) at k=64). */
object SoakDedup {
  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("NDOC", "80000").toLong
    val reps = sys.env.getOrElse("REPS", "1").toInt
    val spark = Sessions.build("graft-soak-dedup")
    spark.sparkContext.setLogLevel("WARN")

    val W = 60
    val V = 5000
    def wordAt(idExpr: String, keep: String): String =
      // position p's word for doc `idExpr`; positions matching `keep`
      // come from the base vocab ('w...'), others from a disjoint
      // perturbation vocab ('x...') that shares no shingle with base.
      // Murmur3 hash(id, p) mixing, NOT a linear congruence: word(p) =
      // (id·C + p·D) mod V gives every doc the same step D mod V, so
      // docs whose id gap lands near a small multiple of the step are
      // SHIFTED copies (the first cut measured 8k spurious j≥0.7 pairs
      // at 2.4k docs — an arithmetic artifact, not a corpus property)
      s"""IF($keep,
         |  concat('w', pmod(hash($idExpr, p), $V)),
         |  concat('x', pmod(hash($idExpr, p, 7), $V)))""".stripMargin
    def textExpr(idExpr: String, keep: String) =
      expr(s"concat_ws(' ', transform(sequence(0, ${W - 1}), p -> ${wordAt(idExpr, keep)}))")

    val base = spark.range(nBase)
      .select(col("id").as("doc_id"), textExpr("id", "true").as("text"))
    // NEAR twin of doc i (i % 10 == 0): id = nBase + i, every 20th word
    // perturbed — 3 of each replaced word's 3-shingles die, ~15 % of the
    // shingle set, j = (1-d)/(1+d) ≈ 0.74
    val near = spark.range(nBase).filter(pmod(col("id"), lit(10)) === 0)
      .select((col("id") + nBase).as("doc_id"),
        textExpr("id", "pmod(p, 20) != 5").as("text"))
    // FAR twin of doc i (i % 10 == 1): every 4th word perturbed, j ≈ 0.14
    val far = spark.range(nBase).filter(pmod(col("id"), lit(10)) === 1)
      .select((col("id") + 2 * nBase).as("doc_id"),
        textExpr("id", "pmod(p, 4) != 1").as("text"))
    val corpus = graft.Caches.track(base.union(near).union(far))
    val nDocs = corpus.count()

    // planted pair frames (id_a = base doc, id_b = twin)
    val nearPairs = spark.range(nBase).filter(pmod(col("id"), lit(10)) === 0)
      .select(col("id").as("id_a"), (col("id") + nBase).as("id_b"))
    val farPairs = spark.range(nBase).filter(pmod(col("id"), lit(10)) === 1)
      .select(col("id").as("id_a"), (col("id") + 2 * nBase).as("id_b"))

    // exact jaccard of the planted pairs — pair-local (one join per
    // side on the planted ids), the linear truth construction
    def plantedJaccard(pairs: DataFrame, sigs: DataFrame): DataFrame =
      pairs
        .join(sigs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter",
          SketchExprs.sortedLongIntersectCount(col("sh_a"), col("sh_b")))
        .withColumn("j",
          col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .select("id_a", "id_b", "j")

    val sweep: Seq[(Int, Int)] = sys.env.get("DDSOAK_CONFIGS")
      .map(_.split(";").toSeq.map { s =>
        val Array(b, r) = s.split("x"); (b.toInt, r.toInt)
      })
      .getOrElse(Seq(16 -> 4, 8 -> 8, 32 -> 2))

    sweep.foreach { case (bands, rows) =>
      val k = bands * rows
      val walls = (1 to reps).map { _ =>
        spark.catalog.clearCache(); Caches.releaseAll()
        val t0 = System.nanoTime()
        val sigs = graft.Caches.track(Dedup.fuzzySigs(corpus, k))
        val cands = graft.Caches.track(Dedup.fuzzyCandidatePairs(sigs, bands, rows))
        val nCand = cands.count()
        val verified = graft.Caches.track(cands
          .join(sigs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sigs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("inter",
            SketchExprs.sortedLongIntersectCount(col("sh_a"), col("sh_b")))
          .filter(col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter"))
            >= 0.7)
          .select("id_a", "id_b"))
        val nVer = verified.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // truth + recall, OUTSIDE the timed region (oracle scaffolding,
        // the SoakAnn harness_wall discipline)
        val nearJ = graft.Caches.track(plantedJaccard(nearPairs, sigs))
        val truthNear = nearJ.filter(col("j") >= 0.7).count()
        val nearHit = nearJ.filter(col("j") >= 0.7)
          .join(verified, Seq("id_a", "id_b")).count()
        val farFlagged = plantedJaccard(farPairs, sigs)
          .join(verified, Seq("id_a", "id_b")).count()
        val jMean = nearJ.agg(avg("j")).collect()(0).getDouble(0)
        println(f"DDSOAK cfg=${bands}x$rows k=$k nDocs=$nDocs cand=$nCand " +
          f"verified=$nVer truthNear=$truthNear recall=${
            if (truthNear == 0) -1.0 else nearHit.toDouble / truthNear}%.4f " +
          f"farFlagged=$farFlagged plantedJMean=$jMean%.3f wall=$wall%.2f")
        wall
      }
      println(f"DDSOAK cfg=${bands}x$rows walls=[${walls.map(w => f"$w%.2f").mkString(" ")}]")
    }
    try spark.stop() catch { case NonFatal(_) => () }
  }
}
