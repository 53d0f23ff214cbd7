package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables.table

/** Deterministic candidate-count metrics for the SOAK_r*.md tables
  * (diagnostic main, not driver contract). Wall clock on a shared box is
  * noisy; these counts are the exact, reproducible signal of how each
  * candidate stage scales with the corpus. Run once per soak dir:
  *
  *   runMain graft.SoakCounts <dir>
  */
object SoakCounts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-soak-counts")
    spark.sparkContext.setLogLevel("WARN")

    def p(name: String, v: Long): Unit = println(f"COUNT $name%-40s $v%12d")

    p("documents", table(spark, dir, "documents").count())
    p("postings_df16", Dedup.cappedPostings(spark, dir, 16L).count())
    p("pairs_df16 (dd05 edge input)", Dedup.cappedCandidatePairs(spark, dir, 16L).count())
    p("pairs_df2 (dd06 stage)", Dedup.cappedCandidatePairs(spark, dir, 2L).count())
    p("dd05_edges (jaccard >= 0.05)", Dedup.jaccardClusterEdges(spark, dir).count())
    p("simhash_cands (cap 512, hamming <= 12)",
      Dedup.simhashCandidates(
        table(spark, dir, "documents").select(col("doc_id"), col("text")),
        Dedup.defaultSimhashBucketCap).count())
    val n = table(spark, dir, "embeddings").count()
    val planes = Similarity.neardupPlanes(n)
    p(s"ss08_pairs (planes=$planes, uncapped)",
      Similarity.lshBlockedPairs(spark, dir, tables = 2, planes = planes)
        .select("id_a", "id_b").distinct().count())
    p(s"ss08_pairs (planes=$planes, cap 64)",
      Similarity.lshBlockedPairs(spark, dir, tables = 2, planes = planes,
        bucketCap = Similarity.defaultNeardupBucketCap)
        .select("id_a", "id_b").distinct().count())
    // tx10/tx12 decontamination: the flagged pair SETS must agree between
    // the string and hashed forms at every scale (collision check at
    // volume). A count compare would let compensating differences — one
    // pair gained via a collision, one lost through the shifted df cap —
    // pass silently; exceptAll both ways cannot.
    val tx10df = SparkEntry.queries("tx10_decontaminate")(spark, dir)
    val tx12df = SparkEntry.queries("tx12_decontaminate_hashed")(spark, dir)
    p("tx10_flagged_pairs", tx10df.count())
    p("tx12_flagged_pairs", tx12df.count())
    val diff = tx10df.exceptAll(tx12df).count() + tx12df.exceptAll(tx10df).count()
    p("tx10_vs_tx12_pair_set_diff", diff)
    if (diff != 0)
      println(s"WARN tx10/tx12 pair sets differ by $diff rows (hash collision or bug)")
    // dd09 (star contraction) must label EXACTLY like dd05 (one-hop
    // propagation) at soak scale, not just on the 500-doc gate corpus —
    // same exceptAll-both-ways discipline as tx10/tx12 above
    val dd05df = SparkEntry.queries("dd05_dup_clusters")(spark, dir)
    val dd09df = SparkEntry.queries("dd09_dup_clusters_logn")(spark, dir)
    p("dd05_labeled_nodes", dd05df.count())
    p("dd05_vs_dd09_label_diff",
      dd05df.exceptAll(dd09df).count() + dd09df.exceptAll(dd05df).count())
    // dd10 end-to-end fuzzy dedup: survivors and the stage cardinalities
    // that prove the LSH pruner's economics — candidates must stay near
    // the verified-edge count (precision), never approach all-pairs.
    val sigs = Dedup.fuzzySigs(table(spark, dir, "documents"))
    val dd10cand = Dedup.fuzzyCandidatePairs(sigs).count()
    p("dd10_lsh_candidates", dd10cand)
    p("dd10_survivors",
      SparkEntry.queries("dd10_fuzzy_dedup")(spark, dir).count())
    // dd12 exact substring dedup: the exchange carries ~one row per corpus
    // token (window count), and dup windows / cut tokens track PLANTED
    // duplication — on an organic corpus they must stay far below the
    // window total (a dup_windows ≈ windows reading would mean the corpus
    // is boilerplate or the window hash collided).
    val dd12 = SparkEntry.queries("dd12_substring_dedup")(spark, dir)
      .agg(sum(col("n_windows")).as("w"), sum(col("n_dup_windows")).as("d"),
        sum(when(col("n_cut_spans") > 0, 1L).otherwise(0L)).as("c"),
        sum(col("n_cut_tokens")).as("t"))
      .head()
    p("dd12_windows", dd12.getLong(0))
    p("dd12_dup_windows", dd12.getLong(1))
    p("dd12_docs_with_cuts", dd12.getLong(2))
    p("dd12_cut_tokens", dd12.getLong(3))
    // tx22 NB filter: how much of the held-out fold the classifier calls
    // curated, and the OOV volume (its confidence denominator), at scale.
    val tx22 = SparkEntry.queries("tx22_nb_source_score")(spark, dir)
      .agg(count(lit(1)).as("n"), sum(col("pred_curated").cast("long")).as("p"),
        sum(col("n_unseen").cast("long")).as("u"))
      .head()
    p("tx22_scored_docs", tx22.getLong(0))
    p("tx22_pred_curated", tx22.getLong(1))
    p("tx22_unseen_tokens", tx22.getLong(2))
    spark.catalog.clearCache(); Caches.releaseAll()
    // SemDeDup survivor counts: NEITHER survivor set dominates the other —
    // both are supersets of the exact-survivor floor (neither blocker
    // over-drops, per SimilaritySpec), but each can drop a survivor the
    // other keeps: ss10's cells compare a cos>0.3 pair whose endpoints
    // share a centroid cell that ss11's LSH tables may never collide, and
    // vice versa. The overlap fraction (|A∩B|/|A∪B| over survivor vec_ids)
    // carries the AGREEMENT signal at scale, which raw cardinalities
    // can't: two counts moving together could still be disjoint sets.
    val ss10df = SparkEntry.queries("ss10_semantic_dedup")(spark, dir).select("vec_id")
    val ss11df = SparkEntry.queries("ss11_lsh_semantic_dedup")(spark, dir).select("vec_id")
    val n10 = ss10df.count(); val n11 = ss11df.count()
    p("ss10_survivors", n10)
    p("ss11_survivors", n11)
    val inter1011 = ss10df.intersect(ss11df).count()
    val union1011 = n10 + n11 - inter1011
    p("ss10_and_ss11_survivors", inter1011)
    println(f"COUNT ${"ss10_vs_ss11_overlap_frac"}%-40s ${
      if (union1011 == 0) 1.0 else inter1011.toDouble / union1011}%12.4f")
    // Jaccard overlap MUST fall as the corpus grows (ss10's fixed-k cells
    // saturate survivors while ss11's tracks the corpus, so |A|<<|B|);
    // the agreement signal is CONTAINMENT of the saturated set — what
    // fraction of ss10's survivors ss11 also keeps.
    println(f"COUNT ${"ss10_in_ss11_containment"}%-40s ${
      if (n10 == 0) 1.0 else inter1011.toDouble / n10}%12.4f")
    // refusal counters accumulated by the capped stages above — on the
    // zipfian cuts these record the boilerplate head the df cap trims
    // while the unique tail carries the flagged pairs (SOAK note 1)
    graft.operators.Layout.refusedRows.toSeq.sortBy(_._1).foreach {
      case (tag, n) => p(s"refused[$tag]", n)
    }
    spark.stop()
  }
}
