package graft

/** Automated census over EVERY declared query's physical plan at sf0.001 —
  * the scale guard the README asserts: no accidental cartesian products,
  * and nested-loop joins only where a broadcast cross join is the
  * intentional algorithm. A new query that trips this either gets a real
  * join key or an explicit entry here with a reason. */
class PlanCensusSpec extends SparkSpec {

  // Intentional BroadcastNestedLoopJoin sites: tiny-side cross joins whose
  // cost is |small| * |large| by design (exact top-k baseline, centroid
  // assignment, 15-row dimension cross).
  private val allowedBnlj = Set(
    "q25_cross_join", // region x order-status: 5 x 3 rows
    "ss01_cosine_topk", // exact brute-force baseline (ANN paths replace it)
    "ss05_ivf_ann", // corpus x 10 broadcast centroids
    "ss10_semantic_dedup", // same corpus x 10 broadcast centroid assignment
    "tx18_unigram_logprob", // vocab x ONE broadcast row (the corpus total)
    "tx20_bigram_logprob", // same 1-row corpus total on the unigram side
    "tx21_backoff_heldout", // 1-row TRAIN-fold total under the backoff base score
    "tx22_nb_source_score", // 1-row (Tt, Tb, V) NB totals on the scoring side
    "tx23_dsir_score", // two 1-row totals (target T, raw R) under the bucket ratios
    "ss12_sq8_ann", // 1-row quantization grid + the ss01-style broadcast query fanout
    "ss13_ivf_sq8_ann", // ss05's broadcast centroid assignment + the 1-row grid
    "tx29_ppl_buckets", // 1-row broadcast tercile thresholds under the bucket CASE
    "ss14_kmeans", // corpus x ONE broadcast row holding all k centroids (per Lloyd round)
    "ss15_cluster_sample", // ss14's assignment inherited under the per-cluster rank
    // ss16_kcenter_seeds left the list in r19: each pick's corpus x
    // one-broadcast-row cross now sits below that pick's lazy
    // localCheckpoint, so the census sees the truncated plan (the ss22
    // precedent in this list; the crosses still run at materialization)
    "ss18_ivf_trained_ann", // ss14's Lloyd rounds + the query-side probe rank, each vs the one-row centroid pack
    "ss19_ivfpq_trained_ann", // ss18's Lloyd + probe cross joins, inherited under the PQ encode/ADC equi-joins
    "ss20_range_search", // ss14's Lloyd rounds + the query x one-row centroid pack under the prune bound
    "st13_ann_serving", // the offline index half (ss14's Lloyd) — the SERVING side joins on a constant key, streaming-legal
    "ss21_knn_graph", // ss14's Lloyd rounds vs the one-row centroid pack; the pair join itself is a cell equi-join
    // ss22_nn_descent left the list in r19: its seed (which inherited
    // ss21's Lloyd-vs-centroid-pack crosses) is now behind a lazy
    // localCheckpoint, so the census sees the truncated plan — the
    // crosses still run at materialization time but belong to the same
    // audited one-row-broadcast family as ss21's
    "qp05_curation_manifest") // ss14's Lloyd rounds + assignment, each vs the one-row centroid pack; the prune itself is a cell equi-join
  // ss17_kmeanspar_seeds runs its corpus-x-broadcast-candidate-row passes
  // EAGERLY inside the builder (the weighted reduction collects the
  // KB-scale candidate set, PQ-codebook precedent), so its returned frame
  // is a local relation and the census sees no BNLJ — its scan shape is
  // pinned by the ss17 scaladoc + SimilaritySpec instead.

  // Queries whose count() plan legally collapses (Catalyst eliminates
  // cardinality-preserving windows / unique-key outer joins under a bare
  // count) — the bench times these with the materializing action
  // (BenchAction). Pinned so a NEW query can't silently regress into
  // skeleton benching: trip this and either the final stage really is
  // count-prunable (add it here — the bench handles it automatically) or
  // the query lost a stage it was supposed to keep.
  private val knownCollapsed = Set(
    "aj01_asof_backward", "dd12_substring_dedup", "e15_forward_fill",
    "q08_running_window", "q23_corr_scalar_subquery", "q30_rank_family",
    // q40's windows are cardinality-preserving like q30's — eliminated
    // under a bare count
    "q40_window_extras",
    "q33_range_frame", "qp01_training_manifest", "rj01_time_range_join",
    "tx14_pack_sequences", "tx16_pack_subword", "tx19_shuffle_shards",
    // tx37 is tx19 at the 2-nibble shard width — same cardinality-
    // preserving rank window, same legal collapse under a bare count
    "tx37_shuffle_shards_wide",
    "tx20_bigram_logprob", "tx21_backoff_heldout", "tx22_nb_source_score",
    // the r11 evidence twins end in LEFT joins on unique keys, which
    // Catalyst eliminates under a bare count exactly like their score
    // siblings (tx18e's joins are inner — it does not collapse)
    "tx20e_bigram_evidence", "tx21e_backoff_evidence", "tx22e_nb_evidence",
    // dd14's rank window + left policy join drop under a bare count too
    "dd14_policy_cut",
    // dd15's final is docs LEFT JOIN a unique-key host aggregate — the
    // dd12/tx-twin pattern, eliminated under a bare count
    "dd15_contained_docs",
    // tx23/tx23e: column pruning under a bare count drops the aggregate
    // outputs, leaving their unique-key ratio/target joins unreferenced —
    // Catalyst then eliminates them like the tx2x siblings above
    "tx23_dsir_score", "tx23e_dsir_evidence",
    // tx29: under a bare count the bucket CASE prunes away, leaving the
    // guaranteed-1-row threshold aggregate's cross join unreferenced —
    // Catalyst eliminates it like the tx2x 1-row corpus totals above
    "tx29_ppl_buckets",
    // tx33's final is docs LEFT-joined to two unique-doc_id aggregates
    // (top-gram counts, dup-5-gram coverage) — both eliminated under a
    // bare count like the twins above
    "tx33_gopher_repetition",
    // qp02 ends in the same shard-rank window as qp01/tx19
    "qp02_multilingual_manifest",
    // qp06 ends in the same shard-rank window as qp01/qp02/tx19
    "qp06_gopher_manifest",
    // dd16's final is per-source aggregates LEFT-joined on the unique
    // source key — eliminated under a bare count like the twins above
    "dd16_index_stats",
    // dd17 ends in dd12's unique-doc_id LEFT-join pattern; dd18 in
    // dd16's unique-source one — both eliminated under a bare count
    "dd17_incremental_substring", "dd18_batch_novelty",
    // qp03/qp04 end in the qp01/tx19 shard-rank window (collapsed like
    // their siblings; the trailing token-count joins prune with it)
    "qp03_incremental_manifest", "qp04_decontaminated_manifest",
    // dd19 shares dd16's unique-source LEFT-join final
    "dd19_refreshed_stats",
    // qp07's final is the eval roster LEFT-joined to two unique-key
    // aggregates (leak, fuzzy) whose outputs all prune under a bare
    // count — eliminated like the dd16/dd19 twins above
    "qp07_eval_screen",
    // qp08's final is the rank-1 evidence rows LEFT-joined to the
    // distinct dropped-id set — the verdict CASE prunes under a bare
    // count and the unique-key join is eliminated like the twins above
    "qp08_graph_dedup_manifest",
    // tx30 ends in the dd12-family shape (span aggregate joined to the
    // unique-doc_id sidecar, ratio projection on top) — the projection
    // prunes under a bare count and the plan collapses like dd12's; the
    // bench times it with the materializing action
    "tx30_substring_decontam")

  test("no cartesian products; nested-loop joins only where intended") {
    val plans = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf001).queryExecution.executedPlan.toString
    }
    val cartesian = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")
    val badBnlj = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !allowedBnlj(n) => n
    }
    assert(badBnlj.isEmpty, s"unexpected nested-loop joins in: $badBnlj")
    // and the allowlist itself stays honest: entries that stop using BNLJ
    // should be removed
    val stale = allowedBnlj -- plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    assert(stale.isEmpty, s"allowlist entries no longer BNLJ: $stale")
  }

  // Intentional BNLJ sites BELOW lazy localCheckpoint boundaries, by
  // [[graft.Ckpt]] tag — the compensating census the r19 ADVICE asked
  // for: the main census above reads final physical plans and is blind
  // below every checkpoint leaf (ss16/ss22 left `allowedBnlj` in r19 for
  // exactly that reason), so this audits the PRE-checkpoint subtrees the
  // builders register under -Dgraft.census.capture. All entries are the
  // same audited one-row-broadcast family as the visible allowlist:
  // corpus x one broadcast row of packed centroids/seeds/candidates.
  private val allowedCkptBnlj = Set(
    "lloyd.round", // corpus x ONE broadcast centroid-pack row per Lloyd round
    "nnDescent.seed", // ss22's seed inherits ss21's Lloyd/centroid crosses
    "kcenter.seeds", // each pick: corpus x one broadcast seed row (ss16)
    "kmeanspar.cands") // each pass: corpus x one broadcast candidate row (ss17)

  test("pre-checkpoint subtrees carry no cartesian/unintended BNLJ (census below the truncation)") {
    sys.props("graft.census.capture") = "true"
    try {
      Ckpt.drainCaptured() // drop frames captured by earlier tests' builds
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        fn(spark, sf001) // building registers every checkpointed subtree
      }
      val frames = Ckpt.drainCaptured()
      assert(frames.nonEmpty, "capture flag on but no checkpointed frames registered")
      val plans = frames.map { case (tag, df) =>
        tag -> df.queryExecution.executedPlan.toString
      }
      val cartesian = plans.collect {
        case (t, p) if p.contains("CartesianProduct") => t }
      assert(cartesian.isEmpty, s"cartesian products below checkpoints: $cartesian")
      val badBnlj = plans.collect {
        case (t, p) if p.contains("BroadcastNestedLoopJoin") && !allowedCkptBnlj(t) => t }
      assert(badBnlj.isEmpty, s"unexpected nested-loop joins below checkpoints: $badBnlj")
      // the tag allowlist stays honest too
      val stale = allowedCkptBnlj -- plans.collect {
        case (t, p) if p.contains("BroadcastNestedLoopJoin") => t }.toSet
      assert(stale.isEmpty, s"checkpoint allowlist entries no longer BNLJ: $stale")
    } finally {
      sys.props.remove("graft.census.capture")
      graft.Caches.releaseAll()
    }
  }

  test("count-plan collapse set is exactly the pinned list (bench action honesty)") {
    val collapsed = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if BenchAction.countCollapses(fn(spark, sf001)) => name
    }.toSet
    graft.Caches.releaseAll() // plan builds above register builder caches
    assert(collapsed == knownCollapsed,
      s"new collapsed: ${collapsed -- knownCollapsed}; " +
        s"no longer collapsed: ${knownCollapsed -- collapsed}")
  }
}
