package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the old river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar execution plans"),
    (4L, "the quick brown fox jumps over the lazy dog near the old river bank today")) // exact dup of 1
    .toDF("doc_id", "text")

  test("shingles: distinct word 3-grams") {
    val sh = docs.filter($"doc_id" === 1)
      .select(Dedup.shingles("text").as("sh")).collect()(0).getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.contains("lazy dog near"))
    // 14 words → 12 shingles, all distinct here except repeated "the ..." patterns stay distinct
    assert(sh.length == sh.distinct.length)
  }

  test("minhash estimate tracks exact jaccard") {
    val sig = docs.select($"doc_id", Dedup.shingles("text").as("sh"))
      .withColumn("sig", Dedup.minhashSig("sh", 64))
    val rows = sig.collect().map(r => r.getLong(0) ->
      (r.getSeq[String](1).toSet, r.getSeq[Long](2))).toMap
    def exact(a: Long, b: Long) = {
      val (sa, sb) = (rows(a)._1, rows(b)._1)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    def est(a: Long, b: Long) = {
      val (za, zb) = (rows(a)._2, rows(b)._2)
      za.zip(zb).count { case (x, y) => x == y }.toDouble / za.length
    }
    assert(est(1, 4) == 1.0) // identical docs → identical signatures
    assert(math.abs(est(1, 2) - exact(1, 2)) < 0.25) // 64 hashes → coarse but close
    assert(est(1, 3) < 0.2 && exact(1, 3) < 0.05) // unrelated docs
  }

  test("simhash: identical docs equal; near-dups within small hamming distance") {
    val sh = docs.select($"doc_id", $"text")
      .withColumn("s", Dedup.simhash("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sh(1) == sh(4))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1), sh(2)) <= 16)
    assert(hamming(sh(1), sh(3)) > hamming(sh(1), sh(2)))
  }

  test("dd08's bloom-prefiltered dedup equals dd07 bit-for-bit") {
    val dd07 = Dedup.queries("dd07_incremental_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dd08 = Dedup.queries("dd08_bloom_incremental")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dd08 == dd07,
      s"bloom prefilter changed the result: ${dd08.size} vs ${dd07.size} rows")
  }

  test("the bloom pre-filter shrinks the anti-join input to dups + fpp") {
    // replicate dd08's flagging stage and measure its selectivity: only
    // true cross-half duplicates and ~fpp false positives may pass. The
    // whole point of the operator is that the exact anti-join's left side
    // is this small set, not the entire batch.
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => C, expression => E}
    val d = graft.sources.Tables.table(spark, sf001, "documents")
      .select($"doc_id", md5(lower(trim($"text")).cast("binary")).as("fp"))
    val existing = d.filter($"doc_id" % 2 === 0)
    val batch = d.filter($"doc_id" % 2 === 1)
    val bfAgg = C(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(E(xxhash64($"fp")),
        E(lit(1000000L)), E(lit(8000000L))).toAggregateExpression())
    val sketch = existing.agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mc = C(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      E(lit(sketch)), E(xxhash64($"fp"))))
    val batchN = batch.count()
    val flaggedN = batch.filter(mc).count()
    val trueDups = batch.join(existing.select("fp"), Seq("fp"), "left_semi").count()
    info(s"batch $batchN rows, flagged $flaggedN, true cross-half dups $trueDups")
    assert(flaggedN >= trueDups, "bloom must never miss a real duplicate (no false negatives)")
    assert(flaggedN <= trueDups + math.max(5L, (0.05 * batchN).toLong),
      s"pre-filter passed $flaggedN of $batchN — fpp far above the sizing target")
  }

  test("shingle df cap shrinks the candidate-pair set (dd06 skew guard)") {
    val uncapped = Dedup.cappedCandidatePairs(spark, sf001, Long.MaxValue).count()
    val capped = Dedup.cappedCandidatePairs(spark, sf001, 2L).count()
    info(s"candidate pairs: uncapped $uncapped, df<=2 $capped")
    assert(capped < uncapped,
      s"cap removed nothing: $capped vs $uncapped")
    // The capped query still surfaces near-dup pairs on the real testdata.
    assert(Dedup.queries("dd06_capped_jaccard")(spark, sf001).count() > 0)
  }

  test("capped jaccard agrees with uncapped when no shingle exceeds the cap") {
    val tmp = java.nio.file.Files.createTempDirectory("dedupcap").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // Doc 1 and 4 are identical, so their shingles have df 2..3; with a cap
    // of 3 nothing is dropped and dd06 must agree pairwise with dd03's
    // uncapped jaccard on the shared pairs above dd06's lower threshold.
    val capped = Dedup.cappedCandidatePairs(spark, tmp, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val uncapped = Dedup.cappedCandidatePairs(spark, tmp, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(capped == uncapped)
    // With cap 1, the duplicated docs' shared shingles (df >= 2) all drop,
    // so pair (1,4) loses its entire intersection.
    val cap1 = Dedup.cappedCandidatePairs(spark, tmp, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cap1.contains((1L, 4L)))
  }

  test("simhash bucket cap bounds candidates under a templated corpus (dd04 skew guard)") {
    import org.apache.spark.sql.functions.col
    // Adversarial template corpus: 120 byte-identical docs → identical
    // simhash → ALL of them share every (band, chunk) bucket. Uncapped,
    // candidate generation is C(120,2) pairs — the k² hot-key explosion.
    val tmpl = spark.range(120).select(col("id").as("doc_id"),
      lit("identical boilerplate disclaimer repeated on every crawled page " +
        "of this templated site with no organic variation at all").as("text"))
    // plus one organic near-dup pair that must still surface
    val organic = docs.filter($"doc_id".isin(1, 2))
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val corpus = tmpl.unionByName(organic)
    val uncapped = Dedup.simhashCandidates(corpus, Long.MaxValue)
    assert(uncapped.count() >= 120L * 119 / 2) // the explosion is real
    val capped = Dedup.simhashCandidates(corpus, 16L)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot template block is refused wholesale (dd01 exact-dedup is the
    // operator that handles identical docs), the organic pair survives
    assert(cappedPairs == Set((1001L, 1002L)),
      s"expected only the organic near-dup pair, got ${cappedPairs.size} pairs")
  }

  test("dd04 bucket cap leaves the organic corpus unchanged") {
    val organicDocs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    def pairs(cap: Long) = Dedup.simhashCandidates(organicDocs, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(Dedup.defaultSimhashBucketCap) == pairs(Long.MaxValue))
  }

  test("minhash LSH query finds the near-dup pair without a cartesian join") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.queries("dd02_minhash_lsh")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, est) => a == 1 && b == 4 && est == 1.0 })
    assert(pairs.exists { case (a, b, est) => a == 1 && b == 2 && est > 0.5 })
  }

  test("dd09's star contraction handles a diameter-100 chain in O(log n) rounds") {
    // The exact corpus shape that breaks one-hop propagation: a path graph
    // needs diameter-many one-hop rounds (dd05 with maxIter 64 would FAIL
    // on this input — correctly, loudly), while star contraction halves
    // component height per round. maxIter 16 >> log2(101) proves the
    // log-round claim with margin; the labels must be the exact component
    // min for every node.
    val chain = (0L until 101L).sliding(2)
      .map { case Seq(a, b) => (a, b) }.toSeq.toDF("id_a", "id_b")
    val labels = Dedup.propagateMinLabelsLogN(chain, maxIter = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 101 && labels.forall(_._2 == 0L))
  }

  test("dd09 labels equal dd05 labels on random multi-component graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // ~3 loose clusters + isolated pairs; ids spread so component mins
      // are nontrivial
      val edges = (1 to 120).map { _ =>
        val base = rng.nextInt(3) * 1000
        val a = base + rng.nextInt(40)
        val b = base + rng.nextInt(40)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("id_a", "id_b")
      val viaHops = Dedup.propagateMinLabels(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caches.releaseAll()
      val viaStars = Dedup.propagateMinLabelsLogN(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStars == viaHops, s"trial $trial: label maps diverged")
    }
  }

  test("both CC forms share one contract on self-loops: dropped, including self-loop-only nodes") {
    // Self-loops carry no connectivity information. Before r9 the two
    // public CC methods disagreed on them: the logN form filtered hi != lo
    // up front (self-loop-only node vanishes) while one-hop propagation
    // labeled it with itself. Both now drop self-loops on entry, so on
    // ARBITRARY input — not just the id_a < id_b edges the query path
    // builds — the methods stay interchangeable: node 7 (self-loop only)
    // appears in NEITHER output; node 1's self-loop doesn't perturb its
    // component label.
    val edges = Seq((1L, 1L), (1L, 2L), (7L, 7L), (3L, 4L)).toDF("id_a", "id_b")
    val viaHops = Dedup.propagateMinLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.releaseAll()
    val viaStars = Dedup.propagateMinLabelsLogN(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaHops == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    assert(viaStars == viaHops)
  }

  test("dd10 survivors: near-dup chain collapses to its min, unique doc kept") {
    // docs: 1≈2 (one word differs, j≈0.85), 1=4 (exact), 3 unique →
    // one cluster {1,2,4} keeps 1, plus the unrelated 3.
    val kept = Dedup.fuzzyDedupSurvivors(docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("dd10's LSH candidates cover the all-pairs j >= 0.7 truth at gate scale") {
    // THE license for dd10's hash-exact oracle (the exact transitive
    // closure over all-pairs j >= 0.7 edges): at the correctness gate's
    // corpus, banded-LSH recall must be exactly 1 — every true near-dup
    // pair is some band's bucket collision. All-pairs here is the O(n²)
    // oracle shape, affordable once at spec scale, never in the engine.
    val gate = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val d = Dedup.fuzzySigs(gate).cache()
    val a = d.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = d.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    val truth = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("inter",
        graft.functions.SketchExprs.sortedLongIntersectCount($"sh_a", $"sh_b"))
      .filter($"inter" / (size($"sh_a") + size($"sh_b") - $"inter") >= 0.7)
      .select("id_a", "id_b")
    val cand = Dedup.fuzzyCandidatePairs(d)
    val missed = truth.exceptAll(cand).count()
    val nTruth = truth.count()
    d.unpersist()
    assert(nTruth > 0, "gate corpus must contain j >= 0.7 near-dup pairs")
    assert(missed == 0, s"LSH missed $missed of $nTruth true pairs")
  }

  test("dd20's production banding (k=128, 32x4) also covers the truth; survivors equal dd10's") {
    // dd20's oracle license (SOAK_r19 §2's clean production point,
    // declared the way ss24 declared the ANN scale profile): at the
    // gate corpus the 32 × 4 banding over 128 minhashes must reach
    // recall 1 vs the all-pairs j >= 0.7 truth — the S-curve reads
    // 0.9998 at j = 0.7 vs the 16 × 4 default's 0.988 — and at recall
    // 1 ANY banding's survivors are the exact all-pairs survivors, so
    // dd20 must equal dd10 row-for-row even though every blocking
    // stage (signature width, band explosion, bucket keys) differs.
    val sfDir = "/root/testdata/sf0.01"
    val gate = graft.sources.Tables.table(spark, sfDir, "documents")
    val d = Dedup.fuzzySigs(gate, k = 128).cache()
    val a = d.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = d.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    val truth = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("inter",
        graft.functions.SketchExprs.sortedLongIntersectCount($"sh_a", $"sh_b"))
      .filter($"inter" / (size($"sh_a") + size($"sh_b") - $"inter") >= 0.7)
      .select("id_a", "id_b")
    val cand = Dedup.fuzzyCandidatePairs(d, bands = 32, rows = 4)
    val missed = truth.exceptAll(cand).count()
    val nTruth = truth.count()
    d.unpersist()
    assert(nTruth > 0, "gate corpus must contain j >= 0.7 near-dup pairs")
    assert(missed == 0, s"wide LSH missed $missed of $nTruth true pairs")
    val dd10 = Dedup.queries("dd10_fuzzy_dedup")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val dd20 = Dedup.queries("dd20_fuzzy_dedup_wide")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(dd20 == dd10, "recall-1 bandings must emit identical survivor sets")
    graft.Caches.releaseAll()
  }

  test("dd11 ingest rule: existing-dup batch docs drop, batch-only chains keep their min") {
    // existing (even): 2, 4, 6; batch (odd): 1, 3, 5, 7, 9.
    //  - 1 near-dups existing 2         -> dropped (canonical in corpus)
    //  - 3 ~ 5 (batch-only pair)        -> 3 kept, 5 dropped
    //  - 7 ~ 4 via nothing, unique      -> kept
    //  - 9 ~ 3 AND 3 ~ 5: component {3,5,9}, no existing -> only 3 kept
    val base = "the quick brown fox jumps over the lazy dog near the old river bank"
    val alt = "completely different content about spark query engines and columnar execution"
    val third = "unrelated third topic entirely about cooking recipes and kitchen utensils today"
    val tmp = java.nio.file.Files.createTempDirectory("dd11").toString
    Seq(
      (1L, base + " today"), (2L, base + " today"), // batch 1 = existing 2
      (3L, alt + " plans"), (5L, alt + " plan"), (9L, alt + " plans"), // batch-only cluster
      (4L, third), (6L, third + " and pans"), // existing-only near-dups (untouched)
      (7L, "a lone singleton batch document with words shared by absolutely nothing else here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val kept = Dedup.queries("dd11_incremental_fuzzy")(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L), s"got $kept")
    // r12: the persisted index holds the CORPUS ONLY (even doc_ids) — the
    // batch side computes its signatures at query time, so an index row
    // with an odd doc_id means the per-run plan is again skipping the one
    // cost a real ingest pays (its own signature scan).
    val idx = Dedup.dd11IndexPath(spark, tmp)
    for (part <- Seq("bands", "sh")) {
      val odd = spark.read.parquet(s"$idx/$part")
        .filter($"doc_id" % 2 === 1).count()
      assert(odd == 0, s"dd11 index $part holds $odd batch rows")
    }
    graft.Caches.releaseAll()
  }

  test("dd12 substring dedup: cross-doc windows flagged, first occurrence kept, overlaps merge") {
    // K = 8. shared10 recurs in docs 1/2 (and its first 8 words again in
    // doc 4); marker8 recurs in docs 3/4; doc 5 is too short to window.
    val shared10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tail1 = "kilo lima mike november oscar papa quebec romeo"
    val head2 = "sierra tango uniform victor whiskey xray yankee zulu"
    val marker8 = "mango nectar olive peach quince radish squash turnip"
    val filler8 = "ash birch cedar elm fir hazel maple oak"
    val tmp = java.nio.file.Files.createTempDirectory("dd12").toString
    Seq(
      (1L, s"$shared10 $tail1"), // 18 words; shared10 at tokens 1-10
      (2L, s"$head2 $shared10"), // 18 words; shared10 at tokens 9-18
      (3L, marker8), // exactly one window
      (4L, s"${shared10.split(' ').take(8).mkString(" ")} $filler8 $marker8"), // 24 words
      (5L, "tiny doc")) // < K tokens: zero windows
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dd12_substring_dedup")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    // doc 1: 3 dup windows (shared10's fully-contained positions 1-3) but it
    // IS the canonical occurrence for all three hashes -> nothing cut.
    assert(out(1L) == ((11, 3, 0, 0, Some(3.0 / 11))), s"doc1: ${out(1L)}")
    // doc 2: the same 3 hashes at positions 9-11, all non-canonical; the
    // overlapping windows merge into ONE span cutting the 10 shared tokens.
    assert(out(2L) == ((11, 3, 1, 10, Some(3.0 / 11))), s"doc2: ${out(2L)}")
    // doc 3: its single window recurs in doc 4, but doc 3 is canonical.
    assert(out(3L) == ((1, 1, 0, 0, Some(1.0))), s"doc3: ${out(3L)}")
    // doc 4: two non-adjacent flagged windows (pos 1 = shared10's head seen
    // in docs 1/2, pos 17 = marker8 seen in doc 3) -> TWO spans, 8 + 8 cut.
    assert(out(4L) == ((17, 2, 2, 16, Some(2.0 / 17))), s"doc4: ${out(4L)}")
    // doc 5: no windows at all; the ratio is NULL, not 0/0.
    assert(out(5L) == ((0, 0, 0, 0, None)), s"doc5: ${out(5L)}")
    // r12: the persisted window index the query probed must equal an
    // inline recompute of the same frame — a drifted index (stale memo,
    // broken fingerprint, schema skew) would poison dd12/dd13/dd14
    // IDENTICALLY and their shared-topology oracles could miss it.
    val idx = Dedup.ddWinIndexPath(spark, tmp)
    val K = 8
    val recomputed = spark.read.parquet(s"$tmp/documents.parquet")
      .select($"doc_id", $"source",
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .filter(size($"ws") >= K)
      .select($"doc_id", $"source", explode(expr(
        s"transform(sequence(1, size(ws) - ${K - 1}), i -> " +
          s"struct(i AS pos, md5(cast(concat_ws(' ', slice(ws, i, $K)) AS binary)) AS h))")).as("pw"))
      .select($"doc_id", $"source", $"pw.pos".as("pos"), $"pw.h".as("h"))
    val persisted = spark.read.parquet(s"$idx/wins")
      .select("doc_id", "source", "pos", "h") // is_rep is dd15's class flag
    assert(persisted.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(persisted).isEmpty,
      "persisted window index differs from inline recompute")
    // dd15's sequence-class columns: every doc in this fixture is a
    // distinct sequence except none, so each is its own rep of size 1
    val side = spark.read.parquet(s"$idx/docs")
      .select($"doc_id", $"rnk", $"csz").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(side.forall { case (_, rnk, csz) => rnk == 1 && csz == 1L },
      s"all-distinct fixture must make every doc its own class rep: ${side.toSeq}")
    graft.Caches.releaseAll() // dd12's builder tracks the exploded-window cache
  }

  test("dd13 source-overlap matrix: shared windows counted once, disjoint sources absent") {
    // 8-word docs -> exactly one window each. R1 appears in srcA twice
    // (distinct collapses it) and in srcB once; srcC shares nothing.
    val r1 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val tmp = java.nio.file.Files.createTempDirectory("dd13").toString
    Seq(
      (1L, r1, "srcA"), (2L, r1, "srcA"),
      (3L, "ash birch cedar elm fir hazel maple oak", "srcA"),
      (4L, r1, "srcB"),
      (5L, "mango nectar olive peach quince radish squash turnip", "srcB"),
      (6L, "gear piston valve crank shaft flange rotor stator", "srcC"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.queries("dd13_source_overlap")(spark, tmp).collect()
    assert(rows.length == 1, s"only the (srcA, srcB) pair overlaps: ${rows.mkString(";")}")
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
      r.getDouble(5)) == (("srcA", "srcB", 1, 2, 2, 0.5)), s"got $r")
  }

  test("dd14 policy cut: systemic pair cut, coincidental pair spared, same-source always cut") {
    // One shared 8-word window (hash H1) across all four docs; the tails
    // make srcA and srcC 21-distinct-window sources. Matrix: (srcA, srcB)
    // overlap = 1/least(21, 1) = 1.0 >= 0.05 -> systemic; (srcA, srcC) =
    // 1/least(21, 21) ~ 0.048 < 0.05 -> coincidental. Policy compares each
    // occurrence's source against the CANONICAL occurrence's source
    // (doc 1, srcA), so doc 2 (srcB) is cut via the systemic pair, doc 3
    // (srcC) is spared, and doc 4 (srcA) is cut as same-source.
    val w8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    val tailA = "kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey xray yankee zulu ant bee cat dog"
    val tailC = "mango nectar olive peach quince radish squash turnip " +
      "ash birch cedar elm fir hazel maple oak gear piston valve crank"
    val tmp = java.nio.file.Files.createTempDirectory("dd14").toString
    Seq(
      (1L, s"$w8 $tailA", "srcA"), // canonical for H1; 21 windows
      (2L, w8, "srcB"), // 1 window: H1, cross-source systemic
      (3L, s"$w8 $tailC", "srcC"), // H1 + 20 own windows: coincidental
      (4L, w8, "srcA")) // 1 window: H1, same source as canonical
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dd14_policy_cut")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(!out.contains(1L), s"canonical doc must have no cut candidates: $out")
    assert(out(2L) == ((1, 1, 0)), s"doc2 (systemic cross-source): ${out(2L)}")
    assert(out(3L) == ((1, 0, 1)), s"doc3 (coincidental, spared): ${out(3L)}")
    assert(out(4L) == ((1, 1, 0)), s"doc4 (same-source): ${out(4L)}")
    graft.Caches.releaseAll() // dd14's builder tracks the window cache
  }

  test("dd17 incremental substring: corpus always canonical, batch-only dups fall to dd12's rule") {
    // K = 8. Even doc_ids = corpus, odd = batch. shared10's three
    // interior windows live in CORPUS doc 2; batch doc 1 repeats them at
    // positions 9-11. Under dd12, doc 1 (smaller id) would be canonical
    // and doc 2 would be cut — dd17 must cut DOC 1 instead: the corpus
    // copy is already ingested, id order is irrelevant. batchdup8 is a
    // batch-ONLY hash shared by docs 3 and 5: dd12's first-(doc_id, pos)
    // rule applies within the batch (doc 3 canonical, doc 5 cut).
    val shared10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tail1 = "kilo lima mike november oscar papa quebec romeo"
    val head2 = "sierra tango uniform victor whiskey xray yankee zulu"
    val batchdup8 = "mango nectar olive peach quince radish squash turnip"
    val filler8 = "ash birch cedar elm fir hazel maple oak"
    val marker8 = "gear piston valve crank shaft flange rotor stator"
    val tmp = java.nio.file.Files.createTempDirectory("dd17").toString
    Seq(
      (1L, s"$head2 $shared10", "sA"), // batch; shared10 at tokens 9-18
      (2L, s"$shared10 $tail1", "sA"), // corpus canonical for shared10
      (3L, batchdup8, "sA"), // batch; one window, batch-only dup with doc 5
      (4L, marker8, "sB"), // corpus; unrelated
      (5L, s"$batchdup8 $filler8", "sB"), // batch; dup window at pos 1
      (7L, "tiny doc", "sB")) // batch; < K tokens, zero windows
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dd17_incremental_substring")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(out.keySet == Set(1L, 3L, 5L, 7L), s"batch docs only: ${out.keySet}")
    // doc 1: 11 windows; positions 9-11 are corpus-known -> ALL cut (the
    // corpus-canonical pin), merging into one 10-token span.
    assert(out(1L) == ((11, 3, 1, 10, Some(3.0 / 11))), s"doc1: ${out(1L)}")
    // doc 3: batch-only dup hash, doc 3 is the batch-first occurrence.
    assert(out(3L) == ((1, 1, 0, 0, Some(1.0))), s"doc3: ${out(3L)}")
    // doc 5: 9 windows; pos 1 repeats doc 3's hash, non-canonical -> cut.
    assert(out(5L) == ((9, 1, 1, 8, Some(1.0 / 9))), s"doc5: ${out(5L)}")
    // doc 7: no windows; NULL ratio, not 0/0.
    assert(out(7L) == ((0, 0, 0, 0, None)), s"doc7: ${out(7L)}")
    graft.Caches.releaseAll() // dd17's builder tracks the flagged-occurrence cache
  }

  test("dd17's corpus-hash read prunes to the index's par=0 partition directory") {
    // The incremental family must never scan the batch half of the
    // persisted window index: `par` is a physical partition directory,
    // so the filter has to land in PartitionFilters (file-listing
    // pruning), not as a post-scan Filter over doc_id arithmetic.
    val plan = Dedup.queries("dd17_incremental_substring")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*par[^\\]]*0\\)\\].*"),
      s"expected a par=0 PartitionFilters entry in dd17's plan")
    graft.Caches.releaseAll()
  }

  test("window index of a corpus with no K-token doc stays readable and yields empty stats") {
    // A partitionBy write of an empty frame emits no schema-bearing
    // file; the build's flat-schema fallback must keep every consumer
    // planning (returning empty/zero results) instead of throwing
    // UNABLE_TO_INFER_SCHEMA — the pre-partitioning behavior.
    val tmp = java.nio.file.Files.createTempDirectory("ddempty").toString
    Seq((1L, "tiny doc", "sA"), (2L, "also small here", "sB"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val stats = Dedup.queries("dd16_index_stats")(spark, tmp).collect()
    assert(stats.length == 2 && stats.forall(_.getLong(4) == 0L),
      s"expected two zero-window sources: ${stats.mkString(";")}")
    val inc = Dedup.queries("dd17_incremental_substring")(spark, tmp).collect()
    assert(inc.length == 1 && inc.head.getInt(2) == 0, // doc 1, no dup windows
      s"dd17 over the windowless corpus: ${inc.mkString(";")}")
    graft.Caches.releaseAll()
  }

  test("dd19 refreshed stats equal dd16's rebuild stats row-for-row") {
    // The refresh contract in-engine (the shared oracle proves it against
    // DuckDB; this pins the two ENGINE paths against each other): stats
    // over (corpus index slice + query-time batch delta) must be
    // byte-identical to stats over the full rebuilt index.
    val rebuild = Dedup.queries("dd16_index_stats")(spark, sf001).collect().toSeq
    val refresh = Dedup.queries("dd19_refreshed_stats")(spark, sf001).collect().toSeq
    assert(rebuild == refresh,
      s"refresh != rebuild: ${refresh.diff(rebuild).take(3)} vs ${rebuild.diff(refresh).take(3)}")
  }

  test("st08's corpus-only cut is bounded by dd17's full incremental cut per doc") {
    // st08 sees only the corpus-known branch (no batch-internal rule), so
    // for every doc it emits, its dup-window and cut-token counts must
    // never exceed dd17's, which add batch-only dups on top.
    val dd17 = Dedup.queries("dd17_incremental_substring")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(4)))).toMap
    val st08 = graft.streaming.EventWindows.queries("st08_substring_ingest")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(4)))
    assert(st08.nonEmpty)
    st08.foreach { case (id, nCorpus, nCut) =>
      val (dDup, dCut) = dd17(id)
      assert(nCorpus <= dDup && nCut <= dCut,
        s"doc $id: st08 ($nCorpus, $nCut) exceeds dd17 ($dDup, $dCut)")
    }
    graft.Caches.releaseAll() // dd17's builder tracks the flagged cache
  }

  test("dd18 batch novelty: per-source distinct hashes split into corpus-known and novel") {
    // Same fixture shape as dd17's: corpus knows shared10's interior
    // windows (doc 2) and marker8 (doc 4); batch sources sA/sB.
    val shared10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tail1 = "kilo lima mike november oscar papa quebec romeo"
    val head2 = "sierra tango uniform victor whiskey xray yankee zulu"
    val batchdup8 = "mango nectar olive peach quince radish squash turnip"
    val filler8 = "ash birch cedar elm fir hazel maple oak"
    val marker8 = "gear piston valve crank shaft flange rotor stator"
    val tmp = java.nio.file.Files.createTempDirectory("dd18").toString
    Seq(
      (1L, s"$head2 $shared10", "sA"), // batch: 11 windows, 3 corpus-known
      (2L, s"$shared10 $tail1", "sA"), // corpus
      (3L, batchdup8, "sA"), // batch: 1 novel window
      (4L, marker8, "sB"), // corpus
      (5L, s"$batchdup8 $filler8", "sB"), // batch: 9 windows, all novel
      (7L, "tiny doc", "sB")) // batch: sub-K
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dd18_batch_novelty")(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    // sA: docs 1+3; doc 1's 8 head-straddling windows + doc 3's 1 are
    // novel, doc 1's 3 shared10-interior windows are corpus-known.
    assert(out("sA") == ((2L, 2L, 12L, 12L, 9L, Some(9.0 / 12))), s"sA: ${out("sA")}")
    // sB: doc 5 windowed (9 distinct novel windows), doc 7 sub-K.
    assert(out("sB") == ((2L, 1L, 9L, 9L, 9L, Some(1.0))), s"sB: ${out("sB")}")
  }

  test("dd05's non-convergence guard FIRES on a diameter > maxIter chain") {
    // Min-label propagation moves the component-min one hop per round, so
    // a path graph 0-1-2-...-n has diameter n and needs ~n rounds. With
    // maxIter below that, the builder must throw loudly — never return
    // half-propagated labels (which the oracle's exact transitive closure
    // would refute, but only if the gate happened to exercise that corpus).
    val chain = (0L until 20L).sliding(2)
      .map { case Seq(a, b) => (a, b) }.toSeq.toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.propagateMinLabels(chain, maxIter = 3)
    }
    assert(ex.getMessage.contains("did not converge in 3 rounds"))
    // and with the bound above the diameter, the same chain converges to
    // a single component labeled by its min id
    val labels = Dedup.propagateMinLabels(chain, maxIter = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 20 && labels.forall(_._2 == 0L))
    graft.Caches.releaseAll()
  }

  // dd15 on a planted corpus exercising every branch of the drop rule:
  // strict containment, the equal-length (exact dup) doc_id tie, an
  // anchor hit whose verify stage must fail, and the sub-K keep.
  test("dd15 drops exactly the fully-contained docs, keeps anchors that fail verify") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet" // 10 tokens
    val docs = Seq(
      (1L, base), // contained in doc 2 (strictly longer)
      (2L, s"kilo lima $base mike"), // 13 tokens, the host — itself maximal
      (3L, base), // exact dup of doc 1: hosts = doc 2 (longer) AND doc 1 (tie, smaller id)
      (4L, "november oscar papa quebec romeo sierra tango uniform"), // unrelated, keep
      (5L, "victor whiskey xray yankee zulu apple banana cherry dates elder"),
      (6L, "victor whiskey xray yankee zulu apple banana cherry dates elder"), // dup of 5: tie -> drop 6 only
      (7L, "tiny doc"), // < K tokens: no windows, always keep
      // shares doc 1's FIRST window (8 tokens) then diverges: the anchor
      // join emits a candidate, the verify count must reject it
      (8L, "alpha bravo charlie delta echo foxtrot golf hotel quill rune"))
    val tmp = java.nio.file.Files.createTempDirectory("dd15").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.queries("dd15_contained_docs")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(1L) == ((1, "drop")), s"doc1 ⊂ doc2 only (doc3 is the LARGER id of the tie): ${out(1L)}")
    assert(out(2L) == ((0, "keep")), s"host is maximal: ${out(2L)}")
    assert(out(3L) == ((2, "drop")), s"doc3 ⊂ doc2 and ties with doc1: ${out(3L)}")
    assert(out(4L) == ((0, "keep")) && out(8L) == ((0, "keep")),
      s"anchor-only matches must not drop: ${out(4L)} / ${out(8L)}")
    assert(out(5L) == ((0, "keep")) && out(6L) == ((1, "drop")),
      s"equal-length tie keeps the smaller id: ${out(5L)} / ${out(6L)}")
    assert(out(7L) == ((0, "keep")), s"sub-K doc has no windows: ${out(7L)}")
  }

  // dd15 against a BRUTE-FORCE containment reference on a seeded random
  // corpus dense with planted copies, slices, and extensions — the class
  // expansion arithmetic (rank-within-class + class-size-weighted cross
  // hosts) has to agree with per-doc string search on every doc, not just
  // the hand-built scenario above.
  test("dd15 agrees with brute-force containment on a seeded corpus of copies, slices, extensions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ant", "bee", "cow", "dog", "elk", "fox")
    def gen(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val base = (0 until 20).map(_ => gen(8 + rnd.nextInt(8)))
    val derived =
      base.take(6).map(ws => ws ++ gen(1 + rnd.nextInt(4))) ++ // extensions
        base.slice(6, 10) ++ // exact copies
        base.filter(_.size >= 10).take(5).map(ws => ws.slice(1, 9)) // 8-token slices
    val all = (base ++ derived).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val tmp = java.nio.file.Files.createTempDirectory("dd15p").toString
    all.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val toks = all.map { case (id, t) => id -> t.split(" ").toVector }.toMap
    val expect = all.map { case (id, _) =>
      val ta = toks(id)
      val hosts =
        if (ta.size < 8) 0
        else all.count { case (bid, _) =>
          val tb = toks(bid)
          bid != id && tb.size >= 8 &&
            (tb.size > ta.size || (tb.size == ta.size && bid < id)) &&
            (" " + tb.mkString(" ") + " ").contains(" " + ta.mkString(" ") + " ")
        }
      id -> hosts
    }.toMap
    val got = Dedup.queries("dd15_contained_docs")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect,
      s"diff: ${(got.toSet diff expect.toSet).toSeq.sortBy(_._1)} vs expected " +
        s"${(expect.toSet diff got.toSet).toSeq.sortBy(_._1)}")
  }

  test("index emptiness probe: a listing failure PROPAGATES instead of reading as empty (r13 #5)") {
    // Genuine absence / emptiness → false (the only states allowed to
    // trigger the empty-schema fallback write).
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_").toFile
    assert(!Dedup.hasPartFile(new java.io.File(dir, "missing")))
    assert(!Dedup.hasPartFile(dir))
    val sub = new java.io.File(dir, "par=0"); sub.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(sub, "part-00000.parquet").toPath, "x")
    assert(Dedup.hasPartFile(dir))
    // Injected transient read failure: the directory EXISTS but cannot be
    // listed. Under the old Option(listFiles).getOrElse(empty) form this
    // read as "no part files" and the caller overwrote the index with
    // limit(0) — silently emptying eight downstream queries. It must throw.
    val unlistable = new java.io.File(dir.getAbsolutePath) {
      override def listFiles(): Array[java.io.File] = null
      override def exists(): Boolean = true
    }
    intercept[java.io.IOException](Dedup.hasPartFile(unlistable))
    // ... including when the failure is on a NESTED directory mid-walk.
    val evilChild = new java.io.File(sub.getAbsolutePath) {
      override def listFiles(): Array[java.io.File] = null
      override def exists(): Boolean = true
    }
    val parentWithEvilChild = new java.io.File(dir.getAbsolutePath) {
      override def listFiles(): Array[java.io.File] = Array(evilChild)
    }
    intercept[java.io.IOException](Dedup.hasPartFile(parentWithEvilChild))
  }
}
