package graft

import org.apache.spark.sql.functions._

/** tx12 (hashed-gram decontamination, the 100 TB form) must flag exactly
  * the pairs its oracle-checkable string twin tx10 flags: the 8-byte XXH64
  * gram key changes the shuffle payload, never the semantics, unless a
  * 64-bit collision merges two distinct trigrams (none at gate scale — a
  * collision would fail THIS test loudly, not silently). */
class TextAnalysisSpec extends SparkSpec {

  test("tx12's (corpus, eval, shared) set equals tx10's on the gate corpus") {
    def pairs(name: String) =
      graft.SparkEntry.queries(name)(spark, sf001)
        .select("corpus_id", "eval_id", "shared_grams")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val string = pairs("tx10_decontaminate")
    val hashed = pairs("tx12_decontaminate_hashed")
    assert(string.nonEmpty, "tx10 flagged nothing — the equality check would be vacuous")
    assert(hashed == string,
      s"hashed twin diverged: ${hashed.size} pairs vs tx10's ${string.size} " +
        s"(only_hashed=${(hashed -- string).take(5)}, only_string=${(string -- hashed).take(5)})")
  }

  test("ngramHashes matches WordNgrams' tokenization on adversarial texts") {
    // the corpus shapes where shingleHashes diverges from WordNgrams —
    // trailing spaces (empty tokens kept by split limit -1) and <n-word
    // docs (WordNgrams emits nothing; wordShingles emits a whole-text
    // shingle) — must give tx12's gram source the SAME per-doc distinct
    // gram count tx10 sees, or the twins' equality is corpus luck
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq("a w2 w3 w4 w5 ", "one two", "", "x", "a a a a",
      "w1  w2 w3", "tail space  ", "exact three words")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaStrings = df.select(col("doc_id"),
        graft.functions.WordNgrams(col("text"), 3).as(Seq("pos", "ngram")))
      .select("doc_id", "ngram").distinct()
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHashes = df.select(col("doc_id"),
        explode(graft.functions.SketchExprs.ngramHashes(col("text"), 3)).as("h"))
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.indices.foreach { i =>
      assert(viaHashes.getOrElse(i.toLong, 0L) == viaStrings.getOrElse(i.toLong, 0L),
        s"doc $i '${texts(i)}': hashed gram count ${viaHashes.get(i.toLong)} != " +
          s"string gram count ${viaStrings.get(i.toLong)}")
    }
  }

  test("tx12 is deterministic across invocations (rows-only contract)") {
    def run() = graft.SparkEntry.queries("tx12_decontaminate_hashed")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("tx13 split is content-pure: exact duplicates always share a fold") {
    // the property that prevents train/test leakage through duplicated
    // documents — the fold is a function of normalized content, nothing
    // else. The sf0.001/sf0.01 corpora happen to have no exact dups, so
    // build one that does: every doc duplicated under a different doc_id
    // (and with case/whitespace noise, which normalization must erase).
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, sf001, "documents")
    val dup = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(upper(col("text")), lit("  ")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    // upper() changes content_fp only if md5 input differs after lower+trim
    // — it must NOT: lower(trim(x)) normalizes both copies identically
    val tmp = java.nio.file.Files.createTempDirectory("tx13").toString
    docs.unionByName(dup).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val folds = graft.SparkEntry.queries("tx13_hash_split")(spark, tmp)
      .join(spark.read.parquet(s"$tmp/documents.parquet").select("doc_id", "text"), "doc_id")
      .groupBy(lower(trim(col("text"))).as("norm"))
      .agg(countDistinct("fold").as("n_folds"), count(lit(1)).as("n"))
    assert(folds.filter(col("n") > 1).count() > 0)
    assert(folds.filter(col("n_folds") > 1).count() == 0,
      "a duplicated document landed in two folds (leakage)")
    // all three folds are populated
    assert(graft.SparkEntry.queries("tx13_hash_split")(spark, tmp)
      .select("fold").distinct().count() == 3)
  }

  test("tx14 packing invariants: offsets are cumulative and bounded per shard") {
    val rows = graft.SparkEntry.queries("tx14_pack_sequences")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, tokens, bin, off) =>
      assert(off >= 0 && off < 2048 && bin >= 0 && tokens > 0)
    }
    // per shard: each doc's exclusive offset equals the previous docs' token sum
    rows.groupBy(_._2).foreach { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (id, _, tokens, bin, off) =>
        assert(bin.toLong * 2048 + off == cum,
          s"doc $id in $src: bin/offset (${bin}, $off) != cumulative $cum")
        cum += tokens
      }
    }
  }
}
