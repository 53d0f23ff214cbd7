package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables.table

/** Deduplication operators for a training-data pipeline, designed for
  * 100 TB inputs:
  *
  *  - exact dedup: hash-groupBy on a content fingerprint (one shuffle on the
  *    16-byte hash, never on the document text);
  *  - MinHash + LSH near-dup: shingle → k minhashes → b bands → bucket join.
  *    Candidate generation is a groupBy/join on band keys — NO cartesian
  *    product anywhere, so cost scales with Σ bucket² not N²;
  *  - SimHash: 64-bit signature + banded hamming candidate search;
  *  - n-gram Jaccard verification on blocked candidate pairs.
  *
  * All signature math is columnar (higher-order functions over arrays +
  * xxhash64) — no UDFs, no driver-side loops.
  */
object Dedup {

  private implicit class Strip(val s: String) {
    def stripLinesAndMargin: String = s.linesIterator.map(_.trim).mkString(" ")
  }

  /** Distinct word-3-gram shingles of a text column (by column name). */
  def shingles(textCol: String): Column =
    expr(s"""array_distinct(transform(
      sequence(1, greatest(size(split($textCol, ' ')) - 2, 1)),
      i -> concat_ws(' ', slice(split($textCol, ' '), i, 3))))""".stripLinesAndMargin)

  /** k minhash values of a shingle array: min over xxhash64(shingle, seed). */
  def minhashSig(shingleCol: String, k: Int): Column =
    expr(s"""transform(sequence(0, ${k - 1}),
      seed -> array_min(transform($shingleCol, sh -> xxhash64(sh, seed))))""".stripLinesAndMargin)

  /** 64-bit SimHash of a word array: per-bit majority vote of word hashes. */
  def simhash(wordsCol: String): Column =
    expr(s"""aggregate(
      transform(sequence(0, 63),
        b -> CASE WHEN aggregate($wordsCol, 0L,
               (acc, w) -> acc + CASE WHEN (shiftright(xxhash64(w), b) & 1L) = 1L
                                      THEN 1L ELSE -1L END) > 0
             THEN shiftleft(1L, b) ELSE 0L END),
      0L, (acc, bit) -> acc | bit)""".stripLinesAndMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: survivors = min doc_id per content fingerprint.
    "dd01_exact_dedup" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), md5(lower(trim(col("text"))).cast("binary")).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    }),

    // n-gram Jaccard near-dup on blocked pairs (block = lang+source).
    "dd03_ngram_jaccard" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          shingles("text").as("sh"))
      val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, Seq("lang", "source"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", col("inter") / col("uni"))
        .filter(col("jaccard") >= 0.05)
        .select("id_a", "id_b", "inter", "uni", "jaccard")
        .orderBy("id_a", "id_b")
    }),

    // MinHash + LSH: 16 hashes, 4 bands × 4 rows → candidate pairs with
    // estimated Jaccard (fraction of agreeing minhashes). Rows-only check
    // (DuckDB has no xxhash64); ScalaTest asserts est≈exact on knowns.
    "dd02_minhash_lsh" -> ((s, dir) => {
      val k = 16
      val bands = 4
      val rows = k / bands
      val sig = table(s, dir, "documents")
        .select(col("doc_id"), shingles("text").as("sh"))
        .withColumn("sig", minhashSig("sh", k))
        .select("doc_id", "sig")
      val banded = sig.select(
        col("doc_id"), col("sig"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b AS band, xxhash64(slice(sig, b * $rows + 1, $rows)) AS bucket))")).as("bb"))
        .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
      val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($k AS DOUBLE)")
            .as("est_jaccard"))
        .distinct()
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dup: 64-bit signatures, 4×16-bit bands, hamming ≤ 12.
    // Rows-only check (xxhash64); ScalaTest covers signature properties.
    "dd04_simhash" -> ((s, dir) => {
      val sh = table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .withColumn("simhash", simhash("words"))
        .select("doc_id", "simhash")
      val banded = sh.select(col("doc_id"), col("simhash"),
        explode(expr("transform(sequence(0, 3), " +
          "b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS chunk))")).as("bb"))
        .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.chunk"))
      val a = banded.select(col("band"), col("chunk"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
      val b = banded.select(col("band"), col("chunk"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
      a.join(b, Seq("band", "chunk"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
        .filter(col("hamming") <= 12)
        .select("id_a", "id_b", "hamming")
        .distinct()
        .orderBy("id_a", "id_b")
    }))

  val oracle: Map[String, String] = Map(
    "dd01_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "dd03_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.sh, b.sh)) AS inter,
        |  len(list_distinct(list_concat(a.sh, b.sh))) AS uni,
        |  len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.05
        |ORDER BY id_a, id_b""".stripMargin)
}
