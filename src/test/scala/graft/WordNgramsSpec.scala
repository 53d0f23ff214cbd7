package graft

import org.apache.spark.sql.functions._

import graft.functions.WordNgrams

/** Custom Generator (UDTF): word n-grams with ordinals. */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  test("generates one row per trigram with its position") {
    val out = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"))
      .toDF("id", "text")
      .select(col("id"), WordNgrams(col("text"), 3).as(Seq("pos", "ngram")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 0, "a b c"), (1L, 1, "b c d")))
  }

  test("generator equals the explode(word_shingles) form on real text") {
    val docs = graft.sources.Tables.table(spark, sf001, "documents").limit(50)
    val gen = docs.select(col("doc_id"), WordNgrams(col("text"), 3).as(Seq("pos", "ngram")))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // word_shingles dedups; compare against raw trigram count instead.
    val raw = docs.select(col("doc_id"),
      greatest(size(split(col("text"), " ")) - 2, lit(0)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(gen.keySet.subsetOf(raw.keySet))
    gen.foreach { case (id, n) => assert(n == raw(id), s"doc $id") }
  }

  test("trailing/leading spaces produce empty tokens like SQL split") {
    import spark.implicits._
    // Spark's split(text, " ") and DuckDB's string_split both KEEP empty
    // tokens at the edges; Scala's char-overload split drops trailing ones
    // — the generator must follow SQL semantics or diverge from the tx06
    // oracle on space-edged documents.
    for (text <- Seq("a b ", " a b", "a  b", "  ")) {
      val viaGen = Seq(Tuple1(text)).toDF("text")
        .select(WordNgrams(col("text"), 2).as(Seq("pos", "ngram")))
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      // tokenization ground truth: Spark SQL's own split
      val tokens = Seq(Tuple1(text)).toDF("text")
        .select(split(col("text"), " ").as("w")).head.getSeq[String](0)
      val expected =
        if (tokens.length < 2) Seq.empty
        else tokens.sliding(2).zipWithIndex.map { case (w, i) => (i, w.mkString(" ")) }.toSeq
      assert(viaGen == expected, s"divergence on <$text>: $viaGen vs $expected")
    }
  }

  test("word_ngrams is SQL-callable via the extension registry") {
    val rows = spark.sql("SELECT word_ngrams('a b c', 2)").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "a b"), (1, "b c")))
  }
}
