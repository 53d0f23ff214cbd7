package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table: payload bytes + columnar metadata") {
    val media = Multimodal.withMeta(Multimodal.mediaFromDocuments(spark, sf001))
    val r = media.filter(col("asset_id") === 0).select("meta.n_bytes", "meta.checksum", "meta.format")
      .collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getString(1).matches("[0-9a-f]{32}"))
    assert(Seq("jpeg", "png", "webp").contains(r.getString(2)))
  }

  test("resize plumbing: target dims, byte budget bounded by original") {
    val resized = Multimodal.resizeImages(Multimodal.mediaFromDocuments(spark, sf001), 224, 224)
    val orig = Multimodal.mediaFromDocuments(spark, sf001)
      .select(col("asset_id"), length(col("payload")).cast("long").as("n"))
    val joined = resized.join(orig, "asset_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224)
      val budget = 224L * 224 * 3 / 64
      assert(r.getAs[Long]("resized_bytes") == math.min(r.getAs[Long]("n"), budget))
    }
  }

  test("feature extraction matches an exact in-test recomputation") {
    val docs = graft.sources.Tables.table(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, sf001))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats.size == docs.size)
    docs.foreach { case (id, text) =>
      val expected = Multimodal.StubCodecs.extractFeatures(text.getBytes("UTF-8"))
      assert(feats(id) == expected.toSeq, s"asset $id feature mismatch")
    }
    // the vector is ANN-ready: fixed width, finite values
    feats.values.foreach(v => assert(v.length == 8 && v.forall(d => !d.isNaN)))
  }

  test("mm06 feature-ANN recall vs brute-force cosine over the same vectors") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.SketchExprs
    // exact baseline: brute-force cosine top-10 over the SAME feature
    // vectors mm06 buckets (zero vectors excluded on both sides, like mm06)
    val e = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, sf001))
      .withColumn("nrm", SketchExprs.l2Norm(col("features")))
      .filter(col("nrm") > 0)
    val q = e.filter(col("asset_id") < 5)
      .select(col("asset_id").as("query_id"), col("features").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("asset_id"))
    val exact = q.join(e, col("asset_id") =!= col("query_id"))
      .withColumn("cos",
        SketchExprs.dotProduct(col("qv"), col("features")) / (col("qnrm") * col("nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "asset_id")
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val ann = graft.SparkEntry.queries("mm06_feature_ann")(spark, sf001)
      .select("query_id", "neighbor_id")
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert(ann.nonEmpty, "mm06 returned no neighbors")
    // every ANN neighbor must be a real corpus-mate (no fabricated ids)
    ann.foreach { case (qid, ns) => assert(!ns.contains(qid)) }
    val recalls = exact.toSeq.map { case (qid, ex) =>
      ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mm06 mean recall@10 = $mean%.2f over ${recalls.size} queries")
    // single-probe single-table LSH on 8-dim descriptors: recall is the
    // bucket-collision probability, not 1.0 — the floor asserts the bucket
    // join genuinely surfaces near neighbors rather than noise
    assert(mean >= 0.2, f"mm06 recall@10 $mean%.2f below 0.2")
  }

  test("decode plumbing: deterministic stub dims via mapPartitions") {
    val decoded = Multimodal.decodeImages(Multimodal.mediaFromDocuments(spark, sf001))
    val rows = decoded.select("asset_id", "width", "height", "format_decoded")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 640)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 480)
    }
    // deterministic: rerun produces identical output
    val again = Multimodal.decodeImages(Multimodal.mediaFromDocuments(spark, sf001))
      .select("asset_id", "width", "height").collect().map(_.toSeq).toSet
    assert(rows.map(r => Seq(r.get(0), r.get(1), r.get(2))).toSet == again)
  }

  test("mm07 media dedup: byte-identical payloads collapse across media types, keep-first") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("mm07").toString
    // docs 0/1/2 share one payload but land on the three media_type
    // branches (doc_id % 3) — the dedup must still collapse them, with
    // the survivor's type riding the min asset_id
    Seq((0L, "same payload bytes"), (1L, "same payload bytes"),
      (2L, "same payload bytes"), (4L, "a different asset"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.SparkEntry.queries("mm07_media_dedup")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList
    assert(out == List((0L, "image", 3L), (4L, "audio", 1L)))
  }
}
