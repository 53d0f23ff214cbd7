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
}
