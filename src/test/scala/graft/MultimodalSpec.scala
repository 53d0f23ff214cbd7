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
