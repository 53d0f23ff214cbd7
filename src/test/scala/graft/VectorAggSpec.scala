package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorAgg

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("VectorMean Aggregator equals per-dimension avg (partial+final merge)") {
    val dims = 64
    val ds = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .as[(Int, Seq[Double])]
      .repartition(7) // force multi-partition partial aggregation + merge
    val agg = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new VectorAgg.VectorMean(dims).toColumn.name("centroid"))
      .collect().map { case (label, vec) => label -> vec.values }.toMap

    val expected = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("label"), posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("c"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }

    assert(agg.keySet == expected.keySet)
    agg.foreach { case (label, vec) =>
      assert(vec.length == dims)
      vec.zip(expected(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label")
      }
    }
  }

  test("VectorMean of the input projected to itself is idempotent-ish (zero group)") {
    val ds = Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0)), (2, Seq(10.0, 20.0)))
      .toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new VectorAgg.VectorMean(2).toColumn)
      .collect().toMap
    assert(out(1).values == Seq(2.0, 3.0))
    assert(out(2).values == Seq(10.0, 20.0))
  }

  test("TopKByDist Aggregator: buffer bounded at k through reduce and merge, (dist, id) order") {
    import graft.functions.TopKAgg._
    val agg = new TopKByDist(3)
    // reduce 10 candidates in adversarial order, incl. a dist tie
    val cands = Seq(Cand(9, 1), Cand(2, 5), Cand(7, 2), Cand(2, 3), Cand(5, 9),
      Cand(11, 0), Cand(1, 8), Cand(5, 4), Cand(3, 3), Cand(8, 6))
    val b = cands.foldLeft(agg.zero)(agg.reduce)
    assert(b.items.size == 3, "reduce must cap the buffer at k")
    assert(b.items == Seq(Cand(1, 8), Cand(2, 3), Cand(2, 5)),
      "ties break to the lower id")
    // split the stream arbitrarily: merge of partials equals the whole
    val (l, r) = cands.splitAt(4)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.items == b.items, "merge must equal single-pass reduce")
    assert(merged.items.size <= 3)
    val out = agg.finish(merged)
    assert(out.neighbor_ids == Seq(8L, 3L, 5L) && out.dists == Seq(1L, 2L, 2L))
    // under-full group: fewer than k candidates pass through unscathed
    val small = agg.finish(Seq(Cand(4, 2)).foldLeft(agg.zero)(agg.reduce))
    assert(small.neighbor_ids == Seq(2L) && small.dists == Seq(4L))
  }
}
