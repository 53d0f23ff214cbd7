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
}
