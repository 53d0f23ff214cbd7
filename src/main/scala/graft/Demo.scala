package graft

import org.apache.spark.sql.functions._

/** Library usage demo: exercises the layout utilities and the typed
  * Aggregator through the public API and prints observable evidence
  * (plans + results). Usage: runMain graft.Demo <sfDir> */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- salted skew join equals plain join ---
    val left = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 1L, i)).toDF("k", "p")
    val right = (1L to 1000L).map(k => (k, s"d$k")).toDF("k", "a")
    val plain = left.join(right, Seq("k")).count()
    val salted = operators.Layout.saltedJoin(left, right, Seq("k"), 8).count()
    println(s"saltedJoin rows=$salted plainJoin rows=$plain equal=${salted == plain}")

    // --- bucketed co-located join: shuffle-free plan ---
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Seq("orders_demo_b", "lineitem_demo_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"${spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/$t"))
    }
    operators.Layout.writeBucketed(
      spark.read.parquet(s"$sfDir/orders.parquet"), "orders_demo_b", Seq("o_orderkey"), 8)
    operators.Layout.writeBucketed(
      spark.read.parquet(s"$sfDir/lineitem.parquet").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_demo_b", Seq("o_orderkey"), 8)
    val joined = spark.table("orders_demo_b").join(spark.table("lineitem_demo_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println(s"bucketedJoin shuffleFree=${!plan.contains("ShuffleExchange")} " +
      s"smj=${plan.contains("SortMergeJoin")} bucketedScan=${plan.contains("Bucketed: true")} " +
      s"rows=${joined.count()}")

    // --- typed VectorMean Aggregator over the embeddings table ---
    val centroids = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("label"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .as[(Int, Seq[Double])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new functions.VectorAgg.VectorMean(64).toColumn.name("centroid"))
      .collect()
    centroids.sortBy(_._1).foreach { case (label, vec) =>
      println(f"centroid label=$label dims=${vec.values.length} first3=${vec.values.take(3).map(v => f"$v%.4f").mkString(",")}")
    }
    spark.stop()
  }
}
