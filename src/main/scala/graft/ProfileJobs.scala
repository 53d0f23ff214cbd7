package graft

/** Count Spark jobs fired by a named query (diagnostic main, not driver
  * contract) — the round-6 verdict's optional ask #6 wants dd05's
  * convergence check to ride the iteration's materializing action via
  * observe(); this harness measures whether the current filter+count
  * form actually pays an extra job per CC round before any rewrite. */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("dd05_dup_clusters")
    val spark = Sessions.build("graft-profile-jobs")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    names.foreach { name =>
      spark.catalog.clearCache(); Caches.releaseAll()
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat to drain
      Thread.sleep(500)
      println(f"JOBS $name%-24s jobs=${jobs.get()}%3d rows=$n%6d  $dt%.2fs")
    }
    spark.stop()
  }
}
