package graft

/** Local profiling helper (not part of the driver contract): time named
  * queries repeatedly to separate fixed cost from steady-state cost.
  *
  * Reps are interleaved ROUND-ROBIN across the named queries (rep loop
  * outside, query loop inside) so JVM/JIT warmness is shared evenly and the
  * per-rep columns compare like with like — consecutive same-query reps
  * gave whichever query ran first a permanently colder profile. Column 1 is
  * each query's cold cost (for a custom codegen'd operator that includes
  * its one-time Janino compile); later columns are steady state.
  *
  * CLEAR=1 drops caches between reps (default keeps them, which
  * under-measures builder-caching queries like dd05/dd06/ss05 on reps 2+ —
  * use CLEAR=1 for those; the default matches a warm production session). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val clear = sys.env.get("CLEAR").contains("1")
    val spark = Sessions.build("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // same action rule as the bench (see BenchAction): a query whose count
    // plan collapses is timed via the materializing toRdd action
    val collapses = names.map(n => n ->
      (try BenchAction.countCollapses(SparkEntry.queries(n)(spark, sfDir))
       catch { case scala.util.control.NonFatal(_) => false })).toMap
    for (_ <- 1 to reps; name <- names) {
      if (clear) { spark.catalog.clearCache(); Caches.releaseAll() }
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      BenchAction.run(fn(spark, sfDir), collapses(name))
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      println(f"PROF $name%-28s ${times(name).map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
