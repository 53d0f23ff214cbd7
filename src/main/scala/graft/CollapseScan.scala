package graft
object CollapseScan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("collapse-scan")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        if (BenchAction.countCollapses(fn(spark, dir))) println(s"COLLAPSES $name")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    println("scan complete")
    spark.stop()
  }
}
