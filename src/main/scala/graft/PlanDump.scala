package graft

/** Local plan-audit helper (not part of the driver contract): print the
  * formatted physical plan of named queries — the `.explain("formatted")`
  * pass the scale review runs after a query goes green. Args are query
  * names (default: all, which is long); SPARK_GRAFT_SF_DIR picks the
  * corpus (plans can differ across scale via AQE thresholds, so audit at
  * the scale you care about). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.build("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ($sfDir) ==========")
      try println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case scala.util.control.NonFatal(e) =>
        println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      Caches.releaseAll()
    }
    spark.stop()
  }
}
