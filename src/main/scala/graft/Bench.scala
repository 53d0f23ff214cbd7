package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classloading/parquet-reader warmup so the first timed query isn't
    // charged for one-time costs (round-1 profile: first query paid ~2s
    // extra regardless of which query ran first).
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    Seq("orders", "documents", "embeddings", "customer").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    graft.sources.Tables.events(spark, sfDir).limit(1).count()
    // Best-of-2 per query: one contended run must not poison the round's
    // record (BENCH_r02 recorded 196.9s for a 49.1s engine — trivial
    // unchanged queries "regressed" 23-34x under transient machine load).
    // The min of two runs is robust to a transient spike while still
    // charging real per-query work; bounded extra wall time, one process.
    // None = the run FAILED — a fast-failing run must never become the
    // recorded best time (a failure is not a measurement).
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      // Some builders .cache() frames reused within their own plan
      // (dd05/dd06/ss05); without this, a repeat run's canonically-identical
      // plan reads the prior run's materialized cache and min records a
      // warm-cache scan instead of engine work. Clearing per run charges
      // the full pipeline every time (and keeps queries independent).
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case NonFatal(_) => None }
    }
    // local-iteration filter: SPARK_GRAFT_ONLY=aj01_asof_backward,aj02_...
    // (driver sets no filter and gets the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd filter must fail loudly, not print a plausible 0.00s record
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // Best-of-2 per query; if the two runs disagree by >2x OR one of
        // them failed, one run hit transient machine load (this box's
        // background services produce exactly that pattern), so a third run
        // disambiguates — a failure is a stronger disagreement signal than
        // a 2x spread. Bounded: at most one extra run per query. Min over
        // SUCCESSFUL runs only; all-fail records the -1.0 sentinel.
        val best = (timed(fn), timed(fn)) match {
          case (Some(a), Some(b)) if math.max(a, b) <= 2 * math.min(a, b) =>
            Some(math.min(a, b))
          case (a, b) =>
            Seq(a, b, timed(fn)).flatten.minOption
        }
        name -> best.getOrElse(-1.0)
      }
    // Centisecond precision keeps per-query entries compact (full doubles
    // head-clipped the round-1 record).
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(entries: Iterable[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failedField = if (failed.isEmpty) "" else failed.mkString(",\"failed\":[", ",", "]")
    // Full record: per-query map FIRST, total LAST — the driver's record
    // keeps only the final 2000 chars of output, and at 87+ queries this
    // line is ~2.1k chars, so whatever clips must be the head, never the
    // total (BENCH_r03 lost the head-positioned total + 4 query names).
    val full =
      s"""{"metric":"total","unit":"sec","queries":${qmap(results)},"sf":"$sfDir","n_queries":${results.size}$failedField,"value":${f(total)}}"""
    // Compact final line: guaranteed to fit the 2000-char tail whole, so a
    // last-line JSON parse always succeeds even when the full line clips.
    // Carries the total plus the 12 slowest queries (the perf signal) AND
    // the failed list — a failing query must be visible in the line the
    // driver is guaranteed to parse, not only in the clippable full line.
    val slowest = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(12)
    val compact =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${qmap(slowest)},"n_queries":${results.size}$failedField,"queries_partial":true,"full_map":"previous line + BENCH_FULL.json","sf":"$sfDir"}"""
    // Belt-and-braces artifact: the complete record as a file, immune to any
    // stdout capture window.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case NonFatal(_) => () }
    spark.stop()
    // Print AFTER spark.stop() so no executor/shutdown log line can land
    // after the JSON; these must be the last stdout lines.
    println(full)
    println(compact)
  }
}
