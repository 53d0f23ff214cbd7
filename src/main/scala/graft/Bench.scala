package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** The bench action is `count()` — but Catalyst can legally ELIMINATE the
  * query's work under a bare count: dd12 ends in left outer joins whose
  * right sides are per-doc aggregates (unique keys), so its count plan
  * collapses to a parquet scan and `count()` times the scan, not the
  * query. Detect that per query by comparing heavy-operator counts
  * (joins/generates/windows) between the optimized count plan and the
  * full plan; a collapsed query is timed with the materializing action
  * (`toRdd.count()`, which computes every output row) instead, and the
  * record names which queries took that path. */
object BenchAction {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Window => LWindow}
  private def heavyOps(p: LogicalPlan): Int = p.collect {
    case j: Join => j
    case g: Generate => g
    case w: LWindow => w
  }.size
  def countCollapses(df: DataFrame): Boolean =
    heavyOps(df.groupBy().count().queryExecution.optimizedPlan) <
      heavyOps(df.queryExecution.optimizedPlan)
  /** Time-equivalent of the bench action for `df`: count, unless the count
    * plan drops work the full plan has. */
  def run(df: DataFrame, materialize: Boolean): Unit =
    if (materialize) { df.queryExecution.toRdd.count(); () } else { df.count(); () }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 1-min /proc/loadavg. `start`/`pass_*` samples are post-gate (below):
    // each is taken after the gate has waited for the load (external AND
    // the bench's own decaying tail) to fall under the limit, so any gated
    // sample >= limit means that gate gave up (named in load_exceeded).
    // `end` alone is ungated — it still reads the just-finished pass's
    // self-load (local[32] saturates the box; 4-6 is that norm).
    def load1(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case NonFatal(_) => -1.0 }
    // Load GATE (r8 verdict #1, mandatory): two consecutive rounds the
    // recorded number carried a ~1.1-1.2x contention factor that the judge
    // had to strip with a manual quiet rerun. Rather than annotate load and
    // hope, each timed pass now WAITS (bounded) for the 1-min load to drop
    // below the limit before it starts. The wait also absorbs the bench's
    // OWN load tail: local[32] saturates the box, so the 1-min average
    // needs ~60*ln(L/1.5) s to decay after a pass — that decay time is the
    // price of a trustworthy cross-round record. If the box never quiets
    // within the bound, the pass runs anyway and the record carries a loud
    // "load_exceeded" list naming the gates that gave up — a noisy record
    // must say so itself, not wait for a judge rerun to discover it.
    val loadLimit = sys.env.get("SPARK_GRAFT_LOAD_LIMIT").map(_.toDouble).getOrElse(1.5)
    val gateBoundSec = sys.env.get("SPARK_GRAFT_LOAD_BOUND_SEC").map(_.toInt).getOrElse(300)
    var gaveUp = List.empty[String]
    def gate(label: String): Double = {
      val deadline = System.nanoTime() + gateBoundSec * 1000000000L
      var l = load1()
      while (l >= loadLimit && l >= 0 && System.nanoTime() < deadline) {
        Thread.sleep(5000); l = load1()
      }
      if (l >= loadLimit) gaveUp ::= label
      l
    }
    val loadStart = gate("start")
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
    // local-iteration filter: SPARK_GRAFT_ONLY=aj01_asof_backward,aj02_...
    // (driver sets no filter and gets the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd OR empty filter must fail loudly, not print a plausible
    // 0-query / 0.00s record
    only.foreach { names =>
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    // Pre-warm e14's memoized CSV fixture so BOTH timed runs measure the
    // same work (scan-only). Before r4 the fixture was written inside the
    // first timed run, so min recorded scan-only while the first run paid
    // write+scan — and before the memo (r1-r3) both runs paid write+scan,
    // a baseline break the bench artifact now notes. Skipped when the
    // filter excludes e14 (no point paying the fixture write), and a
    // pre-warm failure is logged rather than swallowed — silently
    // discarding it would resurface later as an unexplained failed run.
    if (only.forall(_.contains("e14_csv_scan")))
      try SparkEntry.queries("e14_csv_scan")(spark, sfDir).count()
      catch { case NonFatal(e) =>
        System.err.println(s"[bench] e14 fixture pre-warm failed: ${e.getMessage}")
      }
    // Pre-warm the per-(process, dir) index-state memos the same way: PQ
    // codebook (ss06/ss07), IVF centroids (ss05), q37's bucketed tables.
    // All are populated eagerly at plan-BUILD time, so invoking the builder
    // (no action) suffices. Without this, pass A pays one-time training/
    // write, pass B hits the memo, the ratio exceeds 2x, and these queries
    // are routed into the targeted third pass on EVERY bench run — wasting
    // the reruns and diluting the flag's contention-diagnostic meaning.
    val memoPrewarm = Seq( // builder to invoke -> queries served by its memo
      "ss05_ivf_ann" -> Seq("ss05_ivf_ann", "ss10_semantic_dedup"),
      "ss06_pq_ann" -> Seq("ss06_pq_ann", "ss07_pq_rerank"),
      "q37_bucketed_join" -> Seq("q37_bucketed_join"),
      "dd08_bloom_incremental" -> Seq("dd08_bloom_incremental", "st06_bloom_ingest_dedup"),
      "dd11_incremental_fuzzy" -> Seq("dd11_incremental_fuzzy"), // banded index fixture (r11)
      // shared substring window-index fixture (r12) — one build serves all three
      "dd12_substring_dedup" ->
        Seq("dd12_substring_dedup", "dd13_source_overlap", "dd14_policy_cut"),
      "tx15_subword_tokens" -> Seq("tx15_subword_tokens", "tx16_pack_subword"),
      "tx17_subword_merged" -> Seq("tx17_subword_merged"),
      "e16_jsonl_scan" -> Seq("e16_jsonl_scan"), // fixture write at builder time, like e14
      "e17_partition_prune" -> Seq("e17_partition_prune"),
      "e18_evolved_scan" -> Seq("e18_evolved_scan")) // fixture write at builder time
    memoPrewarm
      .filter { case (_, served) => served.exists(n => only.forall(_.contains(n))) }
      .foreach { case (n, _) =>
        try { SparkEntry.queries(n)(spark, sfDir); () }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] $n memo pre-warm failed: ${e.getMessage}")
        }
      }
    // Record-hygiene (r9 verdict #5): the record itself names which
    // queries' figures are memo-warm — i.e. EXCLUDE a one-time fixture
    // write / index train / vocab build that a cold first run would pay.
    val prewarmed = ("e14_csv_scan" +: memoPrewarm.flatMap(_._2))
      .distinct.sorted.filter(n => only.forall(_.contains(n)))
    // None = the run FAILED — a fast-failing run must never become the
    // recorded best time (a failure is not a measurement).
    // maxPending tracks builder caches left registered after a query ran:
    // a leak shows up in the round artifact, not only in CachesSpec.
    var maxPending = 0
    // per-query action decision (see BenchAction), computed once outside
    // the timed region — optimizing the probe plans is not query work
    val collapses = scala.collection.mutable.Map.empty[String, Boolean]
    def timed(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val mat = collapses.getOrElseUpdate(name,
        try BenchAction.countCollapses(fn(spark, sfDir))
        catch { case NonFatal(_) => false })
      // Some builders .cache() frames reused within their own plan
      // (dd05/dd06/ss05); without this, a repeat run's canonically-identical
      // plan reads the prior run's materialized cache and min records a
      // warm-cache scan instead of engine work. Clearing per run charges
      // the full pipeline every time (and keeps queries independent).
      // releaseAll() additionally empties the ownership registry so plan
      // references don't accumulate for the life of the process.
      spark.catalog.clearCache()
      Caches.releaseAll()
      operators.Layout.resetRefusedCounters()
      // r9's record inflated late-suite heavy queries 4-8x over their
      // solo-quiet walls (dd12 21.9 vs 3.8 s): after ~120 plans in one JVM,
      // accumulated heap/GC pressure dominates. A full GC before each timed
      // region runs OUTSIDE the clock (its cost lands on bench wall, never
      // on a query's figure) and hands every query a settled heap; the
      // reversed pass B below handles what GC can't (position-dependent
      // JIT/metaspace state) by giving each query a sample from the
      // opposite end of the suite.
      System.gc()
      val t0 = System.nanoTime()
      try {
        BenchAction.run(fn(spark, sfDir), mat)
        val dt = (System.nanoTime() - t0) / 1e9
        maxPending = math.max(maxPending, Caches.pending)
        Some(dt)
      } catch { case NonFatal(_) => None }
    }
    val suite = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    // INTERLEAVED min-of-2: time the whole suite, then repeat the whole
    // suite, min per query across passes. Best-of-2-CONSECUTIVE (r2-r4) was
    // robust to a transient spike but not to a sustained contention window
    // covering both samples of one query — which poisoned the round record
    // twice (r3 dd04 16.57s vs 1.06 quiet; r4 dd06 25.47s vs 1.22 quiet).
    // With whole-suite interleaving, the two samples of any query are
    // minutes apart, so a sustained window lands on DIFFERENT queries in
    // each pass and min discards it.
    // Loadavg at pass boundaries: interleaving makes a sustained contention
    // window land on different queries per pass, but a window spanning the
    // WHOLE record still inflates both samples (r5: dd05 recorded 3.87 s vs
    // 2.25 s on a quiet box). The load annotation lets a reader judge
    // record fidelity without rerunning (see load1's note on
    // self-load-vs-external attribution).
    val loadA = gate("pass_a")
    val passA = suite.map { case (name, fn) => name -> timed(name, fn) }
    val loadB = gate("pass_b")
    // Pass B runs the suite REVERSED: a query timed late in pass A (under
    // whatever JVM state ~120 prior plans left behind) is timed early in
    // pass B, so min-of-passes always holds one low-suite-pressure sample
    // per query. With identical order (r1-r9) both samples of a late query
    // carried the same position penalty and min could not remove it.
    val passB = suite.reverse.map { case (name, fn) => name -> timed(name, fn) }
      .reverse // restore suite order so the zips below stay aligned
    // Third targeted pass for queries whose two samples still disagree >2x
    // (a window longer than one full pass, or a real bimodal query) or
    // failed a run — a failure is a stronger disagreement signal than a 2x
    // spread. Bounded: at most one extra run per flagged query.
    val flagged = suite.zip(passA.map(_._2)).zip(passB.map(_._2)).collect {
      case (((name, fn), a), b)
        if a.isEmpty || b.isEmpty ||
          math.max(a.get, b.get) > 2 * math.min(a.get, b.get) => (name, fn)
    }
    // No flagged queries → no third pass → no pass_c gate. Recording a
    // bare load sample under the "pass_c" key (as r9's first local record
    // did) reads as a gate violation: the box's 1-min average right after
    // pass_b is the bench's OWN tail (local[32] saturates it), not a pass
    // that ran hot. Only a pass that actually runs contributes a sample.
    val loadC = if (flagged.isEmpty) None else Some(gate("pass_c"))
    val passC = flagged.map { case (name, fn) => name -> timed(name, fn) }.toMap
    val loadEnd = load1()
    val results: Seq[(String, Double)] =
      suite.zip(passA.map(_._2)).zip(passB.map(_._2)).map {
        case (((name, _), a), b) =>
          name -> Seq(a, b, passC.get(name).flatten).flatten
            .minOption.getOrElse(-1.0)
      }
    // Centisecond precision keeps per-query entries compact (full doubles
    // head-clipped the round-1 record).
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(entries: Iterable[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // Any failure makes the TOTAL a sentinel: summing only successes would
    // let a query that regresses into failure SHRINK the headline number
    // (look like a speedup) for a consumer that reads only `value`.
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    val failedField = if (failed.isEmpty) "" else failed.mkString(",\"failed\":[", ",", "]")
    // Full record: per-query map FIRST, total LAST — the driver's record
    // keeps only the final 2000 chars of output, and at 87+ queries this
    // line is ~2.1k chars, so whatever clips must be the head, never the
    // total (BENCH_r03 lost the head-positioned total + 4 query names).
    // `start` is pre-Spark (external load); later samples include the
    // bench's own preceding pass. Placed in BOTH lines: the full line is
    // HEAD-clipped by the driver's 2000-char tail capture at 89 queries,
    // so anything that must survive capture has to also ride the compact
    // line.
    // The gate fields ride the SAME string as the samples so they appear in
    // both the full and the guaranteed-parseable compact line: a record that
    // gave up waiting must be impossible to read as a quiet one.
    val exceeded =
      if (gaveUp.isEmpty) ""
      else gaveUp.reverse.map("\"" + _ + "\"").mkString(",\"load_exceeded\":[", ",", "]")
    val passCField = loadC.map(v => s""""pass_c":${f(v)},""").getOrElse("")
    val load =
      s""""load_1min":{"start":${f(loadStart)},"pass_a":${f(loadA)},"pass_b":${f(loadB)},$passCField"end":${f(loadEnd)}},"load_gate":{"limit":${f(loadLimit)},"bound_sec":$gateBoundSec}$exceeded"""
    val matField = {
      val ms = collapses.toSeq.filter(_._2).map(_._1).sorted
      if (ms.isEmpty) ""
      else ms.map("\"" + _ + "\"").mkString(",\"materialized_count\":[", ",", "]")
    }
    val prewarmedField =
      prewarmed.map("\"" + _ + "\"").mkString(",\"prewarmed\":[", ",", "]")
    val full =
      s"""{"metric":"total","unit":"sec","timing":"min-of-2 passes (pass_b reversed order) + targeted 3rd; System.gc() before each timed region (r11: late-suite JVM pressure inflated heavy queries 4-8x); e14 fixture + index-state memos pre-warmed (r5 baseline break: r1-r3 e14 included the fixture write); queries whose count plan collapses are timed via toRdd (r9, see BenchAction)",$load,"caches_pending_max":$maxPending,"queries":${qmap(results)},"sf":"$sfDir","n_queries":${results.size}$failedField$matField$prewarmedField,"value":${f(total)}}"""
    // Compact final line: guaranteed to fit the 2000-char tail whole, so a
    // last-line JSON parse always succeeds even when the full line clips.
    // Carries the total plus the 12 slowest queries (the perf signal) AND
    // the failed list — a failing query must be visible in the line the
    // driver is guaranteed to parse, not only in the clippable full line.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
    val compact =
      s"""{"metric":"total","value":${f(total)},"unit":"sec",$load,"queries":${qmap(slowest)},"n_queries":${results.size}$failedField,"queries_partial":true,"full_map":"previous line + BENCH_FULL.json","sf":"$sfDir"}"""
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
