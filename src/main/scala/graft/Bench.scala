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

/** The solo phase's scheduler, extracted with the child runner, clock and
  * sleep INJECTED so the composed wall-time behavior is unit-testable in
  * milliseconds with a stub child (r13, from the r12 failure: every piece
  * of the solo machinery was individually correct, but its composition —
  * 120 s settle + up to 16 children × (240 s start gate + JVM boot +
  * min-of-2) + a second rerun loop — had no total ceiling and blew past
  * the driver's bench bound, so the round shipped rc=124 and no solo map.
  * The schedule now runs inside a HARD wall budget: settle and every
  * child spend from the same clock, a child's own wall cap never exceeds
  * the remaining budget, spawning stops when the remainder drops under
  * the floor, and whatever was never attempted is reported in `skipped`
  * so the caller can flag `solo_failed` honestly). */
private[graft] object SoloScheduler {
  /** `budgetSec` — hard wall for the whole solo machinery, BOTH windows
    * and the resample included; `settleSec` — flat pause before a
    * post-suite child window (the measured post-suite decay window; the
    * FRONT window runs on a box nothing has touched, so it settles 0);
    * `childCapSec` — per-child wall cap (the effective cap is
    * min(childCapSec, remaining)); `floorSec` — don't spawn a child with
    * less than this left (a child needs JVM boot + warmup before it can
    * produce a figure at all); `suspects` — pinned list of the queries
    * whose in-suite figures are KNOWN distorted (four rounds running:
    * dd14 5-10x, dd12 3-6x) plus the rest of the stable heavy set — the
    * FRONT window's target list, run in list order so budget exhaustion
    * sacrifices the tail, never the head. */
  final case class Config(
      budgetSec: Double, settleSec: Double, childCapSec: Double, floorSec: Double,
      suspects: Seq[String] = Nil)
  /** One child window: settle, then children most-suspect-first (pinned
    * `suspects` in list order, then the rest SLOWEST-first by in-suite
    * wall — r13 verdict #4 killed cheapest-first for the suspects after
    * it made the most-distorted target the first casualty of the budget,
    * and r16's preview run replayed the same failure in the back window:
    * cheapest-first spent the remaining budget landing the top-6's
    * 4.5 s tail while the two heaviest new entrants got a timeout and a
    * skip. Children all cost roughly the same wall, so running the
    * heaviest first sacrifices the least-valuable figures to the budget,
    * never the most) inside the given budget. `figs` — walls from the
    * children that landed; `skipped` — targets never attempted because
    * the budget ran out; `attempted` — every target a child was actually
    * spawned for, landed or not (r16 advice: a front-attempted child that
    * crashed and was then budget-skipped in the back window must classify
    * as FAILED, not as a budget problem — membership in a skipped list
    * alone can't tell those apart); `spentSec` — the window's actual
    * wall. Anomaly flagging lives in [[anomalous]]: the front window runs
    * before the in-suite witnesses exist, so it cannot be a per-window
    * concern. */
  final case class Phase(
      figs: Seq[(String, Double)], skipped: Seq[String], spentSec: Double,
      attempted: Seq[String] = Nil)

  def phase(targets: Seq[String], inSuite: Map[String, Double], cfg: Config,
      budgetSec: Double, runChild: (String, Double) => Option[Double],
      sleep: Double => Unit, now: () => Double): Phase = {
    val t0 = now()
    def remaining: Double = budgetSec - (now() - t0)
    if (targets.isEmpty || budgetSec <= 0) return Phase(Nil, targets, 0.0)
    sleep(math.max(0.0, math.min(cfg.settleSec, remaining)))
    val suspectRank = cfg.suspects.zipWithIndex.toMap
    val order = targets.sortBy(n =>
      (suspectRank.getOrElse(n, Int.MaxValue), -inSuite.getOrElse(n, 0.0)))
    val figs = Seq.newBuilder[(String, Double)]
    val skipped = Seq.newBuilder[String]
    val attempted = Seq.newBuilder[String]
    order.foreach { name =>
      if (remaining < cfg.floorSec) skipped += name
      else {
        attempted += name
        runChild(name, math.min(cfg.childCapSec, remaining))
          .foreach(v => figs += name -> v)
      }
    }
    Phase(figs.result(), skipped.result(), now() - t0, attempted.result())
  }

  /** A figure above 1.25× its in-suite witness ran on box state the
    * gates can't see (suite pressure only ever inflates, so the in-suite
    * wall is a "this plan can run this fast" proof) — the figure still
    * records, but the artifact names it suspect. Computed over the
    * COMBINED front+back figures once the in-suite witnesses exist. */
  def anomalous(figs: Seq[(String, Double)], inSuite: Map[String, Double]): Seq[String] =
    figs.collect { case (n, v) if v > inSuite.getOrElse(n, Double.MaxValue) * 1.25 => n }

  /** Back-window plan, once the suite has run: `_1` — pinned suspects
    * the front window did NOT land (r19: a front pin whose child crashed
    * or was budget-squeezed must get its second chance even when its
    * in-suite wall keeps it out of the top-N — two r19 previews lost
    * dd14's figure to exactly this gap: its ~4 s wall is never top-6, so
    * a front timeout was final; pins lead the list because the suspect
    * ordering in [[phase]] runs them first anyway, and a pin whose
    * in-suite run FAILED is excluded — its child would fail the same
    * way), then the in-suite top-N targets the front didn't land
    * (slowest-first; the back window's own suspect ordering re-sorts,
    * but a stable input keeps the record deterministic); `_2` — the
    * tail-resample target: the FIRST pinned suspect with a front figure
    * (its early slot is the one a front-of-run contention era would
    * poison; the resample is now time-spaced by the entire suite, min
    * kept — r12's bounded answer to multi-minute contention eras no
    * load gate sees), else the heaviest back target (prior behavior
    * when no suspects are configured). */
  def backPlan(frontFigs: Seq[(String, Double)], inSuite: Seq[(String, Double)],
      topN: Int, cfg: Config): (Seq[String], Option[String]) = {
    val landed = frontFigs.map(_._1).toSet
    val ok = inSuite.filter(_._2 >= 0)
    val okNames = ok.map(_._1).toSet
    val topTargets = ok.sortBy(-_._2).take(topN).map(_._1)
    val missedPins = cfg.suspects.filterNot(landed).filter(okNames)
    val back = (missedPins ++ topTargets.filterNot(landed)).distinct
    val resample = cfg.suspects.find(landed).orElse(back.headOption)
    (back, resample)
  }
}

/** Record assembly, extracted so BenchRecordSpec can pin the artifact
  * shape — in particular that a run which attempted the fresh-JVM solo
  * pass either carries the `queries_solo` map or says `solo_failed`
  * loudly (r12 verdict #1: the per-query perf signal for heavy queries
  * lives in the solo map; a bench change that silently drops it must
  * fail a test, not wait for a judge rerun to notice). */
private[graft] object BenchRecord {
  def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
  def qmap(entries: Iterable[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")

  /** Run-wide box-health fields (r18 verdict #2): `d` = (user, sys,
    * iowait, steal) jiffy deltas across the bench's timed span, rendered
    * as % of box capacity (wall × nCPU × USER_HZ=100). Rides the load
    * block, hence BOTH record lines — the compact line is the only one
    * the driver's 2000-char tail capture reliably sees whole, and r18's
    * finding (totals track hypervisor steal: 255.6 s at 1.92 % vs
    * 217.9 s at 0.60 % same-day) makes the run-wide steal figure part of
    * every record's meaning. Empty when /proc/stat was unreadable. */
  def boxPct(wallSec: Double, nCpu: Int,
      d: Option[(Long, Long, Long, Long)]): String =
    d.filter(_ => wallSec > 0 && nCpu > 0).map { case (_, _, iow, st) =>
      val cap = wallSec * nCpu * 100.0
      s""","steal_pct":${f(st / cap * 100)},"iowait_pct":${f(iow / cap * 100)}"""
    }.getOrElse("")

  /** The `solo_budget` record fragment, factored here so the spec can
    * pin its shape (r19). `child_steal_pct` / `child_sys_pct` annotate
    * EVERY attempted child's life steal / kernel share: steal names a
    * hypervisor co-tenant (r18's carrier), sys a kernel-reclaim burst
    * (preview 6's — sys jiffies 12× at identical user work, near-zero
    * steal), so both failure classes are attributable from the artifact
    * alone. Empty child maps omit their field. */
  def soloBudgetMeta(budgetSec: Double, spent: Double, frontSpent: Double,
      skipped: Seq[String], failed: Seq[String], failedHot: Seq[String],
      anomalous: Seq[String], childSteal: Seq[(String, Double)],
      childSys: Seq[(String, Double)]): String = {
    def jlist(k: String, xs: Seq[String]): String =
      if (xs.isEmpty) "" else xs.map("\"" + _ + "\"").mkString(s""","$k":[""", ",", "]")
    val stealField =
      if (childSteal.isEmpty) "" else ""","child_steal_pct":""" + qmap(childSteal)
    val sysField =
      if (childSys.isEmpty) "" else ""","child_sys_pct":""" + qmap(childSys)
    s""","solo_budget":{"sec":${f(budgetSec)},"spent":${f(spent)},"front_spent":${f(frontSpent)}${jlist("skipped", skipped)}${jlist("failed", failed)}${jlist("failed_hot", failedHot)}${jlist("anomalous", anomalous)}$stealField$sysField}"""
  }

  /** One timed run's JVM telemetry (r15 verdict #1 / optional #7): all
    * captured OUTSIDE the query clock. `gcMs`/`gcN` are collector deltas
    * across the timed region; `gcSettleSec` is the pre-run System.gc()'s
    * own wall; heap figures bracket the run; `storageFreeMb` is executor
    * storage memory before the run; `dirtyMb` the box's Dirty+Writeback
    * page total before the run (the one suite-context carrier neither
    * loadavg nor the JVM can see). The `cpu*J` fields (r17 verdict #2)
    * are box-wide /proc/stat jiffy DELTAS across the timed region — the
    * JVM-side vectors exonerated GC/heap/dirty three rounds running
    * without naming dd14's chronic 8-15x transient's carrier, and the
    * missing evidence class is OS-level: `cpuStealJ` names a hypervisor
    * co-tenant, `cpuIowaitJ` a storage stall, `cpuUserJ`/`cpuSysJ` a
    * co-resident burn (capacity = wall × nCPU × USER_HZ(100) jiffies;
    * the bench's own local[32] work rides cpuUserJ, so read it against
    * the PASS's other queries, not zero). -1 = /proc/stat unreadable. */
  final case class RunDiag(wall: Double, gcSettleSec: Double, gcMs: Long,
    gcN: Long, heapPreMb: Long, heapPostMb: Long, storageFreeMb: Long,
    dirtyMb: Long, cpuUserJ: Long = -1L, cpuSysJ: Long = -1L,
    cpuIowaitJ: Long = -1L, cpuStealJ: Long = -1L)

  /** The `query_diag` fragment (full record line only): per-pass vectors
    * for the queries worth diagnosing — min wall ≥ `slowSec` (capped to
    * the `cap` slowest) plus anything the passes disagreed on (`flagged`)
    * — so a suite-context pathology localizes to a pass and a carrier
    * from ONE round's artifact. Runs render in pass order (a, b, c). */
  def diagMeta(
      results: Seq[(String, Double)],
      flagged: Seq[String],
      diag: collection.Map[String, List[(String, RunDiag)]],
      slowSec: Double = 1.5,
      cap: Int = 20): String = {
    val names = (results.filter(_._2 >= slowSec).sortBy(-_._2).take(cap).map(_._1)
      ++ flagged).distinct
    if (names.isEmpty) ""
    else {
      val body = names.map { n =>
        val runs = diag.getOrElse(n, Nil).reverse.map { case (p, d) =>
          s""""$p":{"wall":${f(d.wall)},"gc_settle":${f(d.gcSettleSec)},"gc_ms":${d.gcMs},"gc_n":${d.gcN},"heap0_mb":${d.heapPreMb},"heap1_mb":${d.heapPostMb},"storage_free_mb":${d.storageFreeMb},"dirty_mb":${d.dirtyMb},"cpu_user_j":${d.cpuUserJ},"cpu_sys_j":${d.cpuSysJ},"cpu_iowait_j":${d.cpuIowaitJ},"cpu_steal_j":${d.cpuStealJ}}"""
        }.mkString(",")
        s""""$n":{$runs}"""
      }.mkString(",")
      s""","query_diag":{$body}"""
    }
  }

  /** Extract the `"query_diag":{...}` fragment from a record line by
    * brace counting (it nests three deep, so a regex won't do) — the
    * parent logs the solo child's copy to stderr before discarding the
    * child record. None when the child had nothing slow enough to diag. */
  def extractQueryDiag(record: String): Option[String] = {
    val key = "\"query_diag\":"
    val at = record.indexOf(key)
    val start = at + key.length
    if (at < 0 || start >= record.length || record.charAt(start) != '{') None
    else {
      var i = start
      var depth = 0
      var end = -1
      while (i < record.length && end < 0) {
        record.charAt(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) None else Some(record.substring(start, end + 1))
    }
  }

  /** Extract the per-query map from a bench record line — the parent's
    * parse of the solo child's full record. Matches the FIRST
    * `"queries":{...}` (the child never emits `queries_solo`). */
  def parseQueries(record: String): Option[Map[String, Double]] =
    """"queries":\{([^}]*)\}""".r.findFirstMatchIn(record)
      .map(_.group(1)).filter(_.nonEmpty)
      .flatMap { body =>
        scala.util.Try(body.split(",").map { kv =>
          val i = kv.lastIndexOf(':')
          kv.substring(0, i).replace("\"", "") -> kv.substring(i + 1).toDouble
        }.toMap).toOption
      }

  /** Renders (full, compact) record lines.
    *
    * `solo` = per-query walls from the fresh per-query child JVMs;
    * `soloIncomplete` = the solo pass was attempted but at least one
    * figure is missing (child failed/timed out) → `solo_failed` rides
    * the record beside whatever figures did land. `value` stays the
    * IN-SUITE sum for cross-round continuity; the solo map is the
    * trustworthy per-query signal for the heavy queries, and
    * `value_solo_adjusted` (r15 verdict #1) is the machine-readable
    * comparable total: the in-suite sum with each soloed query counted
    * at min(in-suite, solo) — min because both figures are walls of the
    * identical plan and each side has a known inflation mode (suite-
    * context JVM pressure in-suite, inter-child decay tail solo), so the
    * lower one is the better evidence of what the plan costs, the same
    * license min-of-passes already uses. `diagMeta` (full line only)
    * carries per-pass wall/GC/heap vectors for the slow and flagged
    * queries. */
  def render(
      results: Seq[(String, Double)],
      solo: Option[Map[String, Double]],
      soloIncomplete: Boolean,
      load: String,
      maxPending: Int,
      sfDir: String,
      materialized: Seq[String],
      prewarmed: Seq[String],
      soloMeta: String = "",
      diagMeta: String = ""): (String, String) = {
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // Any failure makes the TOTAL a sentinel: summing only successes would
    // let a query that regresses into failure SHRINK the headline number
    // (look like a speedup) for a consumer that reads only `value`.
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    // value_solo_adjusted + solo_coverage (r18 verdict #1): ANY run that
    // attempted the solo machinery emits the adjusted total — with ZERO
    // landed figures it degenerates to `value` and solo_coverage says 0
    // loudly, so the one record where every child died on a hot box (the
    // r17 AND r18 committed records) still parses uniformly against
    // every other round's. Attempted is derivable: a solo map exists, or
    // the incomplete flag is up (missing figures imply an attempt). A
    // run with a FAILED query still omits it: an adjusted sum over a
    // sentinel would hide the failure.
    val soloWasAttempted = solo.isDefined || soloIncomplete
    val adjField =
      if (!soloWasAttempted || failed.nonEmpty) ""
      else {
        val m = solo.getOrElse(Map.empty[String, Double])
        val adj = results.map { case (n, v) =>
          m.get(n).map(math.min(v, _)).getOrElse(v) }.sum
        s""","value_solo_adjusted":${f(adj)},"solo_coverage":${m.size}"""
      }
    val failedField = if (failed.isEmpty) "" else failed.mkString(",\"failed\":[", ",", "]")
    val matField =
      if (materialized.isEmpty) ""
      else materialized.map("\"" + _ + "\"").mkString(",\"materialized_count\":[", ",", "]")
    val prewarmedField =
      prewarmed.map("\"" + _ + "\"").mkString(",\"prewarmed\":[", ",", "]")
    // The solo map rides BOTH lines (the full line is head-clipped by the
    // driver's 2000-char tail capture); a child that failed or timed out
    // must be loudly visible, never a silently absent field.
    val soloField =
      solo.map(m => ",\"queries_solo\":" + qmap(m.toSeq.sortBy(-_._2))).getOrElse("") +
        (if (soloIncomplete) ",\"solo_failed\":true" else "")
    // Budget/skip/anomaly telemetry (r13) — full line only: the compact
    // line must stay under the driver's 2000-char tail capture, and the
    // load-bearing signal (figures + solo_failed) already rides both.
    // diagMeta sits EARLY in the full line (right after the load block,
    // r16 advice): the driver's tail capture clips the HEAD, and
    // query_diag can reach several KB — whatever clips must be the
    // diagnostics, never the figures/total at the tail.
    val full =
      s"""{"metric":"total","unit":"sec","timing":"min-of-2 passes (pass_b reversed order) + targeted 3rd; System.gc() before each timed region; queries_solo = fresh-JVM rerun of the heavy set (r12: suite-context JVM pressure survives gc+reversal, so grade heavy-query regressions on solo, value stays the in-suite sum; r15: two windows inside ONE hard wall budget — the pinned heavy set runs FRONT, on the quiet pre-suite box with no settle; the post-suite window covers in-suite top-N queries the front missed plus one suite-spaced resample of the first suspect, min kept; solo_budget.skipped = budget-exhausted never-attempted targets, solo_budget.failed = attempted children that produced no figure, either flags solo_failed; a figure >1.25x its in-suite witness is listed anomalous; r16: value_solo_adjusted = in-suite sum with soloed queries at min(in-suite,solo) — the cross-round comparable total when one in-suite figure is suite-pressure-inflated; query_diag = per-pass wall/gc/heap vectors for slow+flagged queries, full line only, head-positioned so tail clipping sacrifices diagnostics before figures; r17/r18: solo children run their target UNTIMED before the min-of-2, repeating (max 3) until the warmup wall stops improving >20% — a fresh JVM's C2/codegen compile is one-time cost the suite amortizes across 179 plans, and charging it to the solo figure read tx33 3.7x high at r16 and every r18-preview front child 1.3-1.8x high under one warmup; the stdout record caps query_diag to the 20 slowest queries (for the driver's tail-capture window) while the persisted BENCH_FULL record is uncensored; r18: the front solo window spends at most SOLO_FRONT_FRAC (default 0.6) of the budget so the back window ALWAYS gets its remainder — r17's front burned the whole 800 s on a hot box and no solo figure landed; query_diag adds box-wide /proc/stat cpu jiffy deltas per pass (user/sys/iowait/steal) so a dd14-class transient names its contention class from the round's own artifact; r19: value_solo_adjusted is emitted on EVERY solo-attempted run — zero landed figures degenerate it to value with solo_coverage:0 — steal_pct/iowait_pct in the load block are the run-wide /proc/stat deltas as % of box capacity, solo children over cap at measured steal >2% get one bounded extension (cap x min(0.5, steal x 5)) instead of a kill, every attempted child's life-steal rides solo_budget.child_steal_pct and its life kernel share child_sys_pct (sys jiffies at flat user work with near-zero steal name a kernel-reclaim burst, the second exogenous class preview 6 measured), a child over cap at sys >25% of capacity gets the same single bounded extension at 0.5 x cap, and a child that died hot (steal >2% or sys >25%) classifies as failed_hot, not failed); e14 fixture + index-state memos pre-warmed; collapsing count plans timed via toRdd (see BenchAction); the end load sample is ungated and reads the suite's own decaying local[32] tail, not external contention",$load$diagMeta,"caches_pending_max":$maxPending,"queries":${qmap(results)},"sf":"$sfDir","n_queries":${results.size}$failedField$matField$prewarmedField$soloField$soloMeta$adjField,"value":${f(total)}}"""
    // Compact final line: guaranteed to fit the 2000-char tail whole, so a
    // last-line JSON parse always succeeds even when the full line clips.
    // Carries the total plus the 12 slowest queries (the perf signal), the
    // solo map, AND the failed list — a failing query must be visible in
    // the line the driver is guaranteed to parse.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
    val compact =
      s"""{"metric":"total","value":${f(total)}$adjField,"unit":"sec",$load,"queries":${qmap(slowest)},"n_queries":${results.size}$failedField$soloField,"queries_partial":true,"full_map":"previous line + BENCH_FULL.json","sf":"$sfDir"}"""
    (full, compact)
  }
}

object Bench {
  /** Box-wide cpu jiffies from /proc/stat's aggregate line (r17 verdict
    * #2): user+nice, system+irq+softirq, iowait, steal. Snapshot pairs
    * bracket each timed region; the deltas ride query_diag so the next
    * dd14-class transient names its contention class (steal = hypervisor
    * co-tenant, iowait = storage stall, user/sys burn with a flat
    * in-JVM profile = co-resident process) from the round's artifact.
    * Object-scoped (r19): the solo-child path reads it too, to scale a
    * hot child's timeout by the steal it measured. */
  private def cpuJiffies(): Option[(Long, Long, Long, Long)] =
    try {
      val c = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get("/proc/stat")).get(0)
        .split("\\s+").drop(1).map(_.toLong)
      if (c.length < 8) None
      else Some((c(0) + c(1), c(2) + c(5) + c(6), c(4), c(7)))
    } catch { case NonFatal(_) => None }

  /** Steal %-of-capacity measured from a jiffy snapshot `c0` taken at
    * nanoTime `t0` to now. -1 when /proc/stat is unreadable on either
    * side or the window is degenerate. */
  private def stealPctSince(
      c0: Option[(Long, Long, Long, Long)], t0: Long): Double =
    c0.zip(cpuJiffies()).map { case (a, b) =>
      val wall = (System.nanoTime() - t0) / 1e9
      val cap = wall * Runtime.getRuntime.availableProcessors() * 100.0
      if (cap <= 0) -1.0 else (b._4 - a._4) / cap * 100.0
    }.getOrElse(-1.0)

  /** Kernel (sys+irq+softirq) %-of-capacity over the same window — the
    * OTHER exogenous-burst class preview 6 (r19) named: memory-reclaim
    * storms during wide shuffles read as sys jiffies at FLAT user work
    * and near-zero steal (ss23/ss24 sys 12× between same-day runs, user
    * identical). Unlike steal, sys includes the child's own syscall
    * work (~8 % for the NN-Descent children on a quiet box), so burst
    * thresholds sit well above that own-work floor. */
  private def sysPctSince(
      c0: Option[(Long, Long, Long, Long)], t0: Long): Double =
    c0.zip(cpuJiffies()).map { case (a, b) =>
      val wall = (System.nanoTime() - t0) / 1e9
      val cap = wall * Runtime.getRuntime.availableProcessors() * 100.0
      if (cap <= 0) -1.0 else (b._2 - a._2) / cap * 100.0
    }.getOrElse(-1.0)

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
    // Run-wide box-health bracket (r18 verdict #2): BENCH_NOTES computed
    // "steal as % of timed capacity" by hand from query_diag sums; the
    // driver's tail capture only reliably sees the compact line, so the
    // run-wide figure must ride the record itself. Snapshot here (post
    // start-gate, before any work) and delta when the load block is
    // assembled — covering the front solo window, warmups and all timed
    // passes, i.e. everything that contributes to `value`.
    val runCpu0 = cpuJiffies()
    val runT0 = System.nanoTime()
    // local-iteration filter: SPARK_GRAFT_ONLY=aj01_asof_backward,aj02_...
    // (driver sets no filter and gets the full set). Parsed before the
    // session: the front solo window below must respect it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd OR empty filter must fail loudly, not print a plausible
    // 0-query / 0.00s record
    only.foreach { names =>
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    val soloChild = sys.env.contains("SPARK_GRAFT_SOLO_CHILD")
    // soloN 8 → 4 (r12 verdict #1): the judge's solo/in-suite comparison
    // showed only the top couple of queries actually distort under suite
    // pressure (dd14 29.17 recorded vs 2.98 solo; dd12 5.45 vs 1.64) while
    // ranks 5-8 were within 10% — half the children bought no signal and
    // their wall cost is what pushed the phase past the driver's bound.
    // 4 → 6 (r15 verdict #3): the grading criterion is now that every
    // in-suite top-6 query carries a solo figure — st15 (5th-heaviest at
    // r15) had none, so a regression there would have been graded on the
    // noisy in-suite number.
    val soloN = sys.env.get("SPARK_GRAFT_SOLO_N").map(_.toInt).getOrElse(6)
    val soloSettle = sys.env.get("SPARK_GRAFT_SOLO_SETTLE_SEC").map(_.toInt).getOrElse(120)
    val soloCfg = SoloScheduler.Config(
      // 600 → 720 (r14 verdict #3): 600 ran dry at 596/600 with two of
      // four targets skipped. 720 → 960 → 800 (r15 verdict #3, then the
      // two r16 preview runs): a measured quiet child costs ~85-110 s
      // wall including the inter-child load-gate decay, so five front
      // pins cost ~550 s and the back window's settle + one child fits
      // in the remaining ~250. 960 covered eight targets but pushed the
      // WHOLE bench (solo + 2×177-query passes + inter-pass gates) to
      // ~30+ min on the preview box — at the driver's kill bound, and an
      // rc=124 round loses every figure. 800 keeps the driver total near
      // r15's ~25-27 min; the sacrificial items when the budget runs dry
      // are the resample and the top-6 TAIL (slowest-first ordering —
      // see SoloScheduler.phase), never the heavy head.
      budgetSec = sys.env.get("SPARK_GRAFT_SOLO_BUDGET_SEC").map(_.toDouble).getOrElse(800.0),
      settleSec = soloSettle.toDouble,
      childCapSec = sys.env.get("SPARK_GRAFT_SOLO_CHILD_CAP_SEC").map(_.toDouble).getOrElse(300.0),
      // 60 → 120 (r16 preview): a child needs ~85-110 s to produce any
      // figure (start-gate decay + JVM boot + warmups + min-of-2), so
      // spawning one with 60-110 s left just burns the remainder in a
      // timeout — the preview lost 110 s and a target's figure to
      // exactly that. Below 120 s remaining, skipping is strictly
      // better: the budget line reports it and nothing is wasted.
      floorSec = 120.0,
      // The two chronic targets, ONLY (r17 verdict #7 shrank the list
      // from six): dd14 stays pinned because six rounds of driver-box
      // history put its in-suite figure at 5-15x (63.8 s at r15,
      // 61-93 s at r17) while its fresh-JVM truth sits under 4 s — when
      // that recurs, its child is the single most valuable figure of
      // the round. ss23 stays pinned as the suite's heaviest query
      // (~12-13 s): it must never be the one with no fresh-JVM witness
      // (r17 lost its figure twice). qp03/qp06/st15/ss22 left the pins
      // in r18: the r17 driver run proved six pins are a budget hazard
      // (the front window burned all 800 s and landed NOTHING), and the
      // back window's slowest-first top-N ordering covers exactly the
      // queries that climb the in-suite top set, with
      // value_solo_adjusted neutralizing the total either way. This
      // doubles as the FRONT window's target list — set
      // SPARK_GRAFT_SOLO_SUSPECTS="" to disable the front window
      // entirely (all solo work then lands in the post-suite window,
      // the pre-r15 behavior).
      suspects = sys.env.get("SPARK_GRAFT_SOLO_SUSPECTS")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Seq("ss23_nn_descent_iter", "dd14_policy_cut"))
        .filter(SparkEntry.queries.contains))
    // SPARK_GRAFT_SOLO_FORCE runs the solo machinery even under an ONLY
    // filter — local iteration on the machinery itself
    val soloAttempted = !soloChild && soloN > 0 &&
      (only.isEmpty || sys.env.contains("SPARK_GRAFT_SOLO_FORCE"))
    // SPARK_GRAFT_SOLO_DRYRUN=1 swaps the child for a stub (short sleep +
    // a figure derived from the witness wall, 1.0 when none exists yet)
    // so a full end-to-end bench run exercises the real scheduling/record
    // path in seconds — the r12 failure mode (composition never examined)
    // stays testable outside sbt too. SoloSchedulerSpec drives the
    // scheduler directly.
    // Per-child measured steal (%-of-capacity across the child's whole
    // life), landed or not — the record annotates every attempted child
    // so a failure on a hot box is attributable from the artifact alone
    // (r18 verdict #1b: both front children died with nothing in the
    // record saying the box was being stolen from at up to 21 %/pass).
    val childSteal = scala.collection.mutable.Map.empty[String, Double]
    val childSys = scala.collection.mutable.Map.empty[String, Double]
    def childRunner(witness: Map[String, Double]): (String, Double) => Option[Double] =
      if (sys.env.contains("SPARK_GRAFT_SOLO_DRYRUN"))
        (name, _) => { Thread.sleep(500); Some(witness.getOrElse(name, 1.0) * 0.9) }
      else
        (name, capSec) => {
          val (figs, stealPct, sysPct) = runSoloChild(Seq(name), sfDir, capSec)
          if (stealPct >= 0)
            childSteal(name) = math.max(stealPct, childSteal.getOrElse(name, 0.0))
          if (sysPct >= 0)
            childSys(name) = math.max(sysPct, childSys.getOrElse(name, 0.0))
          figs.flatMap(_.get(name))
        }
    // FRONT solo window (r14 verdict #3): the fresh-JVM children used to
    // run AFTER the suite, into its decaying local[32] tail — every load
    // gate green yet the landed figures read ~1.7x the judge's quiet
    // min-of-3 (dd14 6.97 solo vs 3.98 quiet), and the settle + hot
    // children exhausted the budget (596/600 s, two targets skipped).
    // The box is at its QUIETEST right now — after the start gate,
    // before the parent session exists — so the known heavy set spends
    // the budget here, with no settle and nothing co-resident. The
    // post-suite window below covers whatever the front didn't land.
    // FAIL-SOFT CAP (r17 verdict #1): the front window spends from a
    // capped FRACTION of the budget, never the whole of it — on the r17
    // driver box three hot children burned 800.36/800 s in the front
    // phase, the back window got zero, no solo figure landed anywhere,
    // and value_solo_adjusted (the artifact that makes a noisy round
    // comparable) was never emitted. 0.6 × 800 fits the two-pin front
    // list (~200 s quiet) threefold over; however hot the box, the back
    // window is now GUARANTEED ≥ 0.4 × budget for the post-suite top-N.
    // Parsed defensively (r18 advice): the knob EXISTS to enforce the
    // fail-soft split, so a value that would defeat it must not pass
    // through silently — >1 would let the front burn the whole budget
    // again (the r17 failure), <=0 would disable the front window, and a
    // typo'd string would crash the bench before any work ran. Out-of-
    // range values clamp into [0.05, 1.0] (1.0 = an operator explicitly
    // giving the front everything), unparseable values fall back to the
    // 0.6 default; either path logs the override it applied.
    val frontFrac = sys.env.get("SPARK_GRAFT_SOLO_FRONT_FRAC").map { s =>
      val v = try s.toDouble catch {
        case _: NumberFormatException =>
          System.err.println(
            s"[bench] SOLO_FRONT_FRAC unparseable ('$s'), using default 0.6")
          0.6
      }
      val c = math.min(1.0, math.max(0.05, v))
      if (c != v)
        System.err.println(s"[bench] SOLO_FRONT_FRAC $v clamped to $c")
      c
    }.getOrElse(0.6)
    val frontPhase =
      if (!soloAttempted) SoloScheduler.Phase(Nil, Nil, 0.0)
      else {
        System.err.println(
          s"[bench] front solo window: ${soloCfg.suspects.mkString(",")}")
        SoloScheduler.phase(soloCfg.suspects, Map.empty,
          soloCfg.copy(settleSec = 0.0), soloCfg.budgetSec * frontFrac,
          childRunner(Map.empty), sec => Thread.sleep((sec * 1000).toLong),
          () => System.nanoTime() / 1e9)
      }
    // The front children saturated local[32] themselves; the pass_a gate
    // below absorbs their decay tail like any other inter-pass tail.
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
    // Pre-warm e14's memoized CSV fixture so BOTH timed runs measure the
    // same work (scan-only). Before r4 the fixture was written inside the
    // first timed run, so min recorded scan-only while the first run paid
    // write+scan — and before the memo (r1-r3) both runs paid write+scan,
    // a baseline break the bench artifact now notes. Skipped when the
    // filter excludes e14 (no point paying the fixture write), and a
    // pre-warm failure is logged rather than swallowed — silently
    // discarding it would resurface later as an unexplained failed run.
    // Record-hygiene (r9 verdict #5 + r11 advice): the record names which
    // queries' figures are memo-warm, derived from the pre-warms that
    // actually SUCCEEDED — a failed pre-warm (logged below) means the
    // timed run paid the cold build, and the record must not claim
    // otherwise.
    val prewarmedOk = scala.collection.mutable.SortedSet.empty[String]
    if (only.forall(_.contains("e14_csv_scan")))
      try {
        SparkEntry.queries("e14_csv_scan")(spark, sfDir).count()
        prewarmedOk += "e14_csv_scan"
      }
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
      // banded index fixture (r11); qp03's fuzzy stage probes it too
      "dd11_incremental_fuzzy" ->
        Seq("dd11_incremental_fuzzy", "qp03_incremental_manifest"),
      // shared substring window-index fixture (r12) — one build serves all seven
      // consumers plus qp03's substring stage and st08's corpus hash set
      "dd12_substring_dedup" ->
        Seq("dd12_substring_dedup", "dd13_source_overlap", "dd14_policy_cut",
          "dd15_contained_docs", "dd16_index_stats",
          "dd17_incremental_substring", "dd18_batch_novelty",
          "dd19_refreshed_stats", "qp03_incremental_manifest",
          "st08_substring_ingest"),
      // persisted corpus kNN-graph artifact (r17) — built by the qp08
      // plan's builder via knnGraphArtifactPath, probed by the query
      "qp08_graph_dedup_manifest" -> Seq("qp08_graph_dedup_manifest"),
      "tx15_subword_tokens" -> Seq("tx15_subword_tokens", "tx16_pack_subword"),
      "tx17_subword_merged" -> Seq("tx17_subword_merged"),
      "e16_jsonl_scan" -> Seq("e16_jsonl_scan"), // fixture write at builder time, like e14
      "e17_partition_prune" -> Seq("e17_partition_prune"),
      "e18_evolved_scan" -> Seq("e18_evolved_scan"), // fixture write at builder time
      "e19_orc_scan" -> Seq("e19_orc_scan")) // ORC fixture write at builder time
    val prewarmFailed = scala.collection.mutable.Set.empty[String]
    memoPrewarm
      .filter { case (_, served) => served.exists(n => only.forall(_.contains(n))) }
      .foreach { case (n, served) =>
        try {
          SparkEntry.queries(n)(spark, sfDir)
          prewarmedOk ++= served.filter(x => only.forall(_.contains(x)))
        }
        catch { case NonFatal(e) =>
          prewarmFailed += n
          System.err.println(s"[bench] $n memo pre-warm failed: ${e.getMessage}")
        }
      }
    // A query served by SEVERAL builders (qp03: dd11's banded index AND
    // dd12's window index) is memo-warm only if ALL of them succeeded —
    // one failed builder means its timed run pays that cold build, and
    // the record must not claim otherwise.
    memoPrewarm.filter(c => prewarmFailed(c._1))
      .foreach { case (_, served) => prewarmedOk --= served }
    val prewarmed = prewarmedOk.toSeq
    // None = the run FAILED — a fast-failing run must never become the
    // recorded best time (a failure is not a measurement).
    // maxPending tracks builder caches left registered after a query ran:
    // a leak shows up in the round artifact, not only in CachesSpec.
    var maxPending = 0
    // Per-run JVM telemetry (r15 verdict #1: dd14's in-suite figure hit
    // 63.8 s on a quiet box against a 3.45 s fresh-JVM truth, min-of-2,
    // and nothing in the record could name the carrier). Each timed run
    // now snapshots, OUTSIDE the clock: the wall of the pre-run
    // System.gc(), GC time/count deltas across the timed region, heap
    // after the settle gc and after the action, and free executor
    // storage memory before the run. BENCH_FULL carries the per-pass
    // vectors for the slow/flagged queries (r15 optional #7) so a
    // pathological figure localizes from ONE round's artifact.
    import BenchRecord.RunDiag
    val diag = scala.collection.mutable.Map.empty[String, List[(String, RunDiag)]]
    def gcStats(): (Long, Long) = {
      var ms = 0L; var n = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.forEach { b =>
        ms += math.max(0L, b.getCollectionTime); n += math.max(0L, b.getCollectionCount)
      }
      (ms, n)
    }
    // Dirty + under-writeback page total: the one suite-context carrier
    // loadavg and the JVM can't see (the r12 decay-window notes suspected
    // "dirty shuffle-litter writeback"); a disk-heavy query (dd14 reads +
    // reshuffles + caches the persisted window index) stalls on it while
    // CPU-bound neighbors don't.
    def dirtyMb(): Long =
      try {
        val mi = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/meminfo"))
        var kb = 0L
        mi.forEach { l =>
          if (l.startsWith("Dirty:") || l.startsWith("Writeback:"))
            kb += l.split("\\s+")(1).toLong
        }
        kb / 1024
      } catch { case NonFatal(_) => -1L }
    def heapUsedMb(): Long = {
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }
    // per-query action decision (see BenchAction), computed once outside
    // the timed region — optimizing the probe plans is not query work
    val collapses = scala.collection.mutable.Map.empty[String, Boolean]
    def timed(pass: String, name: String,
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
      val tg0 = System.nanoTime()
      System.gc()
      val gcSettle = (System.nanoTime() - tg0) / 1e9
      val storageFreeMb =
        try spark.sparkContext.getExecutorMemoryStatus.values
          .map(_._2).sum / (1024 * 1024)
        catch { case NonFatal(_) => -1L }
      val heapPre = heapUsedMb()
      val dirtyPre = dirtyMb()
      val cpu0 = cpuJiffies()
      val (gcMs0, gcN0) = gcStats()
      val t0 = System.nanoTime()
      try {
        BenchAction.run(fn(spark, sfDir), mat)
        val dt = (System.nanoTime() - t0) / 1e9
        val (gcMs1, gcN1) = gcStats()
        val (cU, cS, cW, cT) = cpu0.zip(cpuJiffies()).map { case (a, b) =>
          (b._1 - a._1, b._2 - a._2, b._3 - a._3, b._4 - a._4)
        }.getOrElse((-1L, -1L, -1L, -1L))
        diag(name) = (pass -> RunDiag(dt, gcSettle, gcMs1 - gcMs0, gcN1 - gcN0,
          heapPre, heapUsedMb(), storageFreeMb, dirtyPre,
          cU, cS, cW, cT)) :: diag.getOrElse(name, Nil)
        maxPending = math.max(maxPending, Caches.pending)
        Some(dt)
      } catch { case NonFatal(_) => None }
    }
    val suite = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    // Solo-child cold-JIT amortization (r16 verdict #3): tx33 solo read
    // 14.39 s against a 3.87 s in-suite witness, ss22 7.75 vs 4.54 —
    // both flagged anomalous — because a fresh JVM pays C2/codegen
    // compilation of the query's own generated classes on BOTH timed
    // passes (the plan is rebuilt per pass; the generic warmups above
    // compile Spark's scan machinery, not the query's wide HOF
    // projections), where the suite amortizes that across 177 plans.
    // The child therefore runs its ONE target UNTIMED first, with the
    // same cache hygiene as a timed run, so min-of-2 measures the plan,
    // not the JIT. ADAPTIVE since r18: ONE warmup was not enough — in
    // the r18 preview runs every front child still read 1.3-1.8x its
    // in-suite witness (all four of preview 3's children flagged
    // anomalous) because a single pass compiles tier-1 but not the C2
    // tier of a many-stage plan's Spark internals, which the suite's
    // 179 plans saturate. Warmups repeat (max 3) until the wall stops
    // improving by >20%, so a plan that is warm after one pass pays at
    // most one confirming extra run and a JIT-bound plan gets the runs
    // it needs. Child only: the suite's own figures keep their
    // cross-round meaning.
    if (soloChild) suite.foreach { case (name, fn) =>
      try {
        val mat = collapses.getOrElseUpdate(name,
          try BenchAction.countCollapses(fn(spark, sfDir))
          catch { case NonFatal(_) => false })
        var prev = Double.MaxValue
        var improving = true
        var i = 0
        while (improving && i < 3) {
          spark.catalog.clearCache()
          Caches.releaseAll()
          operators.Layout.resetRefusedCounters()
          val t0 = System.nanoTime()
          BenchAction.run(fn(spark, sfDir), mat)
          val w = (System.nanoTime() - t0) / 1e9
          improving = w < prev * 0.8
          prev = w
          i += 1
        }
      } catch { case NonFatal(_) => () }
    }
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
    val passA = suite.map { case (name, fn) => name -> timed("a", name, fn) }
    val loadB = gate("pass_b")
    // Pass B runs the suite REVERSED: a query timed late in pass A (under
    // whatever JVM state ~120 prior plans left behind) is timed early in
    // pass B, so min-of-passes always holds one low-suite-pressure sample
    // per query. With identical order (r1-r9) both samples of a late query
    // carried the same position penalty and min could not remove it.
    val passB = suite.reverse.map { case (name, fn) => name -> timed("b", name, fn) }
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
    val passC = flagged.map { case (name, fn) => name -> timed("c", name, fn) }.toMap
    val loadEnd = load1()
    val results: Seq[(String, Double)] =
      suite.zip(passA.map(_._2)).zip(passB.map(_._2)).map {
        case (((name, _), a), b) =>
          name -> Seq(a, b, passC.get(name).flatten).flatten
            .minOption.getOrElse(-1.0)
      }
    // Witness map for anomaly checks and the dry-run stub: a failed query
    // keeps the -1.0 sentinel in `results`, and comparing any positive
    // solo figure against a negative witness would flag it anomalous
    // (v > -1.25 is always true) — filter failures out (r15 advice).
    val soloWitness = results.filter(_._2 >= 0).toMap
    // Per-pass diagnostic vectors (full record only): the slow set plus
    // anything the passes disagreed on — the data that localizes a
    // suite-context pathology (r15: dd14 63.8 s in-suite vs 3.45 s solo)
    // to a pass and a carrier (GC wall, heap floor, storage/dirty
    // pressure) without a rerun. Shape pinned by BenchRecordSpec.
    val diagMeta = BenchRecord.diagMeta(results, flagged.map(_._1), diag)
    // The PERSISTED copy carries the vectors for EVERY query (r16 next
    // #7): cross-round per-query diffs were top-N-censored because only
    // the stdout-bound record needs the 20-slowest cap (it exists for
    // the driver's tail-capture window, which a file never passes
    // through). ~177 queries × 3 passes ≈ 80 KB — file-sized, not
    // stdout-sized.
    val diagMetaAll =
      BenchRecord.diagMeta(results, flagged.map(_._1), diag,
        slowSec = 0.0, cap = Int.MaxValue)
    // All gates have run by here, so the load annotation is final —
    // assembled BEFORE the solo pass so the pre-solo record below can
    // carry it. The gate fields ride the SAME string as the samples so a
    // record that gave up waiting is impossible to read as a quiet one.
    val exceeded =
      if (gaveUp.isEmpty) ""
      else gaveUp.reverse.map("\"" + _ + "\"").mkString(",\"load_exceeded\":[", ",", "]")
    import BenchRecord.f
    val passCField = loadC.map(v => s""""pass_c":${f(v)},""").getOrElse("")
    // steal_pct/iowait_pct (r18 verdict #2): run-wide /proc/stat deltas
    // as % of box capacity over the whole timed span, machine-readable
    // in BOTH record lines (the load block rides both) — the r18 finding
    // was that same-day totals track measured steal (255.6 s at 1.92 %
    // vs 217.9 s at 0.60 %), so every future record carries its own
    // box-health figure.
    val boxMeta = BenchRecord.boxPct(
      (System.nanoTime() - runT0) / 1e9,
      Runtime.getRuntime.availableProcessors(),
      runCpu0.zip(cpuJiffies()).map { case (a, b) =>
        (b._1 - a._1, b._2 - a._2, b._3 - a._3, b._4 - a._4)
      })
    val load =
      s""""load_1min":{"start":${f(loadStart)},"pass_a":${f(loadA)},"pass_b":${f(loadB)},$passCField"end":${f(loadEnd)}},"load_gate":{"limit":${f(loadLimit)},"bound_sec":$gateBoundSec}$boxMeta$exceeded"""
    val fullOutPath = sys.env.getOrElse("SPARK_GRAFT_FULL_OUT", "BENCH_FULL.json")
    val matNames = collapses.toSeq.filter(_._2).map(_._1).sorted
    // Stamped sibling record (r12 verdict #2): BENCH_FULL.json is a
    // single mutable file that EVERY bench invocation overwrites — in r12
    // it was the only copy of the driver's 142-query map and a later
    // local run clobbered it. Full-suite runs (not a child, no ONLY
    // filter) additionally write a timestamp-stamped copy that nothing
    // ever overwrites; local iteration runs stay single-file.
    val stamped: Option[java.nio.file.Path] =
      if (soloChild || only.nonEmpty) None
      else Some(java.nio.file.Paths.get(fullOutPath.replaceAll("\\.json$", "") +
        "_" + new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
          .format(new java.util.Date()) + ".json"))
    def persistFull(line: String): Unit =
      (java.nio.file.Paths.get(fullOutPath) :: stamped.toList).foreach { p =>
        try java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
        catch { case NonFatal(_) => () }
      }
    // BACK solo window: whatever the front window didn't land — a NEW
    // query that climbed into the in-suite top-N, or a front suspect
    // whose child failed — plus one time-spaced tail resample of the
    // first front suspect (its front slot is the one a front-of-run
    // contention era would poison; rerunning it HERE spaces the two
    // samples by the entire suite, min kept — r12's bounded answer to
    // multi-minute contention eras no load gate sees). Fresh child JVMs
    // because suite-context inflation survives gc+reversed passes (r12:
    // dd14 23.28 s in-suite vs 2.74 judge-solo), one query per child
    // because co-resident heavy plans distort each other 1.5-2.5x even
    // in a fresh process. Cross-round grading: `queries` for continuity,
    // `queries_solo` for the trustworthy heavy-query signal.
    val (backTargets, resampleOpt) =
      if (!soloAttempted) (Nil, None)
      else SoloScheduler.backPlan(frontPhase.figs, results, soloN, soloCfg)
    val backWork = backTargets.nonEmpty || resampleOpt.nonEmpty
    // Kill-safety: persist the MAIN record before the many-minute back
    // window — a harness timeout mid-solo must cost the round the
    // missing figures (flagged solo_failed in this provisional record),
    // never the whole bench artifact. Overwritten with the final record
    // below. The front figures already exist, so they ride it.
    val frontFigMap = frontPhase.figs.toMap
    if (soloAttempted && backWork) {
      val (preFull, _) = BenchRecord.render(
        results, if (frontFigMap.isEmpty) None else Some(frontFigMap),
        soloIncomplete = true, load, maxPending, sfDir,
        materialized = matNames, prewarmed = prewarmed, diagMeta = diagMetaAll)
      persistFull(preFull)
    }
    // The parent's context stops BEFORE the children run, not after the
    // records render — nothing below needs Spark, and the children must
    // not share the box with a JVM holding 8 GB of post-suite garbage.
    if (soloAttempted && backWork) spark.stop()
    // Measured decay (r12, two full preview runs): children launched in
    // the first ~5 min after the suite read 1.4-3.4x hot (dd14 7.03 s at
    // T+1 min vs 2.06 s from the IDENTICAL command on an idle box;
    // qp01 5.25 at T+4) while children past ~T+7 min read clean — with
    // every load gate green, parent stopped or not. Whatever the
    // post-saturation state is (dirty shuffle-litter writeback, CPU/VM
    // settle — loadavg sees none of it), it decays over minutes. So the
    // back window keeps its flat settle pause before the first child,
    // and the whole machinery spends from ONE hard budget: the back
    // window gets what the front window left (r12 shipped rc=124
    // because this phase had no ceiling — see SoloScheduler's doc).
    val backBudget = math.max(0.0, soloCfg.budgetSec - frontPhase.spentSec)
    val sleepSec = (sec: Double) => Thread.sleep((sec * 1000).toLong)
    val nowSec = () => System.nanoTime() / 1e9
    val backPhase =
      if (!soloAttempted || backTargets.isEmpty) SoloScheduler.Phase(Nil, backTargets, 0.0)
      else SoloScheduler.phase(backTargets, soloWitness, soloCfg, backBudget,
        childRunner(soloWitness), sleepSec, nowSec)
    // Tail resample: one more child for the planned target, settle
    // included when the back window hasn't already absorbed the suite
    // tail, inside whatever budget remains. min-merged below. The budget
    // guard prices the settle it will actually pay — without that, a
    // budget with floorSec left but not settle+floor slept the settle
    // and then skipped the child, burning 120 s for nothing.
    val resamplePhase = resampleOpt match {
      case Some(name)
        if (frontFigMap.contains(name) || backPhase.figs.exists(_._1 == name)) &&
          backBudget - backPhase.spentSec >= soloCfg.floorSec +
            (if (backPhase.figs.nonEmpty) 0.0 else soloCfg.settleSec) =>
        SoloScheduler.phase(Seq(name), soloWitness,
          if (backPhase.figs.nonEmpty) soloCfg.copy(settleSec = 0.0) else soloCfg,
          backBudget - backPhase.spentSec, childRunner(soloWitness), sleepSec, nowSec)
      case _ => SoloScheduler.Phase(Nil, Nil, 0.0)
    }
    val soloSpent = frontPhase.spentSec + backPhase.spentSec + resamplePhase.spentSec
    val soloFigs: Map[String, Double] =
      (frontPhase.figs ++ backPhase.figs ++ resamplePhase.figs)
        .groupMapReduce(_._1)(_._2)(math.min)
    val solo: Option[Map[String, Double]] =
      if (soloFigs.isEmpty) None else Some(soloFigs)
    // `solo_failed` flags ANY missing figure across BOTH windows — child
    // failure, timeout, or budget-exhausted skip — a partial pass must
    // not read as complete. Targets = front suspects ∪ in-suite top-N.
    val soloTargets =
      if (!soloAttempted) Nil
      else (soloCfg.suspects ++ backTargets).distinct
    val soloMissing = soloTargets.filterNot(soloFigs.contains)
    val soloIncomplete = soloAttempted && soloMissing.nonEmpty
    val soloAnomalous = SoloScheduler.anomalous(soloFigs.toSeq.sortBy(_._1), soloWitness)
    // skipped = budget-exhausted, never attempted by ANY window (and
    // still without a figure); failed = attempted children that produced
    // no figure (crash/timeout/unparseable). Pre-r16 both rode one
    // `skipped` list, which read a child crash as a budget problem (r15
    // advice); r17 closes the residual ambiguity (r16 advice): a target
    // attempted in one window and budget-skipped in another classifies
    // by the ATTEMPT — its child ran and died, that is a failure, not a
    // budget artifact. Either kind flags solo_failed.
    val soloAttemptedNames =
      (frontPhase.attempted ++ backPhase.attempted ++ resamplePhase.attempted).toSet
    val budgetSkipped = (frontPhase.skipped ++ backPhase.skipped ++ resamplePhase.skipped)
      .distinct.filter(soloMissing.contains).filterNot(soloAttemptedNames)
    val soloFailedList = soloMissing.filterNot(budgetSkipped.contains)
    // failed vs failed_hot (r18 verdict #1b; sys class added after
    // preview 6, r19): a child that died while the box was measurably
    // being stolen from (>2 % of capacity across its life) OR under a
    // kernel-time burst (>25 % sys — well above the ~8 % own-work floor
    // the heaviest children read on a quiet box) is a box condition,
    // not a query/machinery problem — the classification that was
    // impossible in the r18 record, where both front children's deaths
    // and the 21 %-steal pass they died under were in separate,
    // unjoinable fields.
    val (soloFailedHot, soloFailedCold) =
      soloFailedList.partition(n => childSteal.getOrElse(n, -1.0) > 2.0 ||
        childSys.getOrElse(n, -1.0) > 25.0)
    val soloMeta =
      if (!soloAttempted) ""
      else BenchRecord.soloBudgetMeta(soloCfg.budgetSec, soloSpent,
        frontPhase.spentSec, budgetSkipped, soloFailedCold, soloFailedHot,
        soloAnomalous, childSteal.toSeq.sortBy(_._1),
        childSys.toSeq.sortBy(_._1))
    // Full record: per-query map FIRST, total LAST — the driver's record
    // keeps only the final 2000 chars of output, and at 87+ queries this
    // line is ~2.1k chars, so whatever clips must be the head, never the
    // total (BENCH_r03 lost the head-positioned total + 4 query names).
    // `start` is pre-Spark (external load); later samples include the
    // bench's own preceding pass. Placed in BOTH lines: the full line is
    // HEAD-clipped by the driver's 2000-char tail capture at 89 queries,
    // so anything that must survive capture has to also ride the compact
    // line.
    val (full, compact) = BenchRecord.render(
      results, solo, soloIncomplete, load, maxPending, sfDir,
      materialized = matNames, prewarmed = prewarmed, soloMeta = soloMeta,
      diagMeta = diagMeta)
    // Belt-and-braces artifact: the complete record as a file, immune to
    // any stdout capture window — rendered with the UNCENSORED diag map
    // (diagMetaAll) so BENCH_FULL carries per-pass vectors for every
    // query, making cross-round per-query diffs exact. The solo child
    // redirects it away from BENCH_FULL.json so it cannot clobber the
    // parent's record.
    val (fullPersisted, _) = BenchRecord.render(
      results, solo, soloIncomplete, load, maxPending, sfDir,
      materialized = matNames, prewarmed = prewarmed, soloMeta = soloMeta,
      diagMeta = diagMetaAll)
    persistFull(fullPersisted)
    if (!(soloAttempted && backWork)) spark.stop()
    // Print AFTER spark.stop() so no executor/shutdown log line can land
    // after the JSON; these must be the last stdout lines.
    println(full)
    println(compact)
  }

  /** Spawn one solo child JVM and parse its per-query map. The child is
    * this same main under SPARK_GRAFT_ONLY=<targets> — same warmups,
    * memo pre-warms, load gates and min-of-2 discipline — started from a
    * cold JVM so none of the parent's 127-plan state (code cache,
    * metaspace, catalyst internals, GC ergonomics) taints the figures.
    * Callers pass ONE query per child (see the solo-pass note in main:
    * co-resident heavy plans distort each other 1.5-2.5x even in a
    * fresh JVM); the child's start gate is bounded at 60 s (r13, was
    * 240: the scheduler's settle + cheapest-first ordering already
    * absorbs the decay, and four children each potentially waiting four
    * minutes for loadavg was a third of the r12 wall overrun — a child
    * that gives up waiting runs anyway and its own record says
    * load_exceeded). `capSec` is the child's total wall allowance,
    * handed down by SoloScheduler from the phase budget.
    * Module opens and heap mirror build.sbt's standalone recipe; the
    * classpath is the parent's own (sbt forks with the full path on the
    * command line, so java.class.path is complete in every launch mode).
    * Any failure — spawn error, rc != 0, timeout, unparseable record —
    * returns None and the record says `solo_failed`; the main figures
    * are never at risk.
    *
    * STEAL-AWARE (r19, r18 verdict #1b): the child's cap is wall-clock,
    * but on a stolen box wall is not capacity — r18's committed run lost
    * BOTH front children on a box whose in-suite ss23 pass read 6,926
    * steal jiffies (21 % of a pass), and the budget they were killed
    * against assumed quiet-box walls. The parent now brackets the
    * child's life with /proc/stat snapshots; when the cap expires AND
    * the measured steal exceeds 2 %, the child gets ONE bounded
    * extension (cap × min(0.5, steal×5) — at the 6.7 % steal r18
    * measured on dd14's hot sample, ~1.33× the quiet cap, matching the
    * observed slowdown) instead of an immediate kill, so a hot box
    * degrades to "figure with a steal annotation" rather than "no
    * figure". The overshoot is bounded at 0.5 × cap for at most the
    * children that would otherwise land nothing; the scheduler's
    * real-clock budget absorbs it by shrinking what follows. Returns
    * the parsed figures plus the steal %-of-capacity measured across
    * the child's whole life (-1 when /proc/stat is unreadable) so the
    * record can annotate both landed and failed children. */
  private def runSoloChild(targets: Seq[String], sfDir: String,
      capSec: Double): (Option[Map[String, Double]], Double, Double) = {
    val childCpu0 = cpuJiffies()
    val childT0 = System.nanoTime()
    def steal: Double = stealPctSince(childCpu0, childT0)
    def sysPct: Double = sysPctSince(childCpu0, childT0)
    try {
      val out = java.nio.file.Files.createTempFile("graft_bench_solo_", ".json")
      val addOpens = Seq(
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
      val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpens ++ Seq(
        s"-Xmx${Runtime.getRuntime.maxMemory() / (1024 * 1024)}m",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"), "graft.Bench")
      System.err.println(s"[bench] solo pass (fresh JVM): ${targets.mkString(",")}")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_ONLY", targets.mkString(","))
      pb.environment().put("SPARK_GRAFT_SOLO_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_FULL_OUT", out.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_LOAD_BOUND_SEC", "60")
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      var done = p.waitFor(math.max(1000L, (capSec * 1000).toLong),
        java.util.concurrent.TimeUnit.MILLISECONDS)
      if (!done) {
        // steal-scaled extension (doc above): one bounded second wait
        // when the box is measurably being stolen from — the cap the
        // child just blew was priced for a quiet box. The sys branch
        // (r19, preview 6): a kernel-reclaim burst slows the child the
        // same way with near-zero steal; >25 % sys (vs the ~8 %
        // own-work floor) gets the same single bounded extension at the
        // max width, since sys share doesn't price the slowdown the
        // way steal does.
        val s = steal
        val sy = sysPct
        if (s > 2.0) {
          val extraSec = capSec * math.min(0.5, s / 100.0 * 5.0)
          System.err.println(
            f"[bench] solo child over cap at steal=$s%.1f%% — extending ${extraSec}%.0f s")
          done = p.waitFor((extraSec * 1000).toLong,
            java.util.concurrent.TimeUnit.MILLISECONDS)
        } else if (sy > 25.0) {
          val extraSec = capSec * 0.5
          System.err.println(
            f"[bench] solo child over cap at sys=$sy%.1f%% (kernel burst) — extending ${extraSec}%.0f s")
          done = p.waitFor((extraSec * 1000).toLong,
            java.util.concurrent.TimeUnit.MILLISECONDS)
        }
      }
      if (!done) {
        p.destroyForcibly()
        // Bounded wait for actual exit: without it the next child JVM can
        // start while this one is still tearing down, briefly co-resident
        // and contaminating the next figure (ADVICE r13).
        p.waitFor(15, java.util.concurrent.TimeUnit.SECONDS)
        System.err.println(
          f"[bench] solo child timed out (steal=$steal%.1f%%, sys=$sysPct%.1f%%)")
        (None, steal, sysPct)
      } else if (p.exitValue() != 0) {
        System.err.println(s"[bench] solo child rc=${p.exitValue()}")
        (None, steal, sysPct)
      } else {
        val record = java.nio.file.Files.readString(out)
        // Surface the child's own query_diag on stderr (r16 verdict #3's
        // instrument): the child record is a temp file the parent
        // discards, and when a solo figure reads anomalous the per-pass
        // GC/heap/dirty vectors in it are the only evidence of why.
        BenchRecord.extractQueryDiag(record).foreach(d =>
          System.err.println(s"[bench] solo child diag: $d"))
        (BenchRecord.parseQueries(record), steal, sysPct)
      }
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] solo child failed: ${e.getMessage}")
      (None, steal, sysPct)
    }
  }
}
