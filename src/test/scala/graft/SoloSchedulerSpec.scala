package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s.jackson.JsonMethods.parse

/** Pins the solo machinery's composed wall-time behavior with a stub
  * child and a fake clock (r12 verdict #1/#4: every piece of the solo
  * machinery was individually correct, but the composition — settle +
  * children + rerun loop — had no total ceiling, was never examined as a
  * whole, and blew past the driver's bench bound, shipping rc=124 and no
  * solo map). Since r15 the machinery runs as TWO windows sharing one
  * hard budget: FRONT (pinned suspects on the quiet pre-suite box, no
  * settle) and BACK (post-suite top-N the front missed, settle first,
  * plus one time-spaced resample of the first front suspect). The budget
  * invariant asserted here: each window spends at most what it is handed,
  * and the back window is handed exactly budget − front.spent — so the
  * total can never exceed the budget when children honor their caps. */
class SoloSchedulerSpec extends AnyFunSuite {
  import SoloScheduler.{Config, Phase}

  /** Fake clock + a child that consumes a fixed wall and returns a
    * figure. `walls(name)` = the stub child's wall; `figs(name)` = its
    * reported figure (None = child failure). */
  private class Box {
    var t = 0.0
    val calls = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    def now(): Double = t
    def sleep(sec: Double): Unit = { require(sec >= 0, s"negative sleep $sec"); t += sec }
    def child(walls: Map[String, Double], figs: String => Option[Double])(
        name: String, capSec: Double): Option[Double] = {
      calls += name -> capSec
      // walls(name), not getOrElse — withDefaultValue only backs apply()
      val wall = math.min(walls(name), capSec)
      t += wall
      // a child that hits its cap is killed: no figure
      if (walls(name) > capSec) None else figs(name)
    }
  }

  private val inSuite = Map("cheap" -> 1.0, "mid" -> 5.0, "heavy" -> 20.0)
  private val targets = Seq("heavy", "mid", "cheap") // caller passes slowest-first

  test("phase: children run slowest-first when no suspects are pinned (r16)") {
    // The back window's targets are the in-suite top-N; children all cost
    // roughly the same wall, so the heaviest figure — the most valuable
    // and the likeliest distortion victim — must never be the budget's
    // casualty. (The r16 preview's cheapest-first spent the budget on the
    // 4.5 s tail while the two heaviest new entrants got nothing.)
    val b = new Box
    val r = SoloScheduler.phase(targets, inSuite, Config(600, 120, 300, 60), 600,
      b.child(Map.empty.withDefaultValue(30.0), n => Some(inSuite(n) * 0.8)),
      b.sleep, b.now)
    assert(b.calls.map(_._1).toList == List("heavy", "mid", "cheap"))
    assert(r.figs.toMap == inSuite.map { case (k, v) => k -> v * 0.8 })
    assert(r.skipped.isEmpty)
    assert(r.spentSec == 120.0 + 3 * 30.0) // settle + 3 children x 30 s
    // exhaustion sacrifices the TAIL: budget fits settle + two children
    val b2 = new Box
    val r2 = SoloScheduler.phase(targets, inSuite, Config(600, 120, 300, 60), 260,
      b2.child(Map.empty.withDefaultValue(60.0), n => Some(inSuite(n))),
      b2.sleep, b2.now)
    assert(b2.calls.map(_._1).toList == List("heavy", "mid"))
    assert(r2.skipped == Seq("cheap"))
  }

  test("phase: pinned suspects run first in list order; exhaustion skips non-suspects (r13 #4)") {
    val b = new Box
    val cfg = Config(600, 120, 300, 60,
      suspects = Seq("heavy", "mid")) // heavy=dd14-analogue, mid=dd12-analogue
    val r = SoloScheduler.phase(targets, inSuite, cfg, 600,
      b.child(Map.empty.withDefaultValue(30.0), n => Some(inSuite(n) * 0.8)),
      b.sleep, b.now)
    assert(b.calls.map(_._1).toList == List("heavy", "mid", "cheap"))
    assert(r.figs.toMap == inSuite.map { case (k, v) => k -> v * 0.8 })
    // budget fits settle + two children only: the skipped target must be
    // the non-suspect, never the distortion suspects
    val b2 = new Box
    val r2 = SoloScheduler.phase(targets, inSuite,
      Config(600, 120, 300, 60, suspects = Seq("heavy", "mid")), 260,
      b2.child(Map.empty.withDefaultValue(60.0), n => Some(inSuite(n))),
      b2.sleep, b2.now)
    assert(b2.calls.map(_._1).toList == List("heavy", "mid"))
    assert(r2.skipped == Seq("cheap"))
  }

  test("phase: hard budget — spawning stops at the floor, skipped reported, spent <= budget") {
    val b = new Box
    // each child eats its full cap; budget fits settle + barely one child
    val r = SoloScheduler.phase(targets, inSuite, Config(600, 120, 300, 60), 300,
      b.child(Map.empty.withDefaultValue(1e9), _ => None), b.sleep, b.now)
    // child 1 got cap = remaining (180), timed out at it; remaining 0 < floor
    assert(b.calls.toList == List("heavy" -> 180.0))
    assert(r.skipped == Seq("mid", "cheap"))
    assert(r.figs.isEmpty)
    assert(r.spentSec <= 300.0 + 1e-9, s"spent ${r.spentSec} past budget")
  }

  test("phase: attempted lists every spawned target, landed or not; skipped never overlap (r16 advice)") {
    // A target whose child ran and died must be distinguishable from one
    // the budget never reached — the main classifies attempted-anywhere
    // as FAILED even when another window later budget-skipped it.
    val b = new Box
    val r = SoloScheduler.phase(targets, inSuite, Config(600, 120, 300, 60), 260,
      b.child(Map.empty.withDefaultValue(60.0),
        n => if (n == "heavy") None else Some(inSuite(n))), // heavy's child dies
      b.sleep, b.now)
    assert(r.attempted == Seq("heavy", "mid"), "both spawned children are attempted")
    assert(r.skipped == Seq("cheap"), "only the never-spawned target is skipped")
    assert(r.attempted.intersect(r.skipped).isEmpty)
    assert(r.figs.map(_._1) == Seq("mid"), "the dead child lands no figure")
  }

  test("phase: per-child cap is min(childCap, remaining) — never hands out more than is left") {
    val b = new Box
    SoloScheduler.phase(targets, inSuite, Config(600, 0, 250, 60), 600,
      b.child(Map.empty.withDefaultValue(240.0), n => Some(inSuite(n))), b.sleep, b.now)
    // child1 cap 250 (childCap), child2 cap min(250, 360)=250, child3 min(250,120)=120
    assert(b.calls.toList == List("heavy" -> 250.0, "mid" -> 250.0, "cheap" -> 120.0))
    b.calls.zip(Iterator.iterate(600.0)(_ - 240.0).take(b.calls.size).toSeq)
      .foreach { case ((_, cap), rem) => assert(cap <= rem + 1e-9) }
  }

  test("phase: settle is truncated to the budget; empty targets or budget spend nothing") {
    val b = new Box
    val r = SoloScheduler.phase(Seq("cheap"), inSuite, Config(600, 120, 300, 60), 50,
      b.child(Map.empty.withDefaultValue(1.0), _ => Some(1.0)), b.sleep, b.now)
    assert(b.t == 50.0 && r.skipped == Seq("cheap") && r.spentSec <= 50.0)
    val b2 = new Box
    val r2 = SoloScheduler.phase(Nil, inSuite, Config(600, 120, 300, 60), 600,
      b2.child(Map.empty.withDefaultValue(1.0), _ => Some(1.0)), b2.sleep, b2.now)
    assert(b2.t == 0.0 && r2.figs.isEmpty && r2.spentSec == 0.0)
    // zero budget (front window ate everything): nothing spawns, all skipped
    val b3 = new Box
    val r3 = SoloScheduler.phase(targets, inSuite, Config(600, 120, 300, 60), 0,
      b3.child(Map.empty.withDefaultValue(1.0), _ => Some(1.0)), b3.sleep, b3.now)
    assert(b3.t == 0.0 && r3.skipped == targets && r3.figs.isEmpty)
  }

  test("anomalous: a figure above 1.25x its in-suite witness is flagged; no witness = never") {
    val figs = Seq("cheap" -> 0.9, "mid" -> 10.0, "front_only" -> 99.0)
    assert(SoloScheduler.anomalous(figs, inSuite) == Seq("mid"))
  }

  test("backPlan: top-N minus front-landed; resample = first pinned suspect with a front fig") {
    val cfg = Config(600, 120, 300, 60, suspects = Seq("heavy", "mid"))
    val suite = Seq("heavy" -> 20.0, "mid" -> 5.0, "cheap" -> 1.0, "newbie" -> 8.0)
    // front landed both suspects; newbie climbed into the top-3
    val (back, res) = SoloScheduler.backPlan(
      Seq("heavy" -> 3.0, "mid" -> 2.0), suite, topN = 3, cfg)
    assert(back == Seq("newbie"))
    assert(res.contains("heavy"))
    // front landed nothing (e.g. suspects env-cleared): back = full top-N,
    // resample falls back to the heaviest back target (pre-r15 behavior)
    val (back2, res2) = SoloScheduler.backPlan(Nil, suite, 2, Config(600, 120, 300, 60))
    assert(back2 == Seq("heavy", "newbie") && res2.contains("heavy"))
    // failed queries (wall -1) never become targets
    val (back3, _) = SoloScheduler.backPlan(Nil, Seq("a" -> -1.0, "b" -> 2.0), 2, cfg)
    assert(back3 == Seq("b"))
    // a front-MISSED pin leads the back list even when its in-suite wall
    // keeps it out of the top-N (r19: two previews lost dd14's ~4s-wall
    // figure to a front timeout because only top-N queries got retried) —
    // and a pin whose in-suite run FAILED stays excluded
    val (back4, res4) = SoloScheduler.backPlan(
      Seq("heavy" -> 3.0), suite, topN = 2, cfg)
    assert(back4 == Seq("mid", "newbie"),
      "the missed cheap pin must lead, then the unlanded top-N")
    assert(res4.contains("heavy"))
    val (back5, _) = SoloScheduler.backPlan(
      Seq("heavy" -> 3.0), Seq("heavy" -> 20.0, "mid" -> -1.0, "newbie" -> 8.0),
      topN = 2, cfg)
    assert(back5 == Seq("newbie"), "an in-suite-failed pin is not retried")
  }

  test("front cap is fail-soft: hot front children cannot starve the back window (r17 verdict #1)") {
    // r17's failure: the front window spent from the WHOLE budget, three
    // hot children burned 800.36/800 s, the back window got zero and no
    // solo figure landed anywhere. With the front handed frac × budget
    // (main's SOLO_FRONT_FRAC, default 0.6), even children that all run
    // to their caps leave the back window >= (1 - frac) × budget.
    val budget = 800.0
    val frac = 0.6
    val cfg = Config(budget, 120, 300, 120, suspects = Seq("heavy", "mid"))
    val b = new Box
    // every child hangs to its cap and lands nothing — the r17 box
    val front = SoloScheduler.phase(cfg.suspects, Map.empty,
      cfg.copy(settleSec = 0.0), budget * frac,
      b.child(Map.empty.withDefaultValue(1e9), _ => None), b.sleep, b.now)
    assert(front.figs.isEmpty, "hot children land nothing")
    assert(front.spentSec <= budget * frac + 1e-9,
      s"front spent ${front.spentSec}, past its ${budget * frac} cap")
    val backBudget = math.max(0.0, budget - front.spentSec)
    assert(backBudget >= budget * (1 - frac) - 1e-9,
      s"back window handed $backBudget, starved below ${budget * (1 - frac)}")
    // and the back window can still settle + run at least one child
    assert(backBudget >= cfg.settleSec + cfg.floorSec,
      "the guaranteed remainder must fit settle + one child")
    // front children were capped so a cap-hitting child is killed at the
    // remaining front budget, never at the global childCap beyond it
    b.calls.foreach { case (_, cap) => assert(cap <= 300.0 + 1e-9) }
  }

  test("composed front+back shares one budget: back gets exactly budget - front.spent") {
    val cfg = Config(400, 120, 300, 60, suspects = Seq("heavy", "mid"))
    val b = new Box
    val child: (String, Double) => Option[Double] =
      b.child(Map.empty.withDefaultValue(100.0), n => Some(inSuite(n) * 0.5))
    // FRONT: suspects, no settle, on the quiet box — main's exact call shape
    val front = SoloScheduler.phase(cfg.suspects, Map.empty,
      cfg.copy(settleSec = 0.0), cfg.budgetSec, child, b.sleep, b.now)
    assert(front.figs.map(_._1) == Seq("heavy", "mid") && front.spentSec == 200.0)
    // ... suite runs here (off the solo budget) ...
    val suiteRes = Seq("heavy" -> 20.0, "mid" -> 5.0, "cheap" -> 1.0)
    val (back, res) = SoloScheduler.backPlan(front.figs, suiteRes, 3, cfg)
    assert(back == Seq("cheap") && res.contains("heavy"))
    val backBudget = math.max(0.0, cfg.budgetSec - front.spentSec) // 200
    val backPhase = SoloScheduler.phase(back, inSuite, cfg, backBudget, child, b.sleep, b.now)
    // settle 120 + cheap 80 (capped at remaining) = 200; cheap hit its cap -> no fig
    assert(backPhase.spentSec <= backBudget + 1e-9)
    // resample refused: remaining = 0 < floor (main's guard)
    assert(backBudget - backPhase.spentSec < cfg.floorSec)
    val total = front.spentSec + backPhase.spentSec
    assert(total <= cfg.budgetSec + 1e-9, s"total $total past budget ${cfg.budgetSec}")
  }

  test("resample is min-merged and time-spaced: second sample never raises a figure") {
    // main's merge: (front ++ back ++ resample) groupMapReduce min
    val merged = (Seq("heavy" -> 6.97) ++ Nil ++ Seq("heavy" -> 3.9))
      .groupMapReduce(_._1)(_._2)(math.min)
    assert(merged == Map("heavy" -> 3.9))
    val worse = (Seq("heavy" -> 3.9) ++ Nil ++ Seq("heavy" -> 7.0))
      .groupMapReduce(_._1)(_._2)(math.min)
    assert(worse == Map("heavy" -> 3.9))
  }

  test("the record's full line carries the solo_budget telemetry") {
    val load =
      """"load_1min":{"start":1.00,"end":1.20},"load_gate":{"limit":1.50,"bound_sec":300}"""
    val meta =
      ""","solo_budget":{"sec":720.00,"spent":412.30,"front_spent":390.10,"skipped":["dd14_policy_cut"],"anomalous":["tx20_bigram_lm"]}"""
    val (full, compact) = BenchRecord.render(
      Seq("a" -> 1.0), Some(Map("a" -> 0.9)), soloIncomplete = true,
      load, 0, "/d", Nil, Nil, soloMeta = meta)
    val j = parse(full)
    assert((j \ "solo_budget" \ "spent").values == 412.30)
    assert((j \ "solo_budget" \ "front_spent").values == 390.10)
    assert((j \ "solo_budget" \ "skipped").values == List("dd14_policy_cut"))
    assert((j \ "solo_failed").values == true)
    // compact line stays lean; the signal it must carry is figures + flag
    assert(!compact.contains("solo_budget"))
    assert(compact.contains("\"solo_failed\":true"))
  }
}
