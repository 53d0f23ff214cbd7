package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s.jackson.JsonMethods.parse

/** Pins the solo phase's composed wall-time behavior with a stub child
  * and a fake clock (r12 verdict #1/#4: every piece of the solo
  * machinery was individually correct, but the composition — settle +
  * children + rerun loop — had no total ceiling, was never examined as a
  * whole, and blew past the driver's bench bound, shipping rc=124 and no
  * solo map). The budget math asserted here is the invariant the r12
  * verdict asked for: no schedule, whatever the child walls, may spend
  * past the budget by more than one child's own (remaining-capped)
  * allowance — and since each child's cap IS min(childCap, remaining),
  * spent can never exceed budget at all when children honor their cap. */
class SoloSchedulerSpec extends AnyFunSuite {
  import SoloScheduler.Config

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

  test("children run cheapest-first and the heaviest gets one tail resample, min kept") {
    val b = new Box
    val r = SoloScheduler.run(targets, inSuite, Config(600, 120, 300, 60),
      b.child(Map.empty.withDefaultValue(30.0), n => Some(inSuite(n) * 0.8)),
      b.sleep, b.now)
    assert(b.calls.map(_._1).toList == List("cheap", "mid", "heavy", "heavy"))
    assert(r.figs.toMap == inSuite.map { case (k, v) => k -> v * 0.8 })
    assert(r.skipped.isEmpty && r.anomalous.isEmpty)
    // settle + 4 children x 30 s
    assert(r.spentSec == 120.0 + 4 * 30.0)
  }

  test("pinned suspects run first in list order; budget exhaustion skips non-suspects (r13 #4)") {
    val b = new Box
    val cfg = Config(600, 120, 300, 60,
      suspects = Seq("heavy", "mid")) // heavy=dd14-analogue, mid=dd12-analogue
    val r = SoloScheduler.run(targets, inSuite, cfg,
      b.child(Map.empty.withDefaultValue(30.0), n => Some(inSuite(n) * 0.8)),
      b.sleep, b.now)
    // suspects in pinned order, then the rest cheapest-first; the MOST
    // SUSPECT (not the heaviest) gets the tail resample
    assert(b.calls.map(_._1).toList == List("heavy", "mid", "cheap", "heavy"))
    assert(r.figs.toMap == inSuite.map { case (k, v) => k -> v * 0.8 })
    // budget fits settle + two children only: the skipped target must be
    // the non-suspect, never the distortion suspects
    val b2 = new Box
    val r2 = SoloScheduler.run(targets, inSuite,
      Config(260, 120, 300, 60, suspects = Seq("heavy", "mid")),
      b2.child(Map.empty.withDefaultValue(60.0), n => Some(inSuite(n))),
      b2.sleep, b2.now)
    assert(b2.calls.map(_._1).toList == List("heavy", "mid"))
    assert(r2.skipped == Seq("cheap"))
  }

  test("hard budget: spawning stops at the floor, skipped is reported, spent <= budget") {
    val b = new Box
    // each child eats its full cap; budget fits settle + barely one child
    val r = SoloScheduler.run(targets, inSuite, Config(300, 120, 300, 60),
      b.child(Map.empty.withDefaultValue(1e9), _ => None), b.sleep, b.now)
    // child 1 got cap = remaining (180), timed out at it; remaining 0 < floor
    assert(b.calls.toList == List("cheap" -> 180.0))
    assert(r.skipped == Seq("mid", "heavy"))
    assert(r.figs.isEmpty)
    assert(r.spentSec <= 300.0 + 1e-9, s"spent ${r.spentSec} past budget")
  }

  test("per-child cap is min(childCap, remaining) — never hands out more than is left") {
    val b = new Box
    SoloScheduler.run(targets, inSuite, Config(600, 0, 250, 60),
      b.child(Map.empty.withDefaultValue(240.0), n => Some(inSuite(n))), b.sleep, b.now)
    // child1 cap 250 (childCap), child2 cap min(250, 360)=250, child3 min(250,120)=120
    assert(b.calls.toList == List("cheap" -> 250.0, "mid" -> 250.0, "heavy" -> 120.0))
    b.calls.zip(Iterator.iterate(600.0)(_ - 240.0).take(b.calls.size).toSeq)
      .foreach { case ((_, cap), rem) => assert(cap <= rem + 1e-9) }
  }

  test("settle is truncated to the budget; an empty target list spends nothing") {
    val b = new Box
    val r = SoloScheduler.run(Seq("cheap"), inSuite, Config(50, 120, 300, 60),
      b.child(Map.empty.withDefaultValue(1.0), _ => Some(1.0)), b.sleep, b.now)
    assert(b.t == 50.0 && r.skipped == Seq("cheap") && r.spentSec <= 50.0)
    val b2 = new Box
    val r2 = SoloScheduler.run(Nil, inSuite, Config(600, 120, 300, 60),
      b2.child(Map.empty.withDefaultValue(1.0), _ => Some(1.0)), b2.sleep, b2.now)
    assert(b2.t == 0.0 && r2.figs.isEmpty && r2.spentSec == 0.0)
  }

  test("a figure above 1.25x its in-suite witness is flagged anomalous but still recorded") {
    val b = new Box
    val r = SoloScheduler.run(targets, inSuite, Config(600, 0, 300, 60),
      b.child(Map.empty.withDefaultValue(5.0),
        n => Some(if (n == "mid") inSuite(n) * 2.0 else inSuite(n) * 0.9)),
      b.sleep, b.now)
    assert(r.anomalous == Seq("mid"))
    assert(r.figs.toMap.get("mid").contains(10.0))
  }

  test("no heaviest resample when its first child failed or the budget is gone") {
    val b = new Box
    val r = SoloScheduler.run(targets, inSuite, Config(600, 0, 300, 60),
      b.child(Map.empty.withDefaultValue(5.0),
        n => if (n == "heavy") None else Some(inSuite(n))), b.sleep, b.now)
    assert(b.calls.count(_._1 == "heavy") == 1)
    assert(r.figs.map(_._1).toSet == Set("cheap", "mid"))
    // budget exhausted right after the first loop: resample must not spawn
    // (3 children x 50 s fit a 200 s budget, the leftover 50 s is under
    // the 60 s floor)
    val b2 = new Box
    val r2 = SoloScheduler.run(targets, inSuite, Config(200, 0, 50, 60),
      b2.child(Map.empty.withDefaultValue(50.0), n => Some(inSuite(n))), b2.sleep, b2.now)
    assert(b2.calls.count(_._1 == "heavy") == 1)
    assert(r2.figs.size == 3 && r2.spentSec <= 200.0 + 1e-9)
  }

  test("the record's full line carries the solo_budget telemetry") {
    val load =
      """"load_1min":{"start":1.00,"end":1.20},"load_gate":{"limit":1.50,"bound_sec":300}"""
    val meta =
      ""","solo_budget":{"sec":600.00,"spent":412.30,"skipped":["dd14_policy_cut"],"anomalous":["tx20_bigram_lm"]}"""
    val (full, compact) = BenchRecord.render(
      Seq("a" -> 1.0), Some(Map("a" -> 0.9)), soloIncomplete = true,
      load, 0, "/d", Nil, Nil, soloMeta = meta)
    val j = parse(full)
    assert((j \ "solo_budget" \ "spent").values == 412.30)
    assert((j \ "solo_budget" \ "skipped").values == List("dd14_policy_cut"))
    assert((j \ "solo_failed").values == true)
    // compact line stays lean; the signal it must carry is figures + flag
    assert(!compact.contains("solo_budget"))
    assert(compact.contains("\"solo_failed\":true"))
  }
}
