package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws of the serving-bench ceiling search ([[ServingSearch]]) against a
  * SIMULATED pipeline with a known true capacity — the protocol logic is
  * the exact code path the shipped grade uses, so these pins guard the
  * round-15 failure class directly: a grade must never ship `accepted`
  * without a bracketed ceiling, and a poisoned-low calibration must be
  * climbed out of, not graded. */
class ServingSearchSpec extends AnyFunSuite {

  import ServingSearch._

  /** A pipeline of true capacity C: a paced loop at pace ≤ C sustains
    * (glass-flat windows at the pace, no blocked wait); above C it
    * realizes C with the shortfall as visible consumer blocked-wait and
    * rougher windows — the shape a real production-limited loop shows. */
  private def pipeline(capacity: Double)(pace: Double, steady: Int): LoopRes = {
    val m = steady
    if (pace <= capacity)
      LoopRes(Seq.fill(5)(pace), m / pace, 1.0 / pace, 18 + m, pace,
        blockedSec = 0.0, steadyM = m, gcSec = 0.1, pace = Some(pace))
    else {
      val blocked = m * (1.0 / capacity - 1.0 / pace)
      LoopRes(Seq(capacity * 0.93, capacity * 1.07, capacity, capacity, capacity),
        m / capacity, 2.0 / capacity, 18 + m, capacity,
        blockedSec = blocked, steadyM = m, gcSec = 0.3, pace = Some(pace))
    }
  }

  private val cfg = Cfg(budgetSec = 1e9, maxLoops = 10, steadyN = 60,
    probeN = 20, windowNb = 18, minSteady = 10)

  test("poisoned-low calibration climbs to the ceiling instead of grading itself") {
    // the round-15 failure: calibration read 10x low; the old protocol
    // graded it with accepted:true. The search must recover to ~capacity.
    val res = search(calBps = 0.3, cfg, () => 0.0, pipeline(3.0))
    assert(res.accepted, s"expected accepted, got $res")
    assert(res.grade >= 0.9 * 3.0 && res.grade <= 3.0,
      s"grade ${res.grade} not near the 3.0 capacity")
    assert(res.unsustainedAt.exists(_ > 3.0), "failing pace must sit above capacity")
    assert(res.ceilingBps.exists(_ <= 3.0 + 1e-9))
    assert(!res.ceilingNotFound)
    assert(res.attempts.size <= cfg.maxLoops)
  }

  test("calibration at capacity still produces a bracket before accepting") {
    val res = search(calBps = 3.0, cfg, () => 0.0, pipeline(3.0))
    assert(res.accepted)
    assert(res.grade >= 0.9 * 3.0 && res.grade <= 3.0)
    // the bracket exists: a pace ABOVE the grade verifiably failed
    assert(res.unsustainedAt.exists(_ > res.grade))
    assert(res.attempts.exists(l => !sustained(l)), "no failing loop on record")
  }

  test("calibration above capacity descends to a sustainable rung") {
    val res = search(calBps = 9.0, cfg, () => 0.0, pipeline(3.0))
    assert(res.accepted)
    assert(res.grade >= 0.8 * 3.0 && res.grade <= 3.0,
      s"grade ${res.grade} not near the 3.0 capacity")
    assert(res.unsustainedAt.exists(_ > res.grade))
  }

  test("budget exhaustion before the bracket ships ceiling_not_found, never accepted") {
    // capacity effectively infinite: every pace sustains, the ceiling is
    // never found; a tiny budget stops the search after the first loop
    val res = search(calBps = 1.0,
      cfg.copy(budgetSec = 1e-6), () => 0.0, pipeline(1e12))
    assert(res.attempts.size == 1)
    assert(res.ceilingNotFound, "no failing pace was ever observed")
    assert(!res.accepted, "a grade without a bracket must not ship accepted")
  }

  test("nothing ever sustains: all loops vote, never accepted") {
    // every loop shows a box-state event (rough windows + blocked wait)
    def broken(pace: Double, steady: Int): LoopRes =
      LoopRes(Seq(0.1, 1.0, 0.5, 0.2, 0.9), steady / 0.5, 10.0, 18 + steady,
        0.5, blockedSec = steady, steadyM = steady, gcSec = 5.0, pace = Some(pace))
    val res = search(calBps = 2.0, cfg, () => 0.0, broken)
    assert(res.attempts.size == cfg.maxLoops) // searched to the loop cap
    assert(!res.accepted)
    assert(res.ceilingBps.isEmpty)
    assert(res.grade == 0.5) // honest realized rate, flagged unaccepted
  }

  test("one box-state event mid-search does not poison the grade") {
    // the 3rd loop hits a GC storm (rough windows) regardless of pace;
    // the search must still converge and the bad loop must not vote
    var calls = 0
    def flaky(pace: Double, steady: Int): LoopRes = {
      calls += 1
      if (calls == 3)
        LoopRes(Seq(0.2, 2.0, 1.0, 0.4, 1.4), steady / 1.0, 8.0, 18 + steady,
          1.0, blockedSec = steady * 0.5, steadyM = steady, gcSec = 8.0,
          pace = Some(pace))
      else pipeline(3.0)(pace, steady)
    }
    val res = search(calBps = 2.0, cfg, () => 0.0, flaky)
    assert(res.accepted)
    assert(res.grade >= 0.8 * 3.0 && res.grade <= 3.0)
    assert(res.voters.forall(sustained))
  }

  test("a lucky one-off sustained outlier neither traps the search nor carries the grade") {
    // observed on a real sf0.01 session: one loop sustained 3.97 during a
    // good host moment, then six probes at 6.38 all realized ~3.0 — under
    // a max-anchored credibility rule none of those failures were ever
    // believed and the search burned to the loop cap unaccepted. The
    // retry-cap + reproducible-rung rules must converge to ~capacity.
    var call = 0
    def lucky(pace: Double, steady: Int): LoopRes = {
      call += 1
      pipeline(if (call == 2) 4.2 else 3.0)(pace, steady)
    }
    val res = search(calBps = 2.5, cfg, () => 0.0, lucky)
    assert(res.accepted, s"expected accepted, got $res")
    assert(res.grade <= 3.0 + 1e-9, s"grade ${res.grade} above steady capacity")
    assert(res.grade >= 0.75 * 3.0, s"grade ${res.grade} too conservative")
    // the outlier stays visible as the best single sustained rate
    assert(res.ceilingBps.exists(_ > 3.0))
    assert(res.unsustainedAt.exists(_ > res.grade))
  }

  test("a host that degrades MID-SEARCH still converges to an honest bracketed grade") {
    // observed live at sf0.1: one pace sustained early, credibly failed
    // at the same pace later (the host moved down mid-session); the
    // search must descend and re-anchor instead of looping or accepting
    // the stale rung
    var call = 0
    def drifting(pace: Double, steady: Int): LoopRes = {
      call += 1
      val capNow = math.max(1.5, 3.0 - 0.3 * call) // decays 2.7 → 1.5
      pipeline(capNow)(pace, steady)
    }
    val res = search(calBps = 2.6, cfg, () => 0.0, drifting)
    assert(res.grade <= 3.0, s"grade ${res.grade} above any capacity seen")
    assert(res.grade >= 1.0, s"grade ${res.grade} collapsed below the floor")
    // whatever it graded, the evidence rules held
    if (res.accepted) {
      assert(res.unsustainedAt.isDefined && res.voters.size >= 2)
      assert(res.unsustainedAt.get > res.grade)
    }
  }

  test("law: accepted implies a bracketed grade (randomized capacities/calibrations)") {
    val rnd = new scala.util.Random(42)
    (1 to 60).foreach { i =>
      val cap = 0.2 + rnd.nextDouble() * 9.8
      val cal = cap * (0.1 + rnd.nextDouble() * 3.0) // 0.1x under to 3.1x over
      val budget = if (i % 5 == 0) 1e-6 else 1e9 // a fifth of the runs starve
      val res = search(cal, cfg.copy(budgetSec = budget), () => 0.0, pipeline(cap))
      if (res.accepted) {
        assert(res.unsustainedAt.isDefined && res.ceilingBps.isDefined,
          s"i=$i cap=$cap cal=$cal: accepted without a bracket")
        assert(res.unsustainedAt.get > res.grade,
          s"i=$i: failing pace must sit above the grade")
        assert(res.grade <= res.ceilingBps.get + 1e-9)
        assert(res.grade <= cap + 1e-9,
          s"i=$i cap=$cap: graded ${res.grade} above true capacity")
        assert(res.voters.size >= 2)
      }
      // whether accepted or not, the grade never exceeds true capacity
      assert(res.grade <= cap + 1e-9, s"i=$i cap=$cap grade=${res.grade}")
    }
  }
}
