package graft

/** One serving loop's measurement: per-window steady rates, wall
  * seconds, max inter-delivery gap, total batches, steady-region
  * average rate, consumer blocked-wait seconds past paced due times,
  * steady delivery count, GC seconds during the loop, and the pace it
  * ran at (None = open loop). */
private[graft] final case class LoopRes(rates: Seq[Double], sec: Double,
    maxGap: Double, nb: Int, avg: Double, blockedSec: Double,
    steadyM: Int, gcSec: Double, pace: Option[Double])

/** The serving bench's ceiling search (round 16), factored out of
  * [[Bench]] as a pure function over an injected loop runner so the
  * protocol's laws are unit-testable against a SIMULATED pipeline
  * (ServingSearchSpec) — the shipped grade logic and the spec'd logic
  * are the same code path.
  *
  * Why a search: a paced loop that sustains its pace with blocked-wait
  * ≈ 0 proves only a LOWER BOUND — the round-15 protocol graded the
  * first number it tried (the open-loop calibration), which a degraded
  * moment could lock 10× low with `accepted:true`. "Can sustain X,
  * cannot sustain ~1.3X" is a capacity measurement. The search CLIMBS
  * while sustained (×1.3 per rung, ×1.6 while glass-flat with ~zero
  * blocked wait) until a loop FAILS its own sustained check, or
  * DESCENDS from an unsustainable start until one sustains; either way
  * the ceiling ends up bracketed — a sustained rate below, a failing
  * pace above. Once bracketed, the top rung re-runs until ≥2 loops
  * there agree (the reproducibility voters). A wall-clock budget bounds
  * the search on a degraded host; running out before the bracket exists
  * ships `ceilingNotFound = true` and `accepted = false`, never an
  * unprobed number dressed as a grade.
  */
private[graft] object ServingSearch {

  /** Window rates inside one loop spreading more than this means the
    * loop saw a box-state event (GC storm, competing process) — that
    * loop is not SUSTAINED and cannot vote. */
  val DispBound = 1.5

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2 // true midpoint, not the optimistic upper
  }

  def disp(xs: Seq[Double]): Double = xs.max / math.max(xs.min, 1e-9)

  /** A loop SUSTAINED its pace when its windows held together and the
    * consumer's blocked-wait past due times stayed under 5% of the
    * steady wall (steadyM/avg seconds — steadyM comes from the loop
    * itself, the same productionWindow-derived count its rate split
    * uses, so the threshold can never desync from the window split). */
  def sustained(l: LoopRes): Boolean =
    disp(l.rates) <= DispBound && l.blockedSec <= 0.05 * l.steadyM / l.avg

  /** @param budgetSec wall budget for the whole search
    * @param maxLoops  paced-loop cap
    * @param steadyN   steady deliveries for CONFIRM loops (full length)
    * @param probeN    steady deliveries for pre-bracket probe loops
    * @param windowNb  fetch-ahead transient (capacity + parallelism)
    * @param minSteady floor on the steady region (2 × window count) */
  final case class Cfg(budgetSec: Double, maxLoops: Int, steadyN: Int,
      probeN: Int, windowNb: Int, minSteady: Int)

  /** @param attempts every paced loop, in run order
    * @param grade    median of the voters' realized rates (all loops if
    *                 none sustained — `accepted` is false then)
    * @param voters   the highest REPRODUCIBLE rung: sustained loops in
    *                 the best 1.25× band holding ≥2 members (top band of
    *                 one only when nothing reproduced)
    * @param chosen   the grading loop with the tightest window spread
    *                 (the smoothness exhibit) */
  final case class Result(attempts: Seq[LoopRes], grade: Double,
      voters: Seq[LoopRes], ceilingBps: Option[Double],
      unsustainedAt: Option[Double], ceilingNotFound: Boolean,
      accepted: Boolean, chosen: LoopRes)

  /** Run the search. `elapsed` returns seconds since the search budget
    * started; `runLoop(paceBps, steadyLen)` executes one paced closed
    * loop (the caller owns GC breathers, stagger, and real timing). */
  def search(calBps: Double, cfg: Cfg, elapsed: () => Double,
      runLoop: (Double, Int) => LoopRes): Result = {
    val attempts = scala.collection.mutable.ArrayBuffer.empty[LoopRes]
    def sustSet = attempts.filter(sustained).toSeq
    def unsSet = attempts.filterNot(sustained).toSeq
    def topSust: Option[LoopRes] = sustSet.sortBy(_.avg).lastOption
    // CREDIBLE failures: a loop paced over the true ceiling is
    // production-limited — it realizes ≈ capacity, i.e. AT LEAST the best
    // already-proven sustained rate. A single failing loop that realized
    // BELOW a rate this session already sustained is contradictory
    // evidence — a box-state event (GC storm, host dip), not a ceiling —
    // so it is RETRIED rather than believed. But consistency restores
    // credibility: two back-to-back failures at the same pace are not two
    // independent storms — they are the capacity speaking, and the
    // earlier higher sustained rate was the lucky moment (a real sf0.01
    // session hit exactly this: one loop sustained 3.97, six retries at
    // 6.38 all realized ~3.0 — the 3.97 was the outlier). Failures are
    // therefore tagged credible AT INSERTION: genuinely fast enough, or
    // the second consecutive failure at one pace (ServingSearchSpec pins
    // both directions).
    val credibleFlag = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def credibleUns = attempts.toSeq.zip(credibleFlag)
      .collect { case (l, cred) if !sustained(l) && cred => l }
    // bracket: a CREDIBLE unsustained loop paced ABOVE the grade rung —
    // the two sides pin the ceiling between them
    def bracketed: Boolean = topSust.exists(t =>
      credibleUns.exists(_.pace.exists(_ > t.avg / 1.25)))
    // voters: the highest REPRODUCIBLE rung — for each sustained loop as
    // anchor (best first), the sustained loops within its 1.25× band; the
    // first band with ≥2 members wins. A rate sustained only once (the
    // lucky-moment outlier) cannot carry the grade alone; it falls back
    // to the top band only when nothing reproduced.
    def voters: Seq[LoopRes] = {
      val anchors = sustSet.sortBy(-_.avg)
      val bands = anchors.map(a =>
        sustSet.filter(l => l.avg >= a.avg / 1.25 && l.avg <= a.avg + 1e-12))
      bands.find(_.size >= 2).orElse(bands.headOption).getOrElse(Nil)
    }
    var pace = calBps
    var retries = 0 // consecutive non-credible failures at the current pace
    var stop = false
    while (!stop && attempts.size < cfg.maxLoops) {
      val nextSteady = if (bracketed) cfg.steadyN else cfg.probeN
      val nextNb = cfg.windowNb + math.max(nextSteady, cfg.minSteady)
      // never start a loop the budget can't afford (nb/pace is the
      // paced loop's wall-clock lower bound)
      if (attempts.nonEmpty && elapsed() + nextNb / pace > cfg.budgetSec) stop = true
      else {
        val l = runLoop(pace, nextSteady)
        attempts += l
        val fastEnough = topSust.forall(t => l.avg >= t.avg * 0.98)
        credibleFlag += (sustained(l) || fastEnough || retries >= 1)
        if (bracketed && voters.size >= 2) stop = true
        else if (sustained(l)) {
          retries = 0
          pace =
            if (bracketed) {
              // confirm the grade rung: the anchor of the current voter
              // band (== topSust until a band of 2 exists)
              voters.map(_.avg).max
            }
            else if (disp(l.rates) <= 1.05 &&
              l.blockedSec <= 0.01 * l.steadyM / l.avg)
              math.max(l.avg, pace) * 1.6 // glass-flat: far from the ceiling
            else math.max(l.avg, pace) * 1.3 // climbing
        } else if (sustSet.isEmpty) {
          retries = 0
          pace = 0.85 * math.max(l.avg, 1e-3) // descend toward a sustainable floor
        } else if (!credibleFlag.last) {
          retries += 1
          // box event, not a ceiling: retry the same pace once
        } else {
          retries = 0
          // approach from above: the failing loop's REALIZED rate is the
          // best capacity estimate (production-limited), so probe just
          // under it. No clamp to the best sustained rate — when repeated
          // failures say the capacity sits BELOW a once-sustained outlier,
          // the search must be allowed to descend off the fluke rung.
          pace = 0.95 * math.max(l.avg, 1e-3)
        }
      }
    }
    // GRADE: median of the voters — the highest reproducible sustained
    // rung. A loop that verifiably hit a box-state event reports its rate
    // in `runs` but does not vote. If NO loop ever sustained, all vote
    // and `accepted` stays false.
    val ordered = attempts.toSeq
    val voterSet = voters
    val gradePool = if (voterSet.nonEmpty) voterSet else ordered
    val grade = median(gradePool.map(_.avg))
    // `ceilingBps` = the highest SUSTAINED rate (what the pipeline
    // delivered at least once — it may sit above the reproducible grade
    // when one loop caught a lucky moment); `unsustainedAt` = the lowest
    // CREDIBLE failing pace above the grade (where it provably breaks —
    // a box-event loop's pace is not evidence). With cal_bps (burst)
    // they tell the whole story.
    val ceilingBps = topSust.map(_.avg)
    val unsustainedAt = {
      val above = credibleUns.flatMap(_.pace).filter(_ > grade)
      if (above.nonEmpty) Some(above.min) else None
    }
    val ceilingNotFound = unsustainedAt.isEmpty
    // acceptance REQUIRES the bracket: ≥2 voters within 1.25× AND a
    // failing pace on record above the grade — a grade whose every voter
    // never waited (blocked≈0) with no unsustained bracket is a lower
    // bound and must not ship as accepted
    val accepted = voterSet.size >= 2 &&
      disp(voterSet.map(_.avg)) <= 1.25 && !ceilingNotFound
    Result(ordered, grade, voterSet, ceilingBps, unsustainedAt,
      ceilingNotFound, accepted, gradePool.minBy(l => disp(l.rates)))
  }
}
