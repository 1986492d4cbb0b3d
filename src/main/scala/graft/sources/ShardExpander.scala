package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.CountDownLatch

/** Background shard expansion — the reference's async download driver
  * (reference: huggingface_source.rs:4354-4421): a daemon thread drains
  * the seeded download order into the landing dir while readers serve
  * ONLY already-materialized shards and never block on the network. Same
  * thread discipline as [[graft.operators.BatchPrefetcher]] (dedicated
  * producer thread, interrupt-join close); the thread owns no novel
  * decisions — ordering, cache reconcile, incomplete-heal and the disk
  * cap remain [[HfManifest]]'s pure functions, the thread only executes
  * them in a loop.
  *
  * Contracts (pinned in SourcesSpec):
  *   - `landed()` is non-blocking and never touches the network: it
  *     reports the order's shards that are complete on disk right now,
  *     in order position. Spark can scan the landing dir concurrently —
  *     in-flight downloads live under dot-prefixed temp names that the
  *     file index treats as hidden ([[HfManifest.download]]).
  *   - Materialized-set determinism (reference contract,
  *     huggingface_source.rs:866-872): expansion always lands the FIRST
  *     uncached order position next, so from an empty cache the landed
  *     set after k downloads is exactly `order.take(k)` — independent of
  *     timing, and a restart resumes at the same next position.
  *   - Incomplete shards (on-disk size ≠ manifest size) are healed
  *     before any new position is fetched.
  *   - The disk cap halts expansion BEFORE a shard that no longer fits
  *     (`landed bytes + expected > capBytes`); evicting stale/foreign
  *     files stays the caller's decision via [[HfManifest.evictionPlan]].
  *
  * A failing download retries `maxRetries` times, then expansion stops
  * and [[failure]] surfaces the error — readers keep serving whatever is
  * landed (availability over completeness, the reference's stance for a
  * flaky hub).
  */
final class ShardExpander(
    order: Seq[HfManifest.ShardCandidate],
    landingDir: String,
    capBytes: Long = Long.MaxValue,
    maxRetries: Int = 2,
    fetch: (HfManifest.ShardCandidate, String) => Path = HfManifest.download)
  extends AutoCloseable {

  @volatile private var open = true
  @volatile private var failureOpt: Option[Throwable] = None
  private val done = new CountDownLatch(1)
  private val progress = new Object

  private def targetOf(c: HfManifest.ShardCandidate): Path =
    Paths.get(landingDir, c.landedName)

  /** exists-then-size races with concurrent eviction (the caller may run
    * [[HfManifest.evictionPlan]] while expansion is live); a file deleted
    * between the two calls counts as not-landed rather than letting
    * NoSuchFileException kill the worker. */
  private def sizeOpt(t: Path): Option[Long] =
    try { if (Files.exists(t)) Some(Files.size(t)) else None }
    catch { case _: java.io.IOException => None }

  private def landedBytes: Long = order.flatMap(c => sizeOpt(targetOf(c))).sum

  private val worker = new Thread(
    () => {
      try {
        Files.createDirectories(Paths.get(landingDir))
        // true = shard landed; false = gave up (failure recorded)
        def attempt(c: HfManifest.ShardCandidate): Boolean = {
          var tries = 0
          while (open) {
            try { fetch(c, landingDir); return true }
            catch {
              case e: InterruptedException => throw e
              case e: Exception =>
                tries += 1
                if (tries > maxRetries) { failureOpt = Some(e); return false }
            }
          }
          false
        }
        var halt = !HfManifest.incomplete(order, landingDir).forall(attempt)
        while (!halt && open) {
          HfManifest.firstUncached(order, landingDir) match {
            case None => halt = true // fully expanded
            case Some(i) =>
              val c = order(i)
              if (c.expectedSize.exists(sz => landedBytes + sz > capBytes)) halt = true
              else {
                halt = !attempt(c)
                progress.synchronized(progress.notifyAll())
              }
          }
        }
      } catch {
        case _: InterruptedException => ()
        // anything unexpected must surface through failure, not vanish
        // with finished=true and failure=None
        case e: Throwable => if (failureOpt.isEmpty) failureOpt = Some(e)
      }
      finally {
        done.countDown()
        progress.synchronized(progress.notifyAll())
      }
    },
    "graft-hf-shard-expander")
  worker.setDaemon(true)
  worker.start()

  /** The order's shards complete on disk RIGHT NOW (size-verified when
    * the manifest declares one), in order position. Non-blocking; no
    * network. */
  def landed(): Seq[Path] = order.flatMap { c =>
    val t = targetOf(c)
    sizeOpt(t) match {
      case Some(sz) if c.expectedSize.forall(_ == sz) => Some(t)
      case _ => None
    }
  }

  /** Expansion thread has stopped (fully expanded, cap reached, gave up
    * after retries, or closed). */
  def finished: Boolean = done.getCount == 0

  /** The error that stopped expansion, if any. */
  def failure: Option[Throwable] = failureOpt

  /** Block until at least `n` shards are landed, expansion stops, or the
    * timeout elapses — for consumers that need a minimum working set
    * (and for the spec); returns the landed set either way. */
  def awaitLanded(n: Int, timeoutMs: Long): Seq[Path] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var cur = landed()
    while (cur.size < n && !finished && System.nanoTime() < deadline) {
      progress.synchronized {
        if (landed().size < n && !finished) progress.wait(50)
      }
      cur = landed()
    }
    cur
  }

  override def close(): Unit = {
    open = false
    worker.interrupt()
    worker.join(10000)
  }
}
