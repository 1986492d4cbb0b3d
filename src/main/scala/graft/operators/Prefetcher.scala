package graft.operators

/** Bounded batch prefetcher (reference: `BatchPrefetcher`,
  * src/sampler/mod.rs:173-199, 2911-2930 — dedicated producer thread
  * looping `next_triplet_batch` into a bounded `sync_channel`, errors
  * flowing through the channel as values, drop joins the thread).
  *
  * Spark twin: `parallelism` producer threads run `produce(i)` for
  * i = 0, 1, 2, … — each call typically submits one batch's Spark jobs —
  * while the trainer drains IN ORDER, so job latency hides behind
  * consumption. Because batch draws are stateless counters
  * ([[Triplets.textRowsRange]]; [[Sampler.advanceState]] computes any
  * batch's starting state arithmetically), the prefetched sequence is
  * EXACTLY the sequential sequence — prefetching (and parallel
  * production) changes latency, never content; that law is what
  * PrefetcherSpec pins. Parallel production is the distributed upgrade
  * the reference's single producer can't express: concurrent batch
  * plans overlap driver planning with executor compute, which is how a
  * cluster keeps a trainer fed when one batch's critical path exceeds
  * the consumption interval. With `parallelism > 1`, `produce` must be
  * thread-safe (pure function of `i` — the stateless-draw contract).
  *
  * A producer failure is delivered in order as the failing batch
  * (`next()` rethrows), mirroring the reference's `Result` channel;
  * production continues with the following index, so a transient
  * per-batch failure doesn't kill the pipeline. `close()` interrupts and
  * joins the producers (the reference's `Drop`).
  */
final class BatchPrefetcher[T](capacity: Int, produce: Long => T,
    parallelism: Int = 1, startStaggerMs: Long = 0L) extends AutoCloseable {
  require(capacity > 0, "prefetch capacity must be > 0")
  require(parallelism > 0, "prefetch parallelism must be > 0")
  require(startStaggerMs >= 0, "prefetch stagger must be >= 0")

  /** Max batches in flight ahead of the consumer: `capacity` buffered
    * plus one being produced per producer. The first `productionWindow`
    * deliveries after a cold start drain this fetch-ahead head start, so
    * a throughput grade must time only deliveries PAST it — this is the
    * single source of truth for that split (the producer claim guard
    * below uses the same bound). */
  def productionWindow: Int = capacity + parallelism

  private val lock = new Object
  private val ready = scala.collection.mutable.Map[Long, Either[Throwable, T]]()
  private var nextOut = 0L // next index the consumer delivers
  private var nextIdx = 0L // next index a producer claims
  private var produced = 0L // finished productions (success or error)
  private var errors = 0L // error items produced
  @volatile private var open = true

  /** Batches fully produced so far (delivered or still buffered),
    * errors included — the reference's `produced_count`. */
  def producedCount: Long = lock.synchronized(produced)

  /** Items buffered ready for the consumer — the reference's
    * `queue_len`. Under parallel production this counts only COMPLETED
    * batches; claimed-but-in-flight indexes are not yet visible. */
  def queueLen: Int = lock.synchronized(ready.size)

  /** Productions that ended in an error value (delivered or pending) —
    * the reference's `error_count`. */
  def errorCount: Long = lock.synchronized(errors)

  private def producerLoop(slot: Int): Unit =
    try {
      // start stagger: with `parallelism` producers launched together and
      // batch latency ≈ parallelism × the consumption interval, the whole
      // fleet otherwise phase-locks into a CONVOY — nothing delivers for a
      // full batch latency, then `productionWindow` batches land at once
      // (observed: 13 s delivery gaps followed by sub-ms bursts). Offsetting
      // producer k's first claim by k·stagger spreads the cycle phases once
      // and permanently: the same aggregate throughput arrives as an evenly
      // spaced stream, which is what a training loop needs (bounded
      // worst-case step wait, not just a good average). Content is
      // untouched — claims are still ordered, delivery is still in-order.
      if (startStaggerMs > 0 && slot > 0) Thread.sleep(slot * startStaggerMs)
      while (open) {
        val claimed = lock.synchronized {
          // production window: `capacity` buffered + one in-flight item
          // per producer (the single-producer case reduces to the old
          // bounded-queue shape: capacity queued + 1 being produced)
          while (open && nextIdx >= nextOut + productionWindow)
            lock.wait()
          if (!open) None
          else { val i = nextIdx; nextIdx += 1; Some(i) }
        }
        claimed match {
          case None => return
          case Some(i) =>
            val item =
              try Right(produce(i))
              catch { case e: Exception => Left(e) }
            lock.synchronized {
              ready(i) = item
              produced += 1
              if (item.isLeft) errors += 1
              lock.notifyAll()
            }
        }
      }
    } catch { case _: InterruptedException => () }

  private val producers = (0 until parallelism).map { k =>
    val t = new Thread(() => producerLoop(k), "graft-batch-prefetcher")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Blocking take of the next batch in production order; rethrows the
    * producer's error for a batch that failed. */
  def next(): T = {
    val item = lock.synchronized {
      while (!ready.contains(nextOut)) lock.wait()
      val it = ready.remove(nextOut).get
      nextOut += 1
      lock.notifyAll()
      it
    }
    item match {
      case Right(t) => t
      case Left(e)  => throw e
    }
  }

  override def close(): Unit = {
    open = false
    lock.synchronized { lock.notifyAll() }
    producers.foreach(_.interrupt())
    producers.foreach(_.join(10000))
  }
}
