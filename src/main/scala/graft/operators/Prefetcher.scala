package graft.operators

import java.util.concurrent.ArrayBlockingQueue

/** Bounded-queue batch prefetcher (reference: `BatchPrefetcher`,
  * src/sampler/mod.rs:173-199, 2911-2930 — dedicated producer thread
  * looping `next_triplet_batch` into a bounded `sync_channel`, errors
  * flowing through the channel as values, drop joins the thread).
  *
  * Spark twin: the producer thread runs `produce(i)` for i = 0, 1, 2, …
  * — each call typically submits the NEXT batch's Spark job — into a
  * bounded queue while the trainer drains the current batch, so job
  * latency hides behind consumption. Because batch draws are stateless
  * counters ([[Triplets.textRowsRange]]: any draw range is computable
  * without the previous one's state), the prefetched sequence is EXACTLY
  * the sequential sequence — prefetching changes latency, never content;
  * that law is what PrefetcherSpec pins.
  *
  * A producer failure is delivered in order as the failing batch
  * (`next()` rethrows), mirroring the reference's `Result` channel;
  * production continues with the following index, so a transient
  * per-batch failure doesn't kill the pipeline. `close()` interrupts and
  * joins the producer (the reference's `Drop`).
  */
final class BatchPrefetcher[T](capacity: Int, produce: Long => T)
    extends AutoCloseable {
  require(capacity > 0, "prefetch capacity must be > 0")

  private val queue = new ArrayBlockingQueue[Either[Throwable, T]](capacity)
  @volatile private var open = true

  private val producer = new Thread(
    () => {
      var i = 0L
      try {
        while (open) {
          val item =
            try Right(produce(i))
            catch { case e: Exception => Left(e) }
          queue.put(item)
          i += 1
        }
      } catch { case _: InterruptedException => () }
    },
    "graft-batch-prefetcher")
  producer.setDaemon(true)
  producer.start()

  /** Blocking take of the next batch in production order; rethrows the
    * producer's error for a batch that failed. */
  def next(): T = queue.take() match {
    case Right(t) => t
    case Left(e)  => throw e
  }

  override def close(): Unit = {
    open = false
    producer.interrupt()
    producer.join(10000)
  }
}
