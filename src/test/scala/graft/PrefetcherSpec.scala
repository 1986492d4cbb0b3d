package graft

import graft.operators.{BatchPrefetcher, TripletConfig, Triplets}
import org.scalatest.funsuite.AnyFunSuite

/** `BatchPrefetcher` — the reference's producer-thread prefetcher
  * (src/sampler/mod.rs:173-199) over stateless draw ranges: prefetched
  * batches are EXACTLY the sequential sequence. */
class PrefetcherSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    (0L until 40L)
      .map(i => (i, s"s${i % 3}",
        (0 until 40).map(t => s"w${(i * 7 + t) % 13}t$t").mkString(" ")))
      .toDF("doc_id", "source", "text")
  }

  test("prefetched batch stream equals the sequential stateless-draw stream") {
    val cfg = TripletConfig()
    val docs = docsDf
    val drawsPerBatch = 2L
    def batch(i: Long): Seq[String] =
      Triplets.textRowsRange(docs, cfg, i * drawsPerBatch, (i + 1) * drawsPerBatch)
        .collect().map(_.toString).sorted.toSeq
    val pf = new BatchPrefetcher[Seq[String]](capacity = 2, batch)
    try {
      val prefetched = (0 until 4).map(_ => pf.next())
      val sequential = (0L until 4L).map(batch)
      assert(prefetched == sequential)
      assert(prefetched.head.nonEmpty)
    } finally pf.close()
  }

  test("a producer error arrives in order as that batch, later batches still flow") {
    def produce(i: Long): Long =
      if (i == 1) throw new IllegalStateException(s"batch $i failed") else i * 10
    val pf = new BatchPrefetcher[Long](capacity = 1, produce)
    try {
      assert(pf.next() == 0L)
      val e = intercept[IllegalStateException](pf.next())
      assert(e.getMessage == "batch 1 failed")
      assert(pf.next() == 20L)
    } finally pf.close()
  }

  test("close() joins the producer thread") {
    val pf = new BatchPrefetcher[Long](capacity = 1, identity)
    pf.next()
    pf.close()
    val alive = Thread.getAllStackTraces.keySet().stream()
      .anyMatch(t => t.getName == "graft-batch-prefetcher" && t.isAlive)
    assert(!alive)
  }
}
