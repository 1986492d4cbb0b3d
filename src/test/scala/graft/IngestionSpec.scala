package graft

import graft.sources.{Ingestion, Telemetry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CyclicBarrier, TimeUnit}
import scala.jdk.CollectionConverters._

/** Rendezvous for the concurrency proof: each refresh job's single task
  * parks on this barrier, so the barrier trips ONLY when all three jobs
  * have a task executing at the same instant. Top-level object so the
  * executor-thread closures (same JVM in local mode) reach one instance. */
object IngestProbe {
  val barrier = new CyclicBarrier(3)
}

/** `Ingestion.refreshAll` — the reference's thread-per-source
  * `IngestionManager` refresh loop (src/ingestion.rs:462-506) as
  * concurrently-submitted Spark jobs in per-source FAIR pools. */
class IngestionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("refreshAll matches sequential refresh per source, results in input order") {
    import spark.implicits._
    val sources = Seq(
      "alpha" -> spark.range(0, 100, 1, 4).as[Long].map(_ * 2L),
      "beta" -> spark.range(0, 50, 1, 2).as[Long].map(_ + 1000L),
      "gamma" -> spark.range(0, 7, 1, 1).as[Long].map(i => -i))
    val par = Ingestion.refreshAll(spark, sources)
    assert(par.map(_._1) == Seq("alpha", "beta", "gamma"))
    sources.zip(par).foreach { case ((id, ds), (pid, rows, stats)) =>
      val (seqRows, seqStats) = Telemetry.refresh(ds, id)
      assert(pid == id)
      assert(rows.sorted.toSeq == seqRows.sorted.toSeq)
      assert(stats.sourceId == id)
      assert(stats.rows == seqStats.rows)
      assert(stats.rows == rows.length.toLong)
    }
  }

  test("refreshes run concurrently, each job in its own per-source pool") {
    import spark.implicits._
    val pools = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        val p = Option(jobStart.properties)
          .map(_.getProperty("spark.scheduler.pool")).orNull
        if (p != null && p.startsWith("probe.")) pools.add(p)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def page = spark.range(0, 1, 1, 1).as[Long].mapPartitions { it =>
        // parks until all three jobs have a running task — a sequential
        // (job-after-job) execution would time out here instead
        IngestProbe.barrier.await(30, TimeUnit.SECONDS)
        it
      }
      val out = Ingestion.refreshAll(spark,
        Seq("a" -> page, "b" -> page, "c" -> page), poolPrefix = "probe")
      assert(out.map(_._2.length).sum == 3)
      // listener delivery is async; poll briefly for the three job starts
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (pools.size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(pools.asScala.toSet == Set("probe.a", "probe.b", "probe.c"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
