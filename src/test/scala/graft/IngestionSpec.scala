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

  test("refresh drains into per-source bounded caches; replaced ids keep one live row") {
    // the reference IngestionManager's register→refresh→cache population
    // loop (ingestion.rs:274-355): each source owns a RecordCache capped
    // at max_records; a second refresh REPLACES by id and the union of
    // snapshots is the all_records view
    import spark.implicits._
    import graft.sources.RollingRecordCache
    val caches = Map(
      "alpha" -> new RollingRecordCache(spark, 5, "id", "seq"),
      "beta" -> new RollingRecordCache(spark, 3, "id", "seq"))
    def drain(pages: Seq[(String, org.apache.spark.sql.Dataset[(Long, Long)])]): Unit =
      Ingestion.refreshAll(spark, pages).foreach { case (src, rows, _) =>
        if (rows.nonEmpty) caches(src).ingest(rows.toSeq.toDF("id", "seq"))
      }
    drain(Seq(
      "alpha" -> (1L to 8L).map(i => (i, i)).toDS(),        // 8 > cap 5
      "beta" -> (1L to 2L).map(i => (i + 100, i)).toDS()))
    assert(caches("alpha").len() == 5 && caches("beta").len() == 2)
    // second cycle: alpha re-ingests ids 7,8 (replace) + new 9; beta overflows
    drain(Seq(
      "alpha" -> Seq((7L, 1L), (8L, 2L), (9L, 3L)).toDS(),
      "beta" -> (3L to 6L).map(i => (i + 100, i)).toDS()))
    val alpha = caches("alpha").snapshot().select("id").as[Long].collect().toSet
    assert(alpha.size == 5 && Set(7L, 8L, 9L).subsetOf(alpha), s"got $alpha")
    assert(caches("beta").len() == 3)
    assert(caches("alpha").ingestCount == 2 && caches("beta").ingestCount == 2)
    // the all-records view is the union of snapshots (ingestion.rs:327-335)
    val all = caches.values.map(_.snapshot().select("id").as[Long].collect().toSet)
      .reduce(_ union _)
    assert(all.size == 8)
  }

  test("refresh plan: non-empty buffers skip, force refreshes all, report per cycle") {
    // reference refresh_all_internal (ingestion.rs:433-448): routine
    // cycles only touch empty buffers; force discards and refreshes
    // everything; the returned ids ARE the cycle's refreshed-sources
    // report (empty when nothing refreshed)
    val buffers = Seq("alpha" -> 0L, "beta" -> 5L, "gamma" -> 0L)
    assert(graft.sources.Ingestion.refreshPlan(buffers) == Seq("alpha", "gamma"))
    assert(graft.sources.Ingestion.refreshPlan(buffers, force = true)
      == Seq("alpha", "beta", "gamma"))
    assert(graft.sources.Ingestion.refreshPlan(Seq("a" -> 2L, "b" -> 1L)).isEmpty)
  }

  test("advance limits: empty buffer refills to max_records, drain is the step") {
    // the reference's pinned regression (advance_on_empty_buffer_fills_
    // to_max_records_not_step): fetch_limit = step would drain-and-refetch
    // on every other advance(2); the source limit is ALWAYS max_records
    import graft.sources.Ingestion.advanceLimits
    assert(advanceLimits(Some(2L), 10L) == ((10L, 2L, false)))  // rolling
    assert(advanceLimits(None, 10L) == ((10L, 10L, true)))      // full refresh
  }

  test("weight validation: unregistered and negative rejected, zero legal") {
    import graft.sources.Ingestion.validateWeights
    val reg = Set("alpha", "beta")
    assert(validateWeights(reg, Map("alpha" -> 1.0, "beta" -> 0.0)).isRight)
    assert(validateWeights(reg, Map("ghost" -> 1.0)).swap.exists(_.contains("ghost")))
    assert(validateWeights(reg, Map("alpha" -> -0.5)).swap.exists(_.contains("negative")))
    assert(validateWeights(reg, Map("alpha" -> Double.NaN)).isLeft)
    // zero weight excludes from the drain without shrinking the batch:
    // the allocation gives 0 to the zero-weight group, full total overall
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val alloc = graft.operators.Mixing.weightedAllocation(
      Seq(("alpha", 3L), ("beta", 0L)).toDF("group", "w"), 12L)
      .select("group", "alloc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(alloc == Map("alpha" -> 12L, "beta" -> 0L))
  }

  test("weighted drain order: validated smooth-WRR over buffer sizes (reference interleave)") {
    import graft.sources.Ingestion.weightedDrainOrder
    val buffers = Seq(("alpha", 10L), ("beta", 10L), ("gamma", 2L))
    // 2:1:1 weights: the smooth interleave starts a b g a (credit math),
    // and gamma's 2-deep buffer depletes — later slots split a/b 2:1
    val got = weightedDrainOrder(buffers,
      Map("alpha" -> 2.0, "beta" -> 1.0, "gamma" -> 1.0), 12L).toOption.get
    assert(got.size == 12)
    val counts = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts("gamma") == 2, s"gamma must deplete: $counts")
    assert(counts("alpha") > counts("beta"), s"weights must bias the split: $counts")
    // identical to driving Mixing.smoothWrrDrain with e6-scaled weights
    val direct = graft.operators.Mixing.smoothWrrDrain(
      buffers.map { case (id, n) => (id, (Map("alpha" -> 2.0, "beta" -> 1.0,
        "gamma" -> 1.0)(id) * 1e6).round, n) }, 12L)
    assert(got == direct)
    // a missing id defaults to weight 1.0 (the reference's unwrap_or)
    val dflt = weightedDrainOrder(Seq(("a", 5L), ("b", 5L)), Map("a" -> 1.0), 6L).toOption.get
    assert(dflt.groupBy(_._2).view.mapValues(_.size).toMap == Map("a" -> 3, "b" -> 3))
    // validation failures surface, not a silent uniform drain
    assert(weightedDrainOrder(buffers, Map("ghost" -> 1.0), 4L).isLeft)
    assert(weightedDrainOrder(buffers, Map("alpha" -> -1.0), 4L).isLeft)
    // all-zero weights: every source excluded by weight falls back to
    // uniform (the reference's fill(1.0)) — the batch still fills
    val zeros = weightedDrainOrder(buffers,
      Map("alpha" -> 0.0, "beta" -> 0.0, "gamma" -> 0.0), 6L).toOption.get
    assert(zeros.size == 6)
  }
}
