package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job- and stage-level profiler for one registered query (diagnostic main: `runMain graft.ProfileQuery <name>`; not part of the driver surface). */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q66_mixed_strategy_batch")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    // the listener bus delivers on its own thread; every access to these
    // goes through `lock` (the sleeps below are NOT a happens-before edge)
    val lock = new Object
    val jobs = scala.collection.mutable.Map[Int, (Long, String)]()
    val done = scala.collection.mutable.Buffer[(Int, Long, String)]()
    val spans = scala.collection.mutable.Buffer[(Long, Long)]()
    val stages = scala.collection.mutable.Buffer[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = lock.synchronized {
        jobs(js.jobId) = (js.time, Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))
            .orElse(Option(p.getProperty("spark.job.description"))))
          .getOrElse("?").take(90))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs.get(je.jobId).foreach { case (t0, d) =>
          done += ((je.jobId, je.time - t0, d))
          spans += ((t0, je.time))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = lock.synchronized {
        val si = sc.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(0L)
        stages += ((si.name.take(100), dur, si.numTasks))
      }
    })
    val fn = SparkEntry.queries(qname)
    // listenerBus is private[spark]; a short settle sleep after each run
    // plus the lock above is enough for a diagnostic report
    def drainBus(): Unit = Thread.sleep(500)
    // warmup
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    drainBus()
    lock.synchronized { done.clear(); stages.clear(); spans.clear() }
    val t0 = System.nanoTime()
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    drainBus()
    lock.synchronized {
      println(f"WALL $wall%.2f s, jobs=${done.size}")
      done.sortBy(-_._2).foreach { case (id, ms, d) => println(f"  job $id%3d ${ms / 1000.0}%6.2f s  $d") }
      println(f"  sum of jobs: ${done.map(_._2).sum / 1000.0}%.2f s")
      // driver-side holes: wall minus the UNION of job intervals — time
      // spent planning/optimizing/collecting between jobs, the composed
      // family's other latency floor besides per-stage scheduling
      val sorted = spans.sortBy(_._1)
      var busy = 0L; var gap = 0L; var cursor = 0L
      val gapsList = scala.collection.mutable.Buffer[(Long, Long)]()
      sorted.foreach { case (s, t) =>
        if (cursor == 0L) { busy += t - s; cursor = t }
        else {
          if (s > cursor) { gap += s - cursor; gapsList += ((cursor, s - cursor)) }
          if (t > cursor) { busy += t - math.max(s, cursor); cursor = t }
        }
      }
      println(f"  job-interval union: ${busy / 1000.0}%.2f s; inter-job gaps: ${gap / 1000.0}%.2f s")
      gapsList.sortBy(-_._2).take(8).foreach { case (at, g) =>
        println(f"    gap ${g / 1000.0}%5.2f s after job ending at +${(at - sorted.head._1) / 1000.0}%.2f s")
      }
      println("STAGES by site:")
      stages.groupBy(_._1).map { case (n, ss) =>
        (n, ss.map(_._2).sum, ss.size, ss.map(_._3).sum)
      }.toSeq.sortBy(-_._2).take(20).foreach { case (n, ms, cnt, tasks) =>
        println(f"  ${ms / 1000.0}%6.2f s  x$cnt%-3d tasks=$tasks%-4d $n")
      }
    }
    spark.stop()
  }
}
