package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Diagnostic main: run one query cold then steady with a job listener,
  * printing every Spark job's wall and description — the measurement
  * behind PLANS.md's per-batch job-count analyses (q58 retirement
  * question: which driver jobs remain on the composed batch path, and is
  * any of them fusable). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile q58"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tok = args.headOption.getOrElse("q58")
    val name = SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(tok)).getOrElse(sys.error(s"no query matches $tok"))
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", ""))
            .getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, d) =>
          done.add((j.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
      }
    })
    // cold (codegen/warm) run, then the steady run the listener reports
    SparkEntry.queries(name)(spark, sfDir).count()
    spark.catalog.clearCache(); System.gc()
    done.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // drain listener bus
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._1)
    println(f"STEADY $name wall=$wall%.3f s, jobs=${rows.size}")
    rows.foreach { case (id, dt, d) =>
      println(f"  job $id%3d  $dt%7.3f s  ${d.take(90)}")
    }
    spark.stop()
  }
}
