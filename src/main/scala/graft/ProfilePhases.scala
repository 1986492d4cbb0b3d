package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall profiler for the composed q66 batch (diagnostic main;
  * not part of the driver surface). Forces each composed stage with a
  * count() and prints the incremental walls, so the sequential-stage
  * floor is attributable to a phase instead of a job soup. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(sys.env.getOrElse("SPARK_GRAFT_PROFILE_Q", "q66_mixed_strategy_batch"))
    // warmup
    fn(spark, sf).count()
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      val t = System.nanoTime()
      println(f"PHASE $name%-28s ${(t - t0) / 1e9}%6.3f s")
      t0 = t
    }
    val n = fn(spark, sf).count()
    lap(s"total (n=$n)")
    spark.stop()
  }
}
