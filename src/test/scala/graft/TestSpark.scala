package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}
