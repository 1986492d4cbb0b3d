package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed tables behind a catalog;
  * the point of funneling every read through one place is that the scan
  * options (pushdown-friendly plain parquet reads, no schema inference)
  * stay uniform and swappable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
