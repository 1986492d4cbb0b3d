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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
      // (µs) refuses; read it as a raw nanosecond long instead. All event
      // time math then stays in exact int64 nanos — no double roundtrip —
      // and the DuckDB oracle mirrors it with epoch_ns(ts).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
