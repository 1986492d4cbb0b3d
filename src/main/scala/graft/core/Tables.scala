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
      // events.ts arrives as parquet TIMESTAMP(NANOS) in some datasets
      // (which Spark's µs TimestampType refuses — read as a raw nanosecond
      // long via nanosAsLong) and plain TIMESTAMP(µs) in others. Normalize
      // BOTH to an int64 nanosecond column so every downstream consumer
      // does exact integer time math (`ts div 1000` = µs), and the DuckDB
      // oracle mirrors it with epoch_ns(ts)/epoch_us(ts) — exact in either
      // physical layout because µs→ns is a lossless ×1000. Sessions pin
      // spark.sql.session.timeZone=UTC, so the NTZ reinterpretation below
      // is the identity.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df // already int64 nanos
        case _ => df.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
