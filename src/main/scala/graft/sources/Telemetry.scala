package graft.sources

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Per-refresh telemetry (reference: `SourceRefreshStats`,
  * src/ingestion.rs:204-217, 519-535 — rows, wall ms, rows/sec logged per
  * source refresh cycle). */
case class RefreshStats(sourceId: String, rows: Long, millis: Long) {
  def rowsPerSec: Double =
    if (millis <= 0) rows.toDouble * 1000.0 else rows * 1000.0 / millis
}

/** Spark-native refresh instrumentation: counters ride the refresh job
  * itself via `observe()` — computed by the running query, no second pass
  * over the source (the reference increments counters inside its read
  * loop; here the scan IS the read loop). */
object Telemetry {

  /** Materialize one refresh page of `ds` and return it with its stats.
    * `ds` should already be page-limited (the reference's refresh reads a
    * cursor-bounded page, never the whole source). The row count comes
    * from the job's observed metrics, the wall time from around the
    * action — exactly the reference's (rows, ms, rows/sec) triple. */
  def refresh[T](ds: Dataset[T], sourceId: String): (Array[T], RefreshStats) = {
    val name = s"refresh:$sourceId"
    val obs = ds.observe(name, count(lit(1)).as("rows"))
    val t0 = System.nanoTime()
    val out = obs.collect()
    val ms = (System.nanoTime() - t0) / 1000000L
    val rows = obs.queryExecution.observedMetrics.get(name)
      .map(_.getAs[Long]("rows")).getOrElse(out.length.toLong)
    (out, RefreshStats(sourceId, rows, ms))
  }
}
