package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Parallel source refresh — the `IngestionManager` driver loop
  * (reference: src/ingestion.rs:462-506, one scoped thread per source,
  * results joined back in source order) re-expressed on Spark's
  * scheduler.
  *
  * Each source's refresh is an independent Spark JOB, submitted from its
  * own driver thread. Spark local properties are thread-inherited, so
  * every refresh runs in its own FAIR scheduler pool
  * (`spark.scheduler.pool = <prefix>.<sourceId>`) and job group: on a
  * cluster started with `spark.scheduler.mode=FAIR` the executors are
  * shared ACROSS in-flight refreshes instead of draining them one job at
  * a time — a slow source no longer serializes the fleet, which is the
  * whole point of the reference's thread-per-source design. Under the
  * default FIFO scheduler the pool property is inert but jobs still
  * overlap whenever free task slots exist.
  *
  * Error semantics follow the reference's join loop: the first failed
  * refresh surfaces after all submitted jobs are awaited (the job group
  * is per-source, so a caller can also cancel a straggler selectively).
  * Retry policy stays composable — wrap the per-source `Dataset` page in
  * `Exhaustion.withRetry` exactly as the sequential path does.
  */
object Ingestion {

  /** The reference's refresh-selection policy (refresh_all_internal,
    * reference: src/ingestion.rs:433-448): a source refreshes iff the
    * caller forces it or its buffer is EMPTY — a non-empty buffer is
    * never re-fetched by a routine cycle
    * (test_refresh_all_skips_non_empty_buffers). The returned ids are the
    * cycle's `last_refreshed_sources` report
    * (refreshed_sources_are_reported_per_cycle: empty when nothing
    * refreshed). This is the SELECTION only: under `force` the caller
    * must also discard the selected sources' buffered rows (e.g.
    * `RecordCache.clear`) before draining the refreshAll results — the
    * reference clears inside the same loop. Feed the selected subset to
    * [[refreshAll]]. */
  def refreshPlan(buffers: Seq[(String, Long)], force: Boolean = false): Seq[String] =
    buffers.collect { case (id, n) if force || n == 0L => id }

  /** Weight validation before any refresh runs (reference
    * advance_with_weights, src/ingestion.rs:366-374 + validate_weights
    * 407-425): every weighted id must be registered and non-negative;
    * the error carries the offending source. Zero weights are legal —
    * they exclude a source from the weighted drain without shrinking the
    * requested batch (test_weighted_refresh_all_zero_weight_does_not_
    * reduce_batch — the drain side is [[graft.operators.Mixing
    * .weightedAllocation]], which allocates 0 slots to weight-0 groups
    * and redistributes by largest remainder). */
  def validateWeights(registered: Set[String],
      weights: Map[String, Double]): Either[String, Unit] = {
    weights.collectFirst {
      case (id, _) if !registered.contains(id) =>
        s"invalid weight: source '$id' is not registered"
      // !(w >= 0), not (w < 0): NaN fails both comparisons and must be
      // rejected here, not poison the largest-remainder allocation later
      case (id, w) if !(w >= 0) =>
        s"invalid weight: source '$id' weight $w is negative or NaN"
    }.toLeft(())
  }

  /** The reference's `weighted_drain_into_caches` SELECTION
    * (src/ingestion.rs:607-675) composed with [[validateWeights]]: float
    * weights land on the e6 integer lattice (exact to compare and sum,
    * the house convention), unregistered / negative / NaN weights
    * reject with the offending source, missing ids default to 1.0 (the
    * reference's `unwrap_or(1.0)`), and the drain order is
    * [[graft.operators.Mixing.smoothWrrDrain]]'s exact smooth-WRR
    * interleave over the buffers' CURRENT sizes — depletion, early halt,
    * and the all-nonpositive→uniform fallback included. Returns
    * `(slot, sourceId)`; the caller pops each source's buffer in this
    * order (the q129 lane resolves records the same way). */
  def weightedDrainOrder(buffers: Seq[(String, Long)],
      weights: Map[String, Double], limit: Long): Either[String, Seq[(Long, String)]] =
    validateWeights(buffers.map(_._1).toSet, weights).map { _ =>
      graft.operators.Mixing.smoothWrrDrain(
        buffers.map { case (id, n) =>
          (id, math.round(weights.getOrElse(id, 1.0) * 1e6), n) },
        limit)
    }

  /** Advance-cycle limits (reference refresh_all_internal,
    * src/ingestion.rs:431-436 contract, 461 fetch_limit, 576 drain
    * target; pinned by advance_on_empty_buffer_fills_to_max_records_
    * not_step): the SOURCE fetch limit is ALWAYS `maxRecords` — an empty
    * buffer refills to capacity so a step-2 advance doesn't trigger a
    * shard fetch every other step — while the DRAIN target is `step` for
    * a rolling advance (no cache clear) and `maxRecords` with a cache
    * clear for a full refresh (`step = None`). Returns
    * `(fetchLimit, drainTarget, clearCaches)`. */
  def advanceLimits(step: Option[Long], maxRecords: Long): (Long, Long, Boolean) =
    (maxRecords, step.getOrElse(maxRecords), step.isEmpty)

  /** Refresh every `(sourceId, page)` concurrently and return
    * `(sourceId, rows, stats)` in INPUT order (reference joins handles in
    * source order). `page` should already be cursor-bounded, as with
    * [[Telemetry.refresh]]; stats ride each job via `observe()`. */
  def refreshAll[T](spark: SparkSession, sources: Seq[(String, Dataset[T])],
      poolPrefix: String = "ingest",
      maxConcurrent: Int = 8): Seq[(String, Array[T], RefreshStats)] = {
    require(sources.nonEmpty, "refreshAll: no sources")
    require(sources.map(_._1).distinct.size == sources.size,
      s"refreshAll: duplicate source ids in ${sources.map(_._1)}")
    val sc = spark.sparkContext
    val threads = math.min(sources.size, math.max(1, maxConcurrent))
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = sources.map { case (id, page) =>
        Future {
          // thread-local per job: the pool for FAIR sharing, the group for
          // targeted cancellation/monitoring of one source's refresh
          sc.setLocalProperty("spark.scheduler.pool", s"$poolPrefix.$id")
          sc.setJobGroup(s"$poolPrefix.$id", s"source refresh: $id",
            interruptOnCancel = true)
          try {
            val (rows, stats) = Telemetry.refresh(page, id)
            (id, rows, stats)
          } finally {
            sc.clearJobGroup()
            sc.setLocalProperty("spark.scheduler.pool", null)
          }
        }
      }
      // await in submission order so failures surface deterministically
      // (all jobs were already submitted concurrently above)
      futures.map(f => Await.result(f, Duration.Inf))
    } finally {
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.SECONDS)
    }
  }
}
