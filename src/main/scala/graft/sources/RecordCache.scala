package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded rolling record cache — the `RecordCache` capability
  * (reference: src/ingestion.rs:18-187): at most `cap` live records,
  * re-ingest REPLACES by id and refreshes the entry's position, and when
  * the cap is exceeded the stalest entry is evicted (FIFO order with
  * move-to-back on replace; `enforce_limit`, ingestion.rs:163-176).
  *
  * Spark-first re-expression. The reference's IndexMap+VecDeque mutation
  * has a closed form: because versions are monotone, "FIFO with
  * move-to-back on replace" is exactly *the `cap` distinct ids with the
  * largest last-ingest version* — once `cap` ids have a newer last-touch
  * than X, X can never re-enter without a re-ingest. So:
  *
  *   - [[RecordCache.finalSnapshot]] is the one-shot distributed form
  *     (latest row per id → top-`cap` by last version): two keyed window
  *     ranks, no driver state — the lane a batch pipeline uses;
  *   - [[RollingRecordCache]] is the incremental twin (the shape the
  *     sampler's ingestion loop holds): a pool DataFrame folded per
  *     `ingest` with a lineage cut, plus the reference's ingest counters
  *     and wait/notify surface (ingestion.rs:93-123). Incremental ≡
  *     one-shot by the monotone-version argument above (law pinned in
  *     RecordCacheSpec).
  *
  * 100 TB posture: the pool never exceeds `cap` rows and each fold
  * shuffles `cap + |batch|` rows on the id key; nothing global, nothing
  * driver-side but the counters.
  */
object RecordCache {

  /** Final cache contents after ingesting `df` in `versionCol` order:
    * the latest row per `idCol`, ranked `cache_rank = 1` for the NEWEST
    * surviving entry, keeping `cache_rank <= cap`. `versionCol` must be
    * unique and monotone with ingest order (the reference's
    * `next_version`). */
  def finalSnapshot(df: DataFrame, idCol: String, versionCol: String, cap: Int): DataFrame = {
    val latest = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col(versionCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    // top-cap by last version: orderBy+limit plans as distributed
    // TakeOrdered (per-partition top-cap, merged on the driver) — no
    // single-partition global sort; the rank window then runs over at
    // most `cap` rows
    latest.orderBy(col(versionCol).desc, col(idCol)).limit(cap)
      .withColumn("cache_rank", row_number().over(
        Window.orderBy(col(versionCol).desc, col(idCol))).cast("long"))
  }
}

/** Incremental bounded cache over DataFrame batches (see [[RecordCache]]).
  * Not thread-safe for concurrent `ingest` of the same cache (the
  * reference serializes ingests behind a write lock; callers here do the
  * same — one ingestion loop per cache), but the counter/wait surface is
  * safe to poll from other threads. */
class RollingRecordCache(spark: SparkSession, cap: Int,
    idCol: String, orderCol: String) {

  private var pool: Option[DataFrame] = None
  private var nextVersion: Long = 0L
  private var ingestsVar: Long = 0L
  private val lock = new Object

  /** Ingest one batch; rows are versioned in `orderCol` order starting
    * after every previously-ingested row (the reference's per-record
    * `next_version`, ingestion.rs:138-141). Empty batches are ignored
    * (ingestion.rs:63-65). */
  def ingest(batch: DataFrame): Unit = {
    val n = batch.count()
    if (n == 0) return
    val versioned = batch
      .withColumn("version",
        (lit(nextVersion) + row_number().over(Window.orderBy(col(orderCol)))).cast("long"))
    nextVersion += n
    val unioned = pool match {
      case None => versioned
      case Some(p) => p.unionByName(versioned)
    }
    // fold: latest per id, top-cap by version — localCheckpoint keeps the
    // plan batch-sized across arbitrarily many ingests
    pool = Some(RecordCache.finalSnapshot(unioned, idCol, "version", cap)
      .drop("cache_rank").localCheckpoint())
    lock.synchronized { ingestsVar += 1; lock.notifyAll() }
  }

  /** Current cache contents with `cache_rank` (1 = newest). A cache that
    * never received a batch has NO schema to offer (the id/order column
    * types come from the first ingest), so this returns the zero-column
    * empty frame — check [[isEmpty]]/[[len]] before selecting columns,
    * exactly as the reference's callers check before using snapshot(). */
  def snapshot(): DataFrame = pool match {
    case Some(p) => p.withColumn("cache_rank", row_number().over(
      Window.orderBy(col("version").desc, col(idCol))).cast("long"))
    case None => spark.emptyDataFrame
  }

  def len(): Long = pool.map(_.count()).getOrElse(0L)
  def isEmpty: Boolean = len() == 0
  def clear(): Unit = { pool = None }

  /** Completed ingest operations (reference ingest_count). */
  def ingestCount: Long = lock.synchronized(ingestsVar)

  /** Block until the ingest count exceeds `lastSeen` or the timeout
    * elapses; returns the current count (reference wait_for_ingest,
    * ingestion.rs:99-113). */
  def waitForIngest(lastSeen: Long, timeoutMs: Long): Long = lock.synchronized {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (ingestsVar <= lastSeen) {
      val leftMs = (deadline - System.nanoTime()) / 1000000L
      if (leftMs <= 0) return ingestsVar
      lock.wait(leftMs)
    }
    ingestsVar
  }
}
