package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the event-time operators.
  *
  * The reference's "streaming" is incremental paging with offsets
  * (SURVEY.md §2.11) — no event-time semantics. A Spark engine gets real
  * streams almost for free because the SAME transformations run on a batch
  * DataFrame and a `readStream` DataFrame: these functions take either.
  * Batch/stream equivalence is pinned by StreamingSpec (a parquet-backed
  * stream must produce exactly the batch result).
  *
  * Watermarks bound state: 1h on 6h tumbling windows / 30m sessions keeps
  * per-key state finite on an unbounded 100 TB/day stream, and the shuffle
  * key (window × type, session × user) matches the batch plan's.
  */
object EventStreams {

  /** Tumbling 6h window counts + e6-exact value sums. `ts` must be a
    * TimestampType column. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("value_e6"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"), col("value_e6"))

  /** Session windows (30 min gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("sess_start"), col("n_events"))

  /** Streaming exact dedup — the incremental twin of the batch
    * content-hash dedup (q20): arriving documents keep only the first row
    * per portable content hash. On an unbounded corpus callers bound the
    * dedup state with `withWatermark` + `dropDuplicatesWithinWatermark`;
    * the plain form keeps exact global semantics (state = one entry per
    * distinct hash — the same cardinality the batch groupBy shuffles). */
  def dedupStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("chash", graft.core.Determinism.portableHash(col(textCol)))
      .dropDuplicates("chash")

  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class UserTotal(user_id: Long, n_events: Long, value_e6: Long)

  /** Custom stateful op: running per-user totals via
    * `flatMapGroupsWithState` — the mapping of the reference's stateful
    * cursors onto Spark's managed state store. */
  def runningTotals(spark: SparkSession, events: Dataset[UserEvent],
      outputMode: OutputMode = OutputMode.Append): Dataset[UserTotal] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0L))
          var n = prev.n_events
          var v = prev.value_e6
          rows.foreach { e => n += 1; v += math.round(e.value * 1000000) }
          val next = UserTotal(user, n, v)
          state.update(next)
          Iterator(next)
      }
  }
}
