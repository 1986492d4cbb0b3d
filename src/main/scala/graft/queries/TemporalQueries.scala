package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators: as-of join, temporal-offset nearest-neighbor
  * (the reference's `Selector::TemporalOffset`, src/sampler/mod.rs:950-976),
  * tumbling-window aggregation, and sessionization.
  *
  * `events.ts` is an int64 **nanosecond** column on the Spark side (see
  * core.Tables) and `epoch_ns(ts)` in DuckDB — all time arithmetic is exact
  * integer math; no doubles, no timezone traps.
  *
  * Scale design: the as-of join is the union+window formulation — tag both
  * streams, one shuffle by user, one ordered window pass carrying the last
  * click forward. That is O(n log n/partition) with a single shuffle and no
  * range-join blowup; it is also exactly how the same op runs under
  * Structured Streaming (ordered state per key). The per-key pairwise
  * variant (q61) is reserved for bounded per-key cardinality (orders per
  * customer), where it beats the window form by avoiding a full sort.
  */
object TemporalQueries extends QueryModule {

  // DuckDB (and thus the oracle) reads the ns parquet column truncated to
  // µs TIMESTAMPs; Spark reads exact int64 ns. µs is the common exact
  // denominator: Spark `ts div 1000` == DuckDB `epoch_us(ts)`.
  private val SessionGapUs = 1800L * 1000000L // 30 min

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q60_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
        // dedupe clicks at identical (user, ts): keep max event_id
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_us")).agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("ts_us"), lit(0).as("kind"), col("click_id"),
            lit(null).cast("long").as("purchase_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
            lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("kind"), col("click_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
          .withColumn("last_click_ts", last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("purchase_id"), col("user_id"),
            col("last_click").as("click_id"),
            expr("(ts_us - last_click_ts) div 1000000").as("gap_s"))
      },
      Some("""WITH c AS (
          SELECT user_id, epoch_us(ts) AS ts_us, CAST(max(event_id) AS BIGINT) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
        ), p AS (
          SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id, c.click_id,
          (p.ts_us - c.ts_us) // 1000000 AS gap_s
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us""")),

    QueryDef("q61_temporal_offset_neighbor",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val sec = expr("cast(cast(o_orderdate as timestamp) as long)")
        val base = o.select(col("o_orderkey").as("k1"), col("o_custkey").as("c1"), sec.as("s1"))
        val cand = o.select(col("o_orderkey").as("k2"), col("o_custkey").as("c2"), sec.as("s2"))
        base.join(cand, col("c1") === col("c2") && col("k1") =!= col("k2"))
          .withColumn("selkey",
            abs(col("s2") - (col("s1") + lit(2592000L))) * 10000000L + col("k2"))
          .groupBy(col("k1"))
          .agg(min_by(col("k2"), col("selkey")).as("neighbor_key"),
            min(col("selkey")).as("sel_key"))
      },
      Some("""WITH b AS (SELECT o_orderkey AS k, o_custkey AS c, CAST(epoch(o_orderdate) AS BIGINT) AS sec FROM orders)
        SELECT b1.k AS k1,
          min_by(b2.k, abs(b2.sec - (b1.sec + 2592000)) * 10000000 + b2.k) AS neighbor_key,
          CAST(min(abs(b2.sec - (b1.sec + 2592000)) * 10000000 + b2.k) AS BIGINT) AS sel_key
        FROM b b1 JOIN b b2 ON b1.c = b2.c AND b1.k <> b2.k
        GROUP BY b1.k""")),

    QueryDef("q62_event_window_agg",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(expr("(ts div 1000) div 21600000000").as("win6h"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 1000000).cast("long")).as("value_e6"))
      },
      Some("""SELECT epoch_us(ts) // 21600000000 AS win6h, event_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_e6
        FROM events GROUP BY 1, 2""")),

    QueryDef("q63_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
          .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"),
            max(col("ts_us") - col("prev_ts")).as("max_gap_us"))
      },
      Some(s"""WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > $SessionGapUs THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
          CAST(max(ts_us - prev_us) AS BIGINT) AS max_gap_us
        FROM e GROUP BY user_id"""))
  )
}
