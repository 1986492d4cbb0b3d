package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Splits, Tables}
import graft.functions.TextFunctions
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
          .withColumn("dsec", abs(col("s2") - (col("s1") + lit(2592000L))))
          .groupBy(col("k1"))
          .agg(min_by(col("k2"), struct(col("dsec"), col("k2"))).as("neighbor_key"),
            min(col("dsec")).as("sel_dsec"))
      },
      // two-pass lexicographic argmin (min Δ, then min key among ties):
      // DuckDB 1.0 executes a per-pair LIST min pathologically (447 s at
      // sf0.1 for ~1.3M pairs vs 0.8 s for this form — the list
      // allocation per row dominated the whole oracle suite), and its
      // arg_min has no composite-key overload
      Some("""WITH b AS (SELECT o_orderkey AS k, o_custkey AS c, CAST(epoch(o_orderdate) AS BIGINT) AS sec FROM orders),
        pairs AS MATERIALIZED (
          SELECT b1.k AS k1, b2.k AS k2, abs(b2.sec - (b1.sec + 2592000)) AS d
          FROM b b1 JOIN b b2 ON b1.c = b2.c AND b1.k <> b2.k
        ),
        best AS (SELECT k1, min(d) AS md FROM pairs GROUP BY k1)
        SELECT p.k1, CAST(min(p.k2) AS BIGINT) AS neighbor_key,
          CAST(min(p.d) AS BIGINT) AS sel_dsec
        FROM pairs p JOIN best t ON p.k1 = t.k1 AND p.d = t.md
        GROUP BY p.k1""")),

    QueryDef("q64_temporal_selector",
      // Selector::TemporalOffset executed through the recipe engine
      // (reference: src/sampler/mod.rs:1701-1704 -> 950-976): the positive
      // comes from a DIFFERENT record — the same-(source, split) neighbor
      // nearest to created_at + offset_days — and is that neighbor's
      // hash-picked context window. Neighbor choice is q61's deterministic
      // min_by (lexicographic (|time diff|, id), never an engine-arbitrary
      // tie); chunk pick is the selectChunk rank arithmetic on the
      // neighbor's windows. The corpus carries no created_at, so a
      // hash-derived day stands in (both engines derive it identically).
      // Pairwise neighbor search is bounded per (source, split) pool;
      // unbounded-cardinality callers use q60's union+window as-of form.
      (s, dir) => {
        val offSec = 2L * 86400L
        val docs = Tables.load(s, dir, "documents").filter(expr("doc_id % 5 = 0"))
        val b = docs.select(col("doc_id"), col("source"),
          Splits.splitCol(col("doc_id"), "42").as("split"),
          (pmod(Determinism.seeded("ct", col("doc_id")), lit(30)) * 86400L).as("sec"))
        val cand = b.select(col("doc_id").as("nid"), col("source").as("nsource"),
          col("split").as("nsplit"), col("sec").as("nsec"))
        val nb = b.join(cand, col("source") === col("nsource") &&
            col("split") === col("nsplit") && col("doc_id") =!= col("nid"))
          .withColumn("selkey", struct(
            abs(col("nsec") - (col("sec") + lit(offSec))).as("d"), col("nid").as("i")))
          .groupBy(col("doc_id").as("aid"))
          .agg(min_by(col("nid"), col("selkey")).as("nid"))
        val w = Window.partitionBy(col("record_id"))
          .orderBy(col("section_idx"), col("view_kind"), col("window_index"), col("overlap"))
        val ranked = RecipeQueries.contextChunks(docs)
          .withColumn("crnk", row_number().over(w).cast("long") - 1)
          .withColumn("csize", count(lit(1)).over(
            Window.partitionBy(col("record_id"))).cast("long"))
        nb.join(ranked, col("record_id") === col("nid") &&
            col("crnk") === pmod(Determinism.seeded("tsel", col("aid")), col("csize")))
          .select(col("aid"), col("nid"),
            col("window_index").cast("long").as("p_widx"),
            Determinism.portableHash(col("wtext")).as("p_hash"))
      },
      Some(s"""WITH d0 AS (
          SELECT doc_id, source, ${TextFunctions.duckTokens("text")} AS toks FROM documents
          WHERE doc_id % 5 = 0
        ), b AS (
          SELECT doc_id, source, ${Splits.duckSplitSql("doc_id", "42")} AS split,
            (${Determinism.duckSeeded("ct", "doc_id")} % 30) * 86400 AS sec
          FROM d0
        ), nbp AS MATERIALIZED (
          -- two-pass lexicographic argmin, not a per-pair LIST min (the
          -- q61 twin's list form was pathological in DuckDB 1.0)
          SELECT b1.doc_id AS aid, b2.doc_id AS cid,
            abs(b2.sec - (b1.sec + 172800)) AS d
          FROM b b1 JOIN b b2 ON b1.source = b2.source AND b1.split = b2.split
            AND b1.doc_id <> b2.doc_id
        ), nbb AS (
          SELECT aid, min(d) AS md FROM nbp GROUP BY aid
        ), nb AS (
          SELECT p.aid, min(p.cid) AS nid
          FROM nbp p JOIN nbb t ON p.aid = t.aid AND p.d = t.md
          GROUP BY p.aid
        ), base AS (
          SELECT doc_id, toks, len(toks) AS n FROM d0 WHERE len(toks) >= ${RecipeQueries.MinToks}
        ), cq AS (
          SELECT doc_id, list_slice(toks, ${RecipeQueries.AT + 1}, n) AS ctoks,
            n - ${RecipeQueries.AT} AS cn FROM base
        ), cq2 AS (
          SELECT doc_id, ctoks, cn, LEAST(${RecipeQueries.W}, cn) AS span,
            CASE WHEN cn <= ${RecipeQueries.W} THEN 1
                 ELSE CAST(floor((cn - LEAST(${RecipeQueries.W}, cn) + ${RecipeQueries.ST - 1}) / ${RecipeQueries.ST}.0) AS INT) + 1 END AS k
          FROM cq
        ), cwin AS (
          SELECT doc_id, ctoks, cn, span, unnest(generate_series(0, k - 1)) AS i FROM cq2
        ), cch AS (
          SELECT doc_id AS record_id, 1 AS section_idx, 'window' AS view_kind,
            CAST(i AS INT) AS window_index, ${RecipeQueries.OV} AS overlap,
            array_to_string(list_slice(ctoks, i * ${RecipeQueries.ST} + 1, i * ${RecipeQueries.ST} + LEAST(span, cn - i * ${RecipeQueries.ST})), ' ') AS wtext
          FROM cwin
        ), rk AS (
          SELECT *,
            CAST(row_number() OVER (PARTITION BY record_id
              ORDER BY section_idx, view_kind, window_index, overlap) AS BIGINT) - 1 AS crnk,
            CAST(count(*) OVER (PARTITION BY record_id) AS BIGINT) AS csize
          FROM cch
        )
        SELECT nb.aid, nb.nid,
          CAST(rk.window_index AS BIGINT) AS p_widx,
          ${Determinism.duckHash("rk.wtext")} AS p_hash
        FROM nb JOIN rk ON rk.record_id = nb.nid
          AND rk.crnk = ${Determinism.duckSeeded("tsel", "nb.aid")} % rk.csize""")),

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
        FROM e GROUP BY user_id""")),

    QueryDef("q125_range_join_attribution",
      // point-in-interval RANGE JOIN, the scale-safe way: each purchase
      // opens a 30-minute attribution window and we count the user's
      // clicks inside it. A naive formulation is a theta join (Spark
      // falls back to BroadcastNestedLoop — O(n·m)); here intervals
      // explode to their ≤2 covering width-W time buckets and the join is
      // EQUI on (user, bucket) + a containment filter — every contained
      // point shares a bucket with its interval by construction, so
      // recall is structural and the shuffle is one hash join at any
      // scale. (The oracle states the containment predicate directly —
      // DuckDB's optimizer handles the small-data theta form.)
      (s, dir) => {
        val W = SessionGapUs // 30-min windows, bucket width = window width
        // FLOOR division, not `div` (trunc-toward-zero): for negative
        // ts_us trunc != floor and the ≤2-bucket cover guarantee breaks
        // (a contained click could land in a bucket its interval never
        // emits, silently dropping attributions vs the oracle's direct
        // containment predicate). Exact integer floor-div — no doubles.
        def fdiv(e: String): String =
          s"(($e) div $W) - (CASE WHEN ($e) % $W < 0 THEN 1 ELSE 0 END)"
        val ev = Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts_us").as("p_us"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_us"),
            round(col("value") * 1000000).cast("long").as("v_e6"))
          .withColumn("bucket", expr(fdiv("c_us")))
        val ibuck = pur.select(col("purchase_id"), col("user_id"), col("p_us"),
          explode(array_distinct(array(
            expr(fdiv("p_us")), expr(fdiv(s"p_us + ${W - 1}"))))).as("bucket"))
        val hits = ibuck.join(clk, Seq("user_id", "bucket"))
          .filter(col("c_us") >= col("p_us") && col("c_us") < col("p_us") + W)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n"), sum(col("v_e6")).as("v"))
        pur.join(hits, Seq("purchase_id"), "left")
          .select(col("purchase_id"),
            coalesce(col("n"), lit(0L)).as("n_clicks"),
            coalesce(col("v"), lit(0L)).as("click_value_e6"))
      },
      Some(s"""WITH e AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
            CAST(round(value * 1000000) AS BIGINT) AS v_e6
          FROM events),
        p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
              FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id, us AS c_us, v_e6 FROM e WHERE event_type = 'click'),
        h AS (SELECT p.purchase_id, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(c.v_e6) AS BIGINT) AS v
          FROM p JOIN c ON p.user_id = c.user_id
            AND c.c_us >= p.p_us AND c.c_us < p.p_us + $SessionGapUs
          GROUP BY p.purchase_id)
        SELECT p.purchase_id,
          CAST(coalesce(h.n, 0) AS BIGINT) AS n_clicks,
          CAST(coalesce(h.v, 0) AS BIGINT) AS click_value_e6
        FROM p LEFT JOIN h USING (purchase_id)"""))
  )
}
