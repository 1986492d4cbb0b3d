package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Splits, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus metrics, capacity heuristics, and the mixing/epoch machinery:
  * source-skew report (reference: src/metrics.rs:42-90), capacity
  * estimation (src/heuristics.rs:21-46), order-insensitive population
  * checksum (src/epoch.rs:301-316), exact weighted allocation (the
  * deterministic counterpart of the reference's smooth weighted
  * round-robin drain, src/ingestion.rs:607-675), epoch-interleaved
  * ordering (src/epoch.rs:34-83), and pad-with-reuse batch exactness
  * (src/sampler/mod.rs:3091-3100).
  *
  * The mutable-cursor machinery of the reference dissolves into rank
  * arithmetic: allocation = largest-remainder over integer weights;
  * interleave position = record_rank * num_sources + source_rank; padding
  * = index modulo pool size. All exact integers, all replayed by the
  * oracle.
  */
object MetricsQueries extends QueryModule {

  private val Seed = "42"

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q40_source_skew",
      (s, dir) => {
        val all = Window.partitionBy()
        Tables.load(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
          .withColumn("share_e6", TextAnalysis.ratioE6(col("n"), sum(col("n")).over(all)))
          .withColumn("imbalance_e6", TextAnalysis.ratioE6(col("n"), min(col("n")).over(all)))
      },
      Some(s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source)
        SELECT source, n,
          ${TextAnalysis.duckRatioE6("n", "sum(n) OVER ()")} AS share_e6,
          ${TextAnalysis.duckRatioE6("n", "min(n) OVER ()")} AS imbalance_e6
        FROM c""")),

    QueryDef("q41_capacity",
      (s, dir) => {
        // effective = n*P*K with P=1, K=4 (reference: src/constants.rs:61-66)
        Tables.load(s, dir, "documents")
          .select(col("source"), Splits.splitCol(col("doc_id"), Seed).as("split"))
          .groupBy(col("source"), col("split")).agg(count(lit(1)).as("n"))
          .withColumn("raw_pairs", col("n") * (col("n") - 1))
          .withColumn("effective", col("n") * 4)
      },
      Some(s"""WITH c AS (
          SELECT source, ${Splits.duckSplitSql("doc_id", Seed)} AS split,
            CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2)
        SELECT source, split, n, n * (n - 1) AS raw_pairs, n * 4 AS effective FROM c""")),

    QueryDef("q42_population_checksum",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_records"),
            sum(Determinism.seeded("pc", concat(col("doc_id").cast("string"),
              lit(":"), col("source")))).as("checksum"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_records,
        CAST(sum(${Determinism.duckSeeded("pc", "CAST(doc_id AS VARCHAR) || ':' || source")}) AS BIGINT) AS checksum
        FROM documents""")),

    QueryDef("q53_temperature_allocation",
      // TEMPERATURE-scaled source mixing (the multilingual-LLM
      // alpha-sampling recipe): allocation weight ∝ n^alpha with
      // alpha = 0.5, which flattens head sources and boosts the tail.
      // Weights are floor(sqrt(n) * 1000) — sqrt is correctly rounded
      // IEEE in both engines, so the integer weights (and therefore the
      // exact largest-remainder allocation) are bit-identical.
      (s, dir) => {
        val groups = Tables.load(s, dir, "documents")
          .groupBy(col("source").as("group")).agg(count(lit(1)).as("n"))
          .withColumn("w", floor(sqrt(col("n").cast("double")) * 1000).cast("long"))
        graft.operators.Mixing.weightedAllocation(groups, 1000L)
          .select(col("group").as("source"), col("w"), col("alloc"))
      },
      Some(s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        w AS (SELECT source, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w FROM c),
        t AS (SELECT source, w, sum(w) OVER () AS tw,
          (1000 * w) // (sum(w) OVER ()) AS flo,
          (1000 * w) % (sum(w) OVER ()) AS rem FROM w),
        r AS (SELECT *, 1000 - sum(flo) OVER () AS short,
          CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rr FROM t)
        SELECT source, CAST(w AS BIGINT) AS w,
          CAST(flo + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS BIGINT) AS alloc
        FROM r""")),

    QueryDef("q137_unimax_allocation",
      // UniMax budget allocation (Chung et al. 2023) over the corpus's
      // LANGUAGE distribution — the multilingual-pretraining mix that
      // replaces temperature sampling (q53): every language is capped
      // at `epochs` passes over its data, and the budget the capped
      // tail leaves behind rolls forward into the head (en). Budget =
      // 1.8x the corpus, epochs = 2, so BOTH branches bind: the four
      // small languages hit their 2-epoch caps and English absorbs the
      // remainder. The walk is a driver fold over the #languages frame
      // (Mixing.unimaxAllocation); DuckDB replays it as a recursive CTE
      // through the operator's own SQL twin.
      (s, dir) => {
        val groups = Tables.load(s, dir, "documents")
          .groupBy(col("lang").as("group")).agg(count(lit(1)).as("n"))
        val total = groups.agg(sum(col("n"))).collect()(0).getLong(0)
        graft.operators.Mixing.unimaxAllocation(groups, 9L * total / 5L, 2L)
          .select(col("group").as("lang"), col("n"), col("alloc"))
      },
      Some {
        val inner = graft.operators.Mixing.duckUnimaxSql(
          "(SELECT lang AS \"group\", CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang)",
          "SELECT 9 * count(*) // 5 FROM documents", "2")
        s"""SELECT "group" AS lang, n, alloc FROM ($inner) t"""
      }),

    QueryDef("q43_weighted_allocation",
      (s, dir) => {
        val groups = Tables.load(s, dir, "documents")
          .groupBy(col("source").as("group")).agg(count(lit(1)).as("n"))
          .withColumn("w", pmod(Determinism.seeded("w", col("group")), lit(5)) + 1)
        graft.operators.Mixing.weightedAllocation(groups, 1000L)
          .select(col("group").as("source"), col("w"), col("alloc"))
      },
      Some(s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        w AS (SELECT source, ${Determinism.duckSeeded("w", "source")} % 5 + 1 AS w FROM c),
        t AS (SELECT source, w, sum(w) OVER () AS tw,
          (1000 * w) // (sum(w) OVER ()) AS flo,
          (1000 * w) % (sum(w) OVER ()) AS rem FROM w),
        r AS (SELECT *, 1000 - sum(flo) OVER () AS short,
          CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rr FROM t)
        SELECT source, CAST(w AS BIGINT) AS w,
          CAST(flo + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS BIGINT) AS alloc
        FROM r""")),

    QueryDef("q129_smooth_wrr_drain",
      // the reference's EXACT smooth weighted-round-robin drain
      // interleaving (src/ingestion.rs:607-675) — closing the documented
      // q43 delta (largest-remainder = same long-run shares, different
      // short-run order): per draw every eligible source gains its weight
      // of credit, the first strict-max source is picked and pays back
      // the eligible total, buffers deplete (capped here so eligibility
      // SHRINKS mid-drain and the late interleave provably reflects it).
      // The drain order is #sources-sized counter arithmetic on the
      // driver (the reference's own loop; the slot-schedule idiom);
      // record resolution is a keyed window + join. The oracle replays
      // the loop as a DuckDB recursive CTE over (credit, remaining) LIST
      // state — credits, picks, and depletion must match step for step.
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .filter(expr("doc_id % 7 = 0"))
          .select(col("doc_id"), col("source"))
        val stats = docs.groupBy(col("source")).agg(count(lit(1)).cast("long").as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
        val srcs = stats.map { case (src, cnt) =>
          (src,
            Determinism.jvmHash(s"wrrw:$src") % 5 + 1,
            math.min(cnt, Determinism.jvmHash(s"wrrcap:$src") % 8 + 3))
        }
        val order = graft.operators.Mixing.smoothWrrDrain(srcs, 60L)
        val odf = order.toDF("slot", "source")
          .withColumn("k", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("slot"))).cast("long") - 1)
        val ranked = docs.withColumn("k", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long") - 1)
        odf.join(ranked, Seq("source", "k"))
          .select(col("slot"), col("source"), col("doc_id"))
      },
      Some {
        val hw = Determinism.duckHash("'wrrw:' || source")
        val hc = Determinism.duckHash("'wrrcap:' || source")
        val sentinel = "-9223372036854775807"
        s"""WITH RECURSIVE base AS (
          SELECT doc_id, source FROM documents WHERE doc_id % 7 = 0
        ), st AS (
          SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY source
        ), srcs AS (
          SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS i,
            CAST($hw % 5 + 1 AS BIGINT) AS w,
            least(cnt, CAST($hc % 8 + 3 AS BIGINT)) AS cap
          FROM st
        ), arrs AS (
          SELECT list(w ORDER BY i) AS ws, list(cap ORDER BY i) AS rem0,
            list(source ORDER BY i) AS names, CAST(count(*) AS BIGINT) AS k
          FROM srcs
        ), steps AS (
          SELECT CAST(-1 AS BIGINT) AS slot,
            list_transform(ws, x -> CAST(0 AS BIGINT)) AS cur,
            rem0 AS rem, CAST(NULL AS BIGINT) AS pick
          FROM arrs
          UNION ALL
          SELECT slot + 1,
            list_transform(generate_series(1, k), j ->
              CASE WHEN j = pick THEN cur2[j] - tw ELSE cur2[j] END),
            list_transform(generate_series(1, k), j ->
              CASE WHEN j = pick THEN rem[j] - 1 ELSE rem[j] END),
            pick
          FROM (
            SELECT s3.*, list_position(masked, list_max(masked)) AS pick FROM (
              SELECT s2.*,
                list_transform(generate_series(1, k), j ->
                  CASE WHEN ws[j] > 0 AND rem[j] > 0 THEN cur2[j] ELSE $sentinel END) AS masked
              FROM (
                SELECT s1.*,
                  list_transform(generate_series(1, k), j ->
                    CASE WHEN ws[j] > 0 AND rem[j] > 0 THEN cur[j] + ws[j] ELSE cur[j] END) AS cur2
                FROM (
                  SELECT s.slot, s.cur, s.rem, a.ws, a.names, a.k,
                    CAST(list_sum(list_transform(generate_series(1, a.k), j ->
                      CASE WHEN a.ws[j] > 0 AND s.rem[j] > 0 THEN a.ws[j] ELSE 0 END)) AS BIGINT) AS tw
                  FROM steps s CROSS JOIN arrs a
                  WHERE s.slot + 1 < 60
                ) s1 WHERE tw > 0
              ) s2
            ) s3
          ) s4
        ), picks AS (
          SELECT s.slot, a.names[s.pick] AS source
          FROM steps s CROSS JOIN arrs a WHERE s.slot >= 0
        ), wk AS (
          SELECT slot, source,
            CAST(row_number() OVER (PARTITION BY source ORDER BY slot) AS BIGINT) - 1 AS kk
          FROM picks
        ), rk AS (
          SELECT doc_id, source,
            CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) - 1 AS kk
          FROM base
        )
        SELECT w.slot, w.source, r.doc_id
        FROM wk w JOIN rk r ON w.source = r.source AND w.kk = r.kk"""
      }),

    QueryDef("q44_epoch_interleave",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id").as("id"), col("source"))
          .filter(Splits.splitCol(col("id"), Seed) === Splits.Train)
        graft.operators.Mixing.epochInterleave(d, epoch = 0L)
          .filter(col("pos") < 100)
          .select(col("id").as("doc_id"), col("source"), col("pos"))
      },
      Some(s"""WITH d AS (
          SELECT doc_id, source FROM documents
          WHERE ${Splits.duckSplitSql("doc_id", Seed)} = 'train'
        ), srcs AS (
          SELECT source,
            CAST(row_number() OVER (ORDER BY ${Determinism.duckSeeded("so:0", "source")}, source) AS BIGINT) - 1 AS srank,
            CAST(count(*) OVER () AS BIGINT) AS ns
          FROM (SELECT DISTINCT source FROM d)
        ), rr AS (
          SELECT d.doc_id, d.source, srcs.srank, srcs.ns,
            CAST(row_number() OVER (PARTITION BY d.source ORDER BY ${Determinism.duckSeeded("ro:0", "doc_id")}, doc_id) AS BIGINT) - 1 AS r
          FROM d JOIN srcs ON d.source = srcs.source
        )
        SELECT doc_id, source, r * ns + srank AS pos FROM rr WHERE r * ns + srank < 100""")),

    QueryDef("q46_epoch_reconcile",
      // mid-epoch population refresh (reference: src/epoch.rs:187-229): 50
      // records of a thinner epoch-1 population are consumed, then the
      // population grows — consumed ids must sort AFTER every unconsumed
      // one while both sides keep their interleave order. The final
      // row_number runs on <=60 rows (bounded by the pos filter), not the
      // corpus.
      (s, dir) => {
        import graft.operators.Mixing
        val all = Tables.load(s, dir, "documents")
          .select(col("doc_id").as("id"), col("source"))
          .filter(Splits.splitCol(col("id"), Seed) === Splits.Train)
        val pre = all.filter(expr("id % 7 != 0"))
        val consumed = Mixing.epochInterleave(pre, 1L)
          .filter(col("pos") < 50).select(col("id"))
        val rec = Mixing.reconcile(Mixing.epochInterleave(all, 1L), consumed)
        rec.filter(col("pos") < 60)
          .withColumn("new_pos", row_number().over(Window.partitionBy()
            .orderBy(col("consumed"), col("pos"))).cast("long") - 1)
          .select(col("id").as("doc_id"), col("source"), col("consumed"),
            col("pos"), col("new_pos"))
      },
      Some(s"""WITH d_all AS (
          SELECT doc_id, source FROM documents
          WHERE ${Splits.duckSplitSql("doc_id", Seed)} = 'train'
        ), d_pre AS (
          SELECT * FROM d_all WHERE doc_id % 7 != 0
        ), srcs_pre AS (
          SELECT source,
            CAST(row_number() OVER (ORDER BY ${Determinism.duckSeeded("so:1", "source")}, source) AS BIGINT) - 1 AS srank,
            CAST(count(*) OVER () AS BIGINT) AS ns
          FROM (SELECT DISTINCT source FROM d_pre)
        ), rr_pre AS (
          SELECT d.doc_id,
            (CAST(row_number() OVER (PARTITION BY d.source ORDER BY ${Determinism.duckSeeded("ro:1", "doc_id")}, doc_id) AS BIGINT) - 1) * s.ns + s.srank AS pos
          FROM d_pre d JOIN srcs_pre s ON d.source = s.source
        ), consumed AS (
          SELECT doc_id FROM rr_pre WHERE pos < 50
        ), srcs AS (
          SELECT source,
            CAST(row_number() OVER (ORDER BY ${Determinism.duckSeeded("so:1", "source")}, source) AS BIGINT) - 1 AS srank,
            CAST(count(*) OVER () AS BIGINT) AS ns
          FROM (SELECT DISTINCT source FROM d_all)
        ), rr AS (
          SELECT d.doc_id, d.source,
            (CAST(row_number() OVER (PARTITION BY d.source ORDER BY ${Determinism.duckSeeded("ro:1", "doc_id")}, doc_id) AS BIGINT) - 1) * s.ns + s.srank AS pos
          FROM d_all d JOIN srcs s ON d.source = s.source
        ), rec AS (
          SELECT rr.doc_id, rr.source, (c.doc_id IS NOT NULL) AS consumed, rr.pos
          FROM rr LEFT JOIN consumed c ON rr.doc_id = c.doc_id
          WHERE rr.pos < 60
        )
        SELECT doc_id, source, consumed, pos,
          CAST(row_number() OVER (ORDER BY consumed, pos) AS BIGINT) - 1 AS new_pos
        FROM rec""")),

    QueryDef("q45_pad_with_reuse",
      (s, dir) => {
        val cands = Tables.load(s, dir, "documents")
          .select(col("doc_id").as("id"))
          .filter(Splits.splitCol(col("id"), Seed) === Splits.Validation)
        graft.operators.Mixing.padToBatch(s, cands, 64, "pad")
          .select(col("i"), col("id").as("doc_id"))
      },
      Some(s"""WITH cands AS (
          SELECT doc_id,
            CAST(row_number() OVER (ORDER BY ${Determinism.duckSeeded("pad", "doc_id")}, doc_id) AS BIGINT) - 1 AS rn,
            CAST(count(*) OVER () AS BIGINT) AS nc
          FROM documents WHERE ${Splits.duckSplitSql("doc_id", Seed)} = 'validation'
        )
        SELECT CAST(i AS BIGINT) AS i, doc_id
        FROM generate_series(0, 63) t(i) JOIN cands ON i % nc = rn""")),

    QueryDef("q108_budget_selection",
      // token-budget corpus selection (operators.Curation.budgetSelection):
      // keep the best-quality prefix whose cumulative tokens fit 30% of
      // the corpus — computed WITHOUT a global window (histogram cutoff:
      // ≤101 quality bands aggregate + ONE in-band window on the single
      // boundary band). The oracle states the global prefix rule directly
      // with an unbounded window — the two-phase plan must match it
      // exactly, which is the law being checked.
      (s, dir) => graft.operators.Curation.budgetSelection(
        Tables.load(s, dir, "documents"), "doc_id", "text", fracE6 = 300000L),
      Some {
        val toks = graft.functions.TextFunctions.duckTokens("text")
        s"""WITH base AS (
            SELECT doc_id,
              ${TextAnalysis.duckQualityE6("text", toks)} AS quality_e6,
              CAST(len($toks) AS BIGINT) AS n_tokens
            FROM documents),
          tot AS (SELECT CAST((sum(n_tokens) * 300000) // 1000000 AS BIGINT)
            AS budget FROM base),
          r AS (SELECT doc_id, quality_e6, n_tokens,
              sum(n_tokens) OVER (ORDER BY quality_e6 DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM base)
          SELECT doc_id, quality_e6, n_tokens,
            CAST(CASE WHEN cum <= budget THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM r CROSS JOIN tot"""
      }),

    QueryDef("q112_corpus_stats_report",
      // the mixture-design report: per-source doc/token mass plus EXACT
      // token-count quantiles as order statistics (type-1: the value at
      // rank ceil(p·n) in (n_tokens, doc_id) order) — approx_percentile
      // sketches are not cross-engine portable, rank arithmetic is. One
      // keyed window per source (rank + count share the sort), then a
      // conditional aggregate pivots the three quantile rows; quality is
      // the e6-exact mean (sum div n).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = docs.select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
          TextAnalysis.qualityE6(col("text")).as("qe6"))
        val w = Window.partitionBy(col("source")).orderBy(col("n_tok"), col("doc_id"))
        val ranked = base
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
        def atQ(p: Int) = max(when(
          col("rk") === expr(s"(n * $p + 99) div 100"), col("n_tok")))
        ranked.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tokens"),
            min(col("n_tok")).as("tok_min"),
            atQ(25).as("tok_p25"), atQ(50).as("tok_p50"), atQ(75).as("tok_p75"),
            max(col("n_tok")).as("tok_max"),
            expr("sum(qe6) div count(1)").as("quality_mean_e6"))
      },
      Some {
        val toks = graft.functions.TextFunctions.duckTokens("text")
        s"""WITH base AS (SELECT doc_id, source,
            CAST(len($toks) AS BIGINT) AS n_tok,
            ${TextAnalysis.duckQualityE6("text", toks)} AS qe6
          FROM documents),
        ranked AS (SELECT *,
            CAST(row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS BIGINT) AS rk,
            CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
          FROM base)
        SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS total_tokens,
          CAST(min(n_tok) AS BIGINT) AS tok_min,
          CAST(max(CASE WHEN rk = (n * 25 + 99) // 100 THEN n_tok END) AS BIGINT) AS tok_p25,
          CAST(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN n_tok END) AS BIGINT) AS tok_p50,
          CAST(max(CASE WHEN rk = (n * 75 + 99) // 100 THEN n_tok END) AS BIGINT) AS tok_p75,
          CAST(max(n_tok) AS BIGINT) AS tok_max,
          CAST(sum(qe6) // count(*) AS BIGINT) AS quality_mean_e6
        FROM ranked GROUP BY source"""
      }),

    QueryDef("q117_sample_quantiles",
      // quantiles from a BOTTOM-K HASH SAMPLE (operators.Sketches): at
      // 100 TB the q112 exact quantiles cost a full per-group sort; the
      // sketch keeps the 64 rows with the smallest seeded id-hash per
      // source (one keyed top-k window) and reads the type-1 order
      // statistic off the sample. Sample membership is a pure hash
      // function — partition/order invariant and mergeable (bottom-k of
      // a union = bottom-k of the parts' bottom-k's) where KLL/t-digest
      // never hash-match across engines. The exact quantile rides along
      // (same operator with k past the group size) so the artifact shows
      // the sample error directly.
      (s, dir) => {
        import graft.operators.Sketches
        val rows = Tables.load(s, dir, "documents")
          .select(col("source").as("group"), col("doc_id").as("id"),
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("value"))
        val ps = Seq(10, 50, 90)
        val est = Sketches.sampleQuantiles(rows, 64, ps)
        val exact = Sketches.sampleQuantiles(rows, Int.MaxValue, ps)
          .withColumnRenamed("q_est", "q_exact")
        est.join(exact, Seq("group", "p"))
          .select(col("group").as("source"), col("p"), col("q_est"), col("q_exact"))
      },
      Some {
        import graft.operators.Sketches
        val toks = graft.functions.TextFunctions.duckTokens("text")
        val ps = Seq(10, 50, 90)
        s"""WITH rows0 AS MATERIALIZED (SELECT source AS grp, doc_id AS id,
            CAST(len($toks) AS BIGINT) AS value FROM documents),
          est AS ${Sketches.duckSampleQuantiles("rows0", 64, ps)},
          exact AS ${Sketches.duckSampleQuantiles("rows0", Int.MaxValue, ps)}
          SELECT est.grp AS source, est.p, est.q_est, exact.q_est AS q_exact
          FROM est JOIN exact ON est.grp = exact.grp AND est.p = exact.p"""
      })
  )
}
