package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Splits, SplitRatios, Tables}
import graft.functions.TextFunctions
import graft.operators.{Curation, Mixing}
import org.apache.spark.sql.functions._

/** Deterministic split assignment and sliding-window chunking, expressed as
  * pure column pipelines over the `documents` table so the DuckDB oracle can
  * replay them bit-for-bit.
  *
  * The chunk query is the column-expression twin of [[graft.operators.Chunker]]
  * (same window layout math) — `sequence`+`explode` generates window indexes,
  * `slice` carves token arrays. It is a narrow plan: scan → project →
  * generate, no shuffle, so it scales linearly with input splits.
  */
object SamplingQueries extends QueryModule {

  private val Seed = "42"
  // Small window parameters so the ~300-char synthetic docs produce
  // multi-window layouts (the library default is 1024/64/512).
  private val W = 32   // max_window_tokens
  private val OV = 8   // overlap
  private val ST = W - OV // stride
  private val SUM = 16 // summary_fallback_tokens

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q13_chunker_typed",
      // the typed flatMap chunker (operators.Chunker over Dataset[DataRecord])
      // must produce exactly the column-pipeline window layout — same oracle
      // family as q12, proving typed path == column path == oracle
      (s, dir) => {
        import s.implicits._
        import graft.core.{DataRecord, RecordSection}
        import graft.operators.{Chunker, ChunkingStrategy}
        val ts = new java.sql.Timestamp(0L)
        val records = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text")).as[(Long, String, String)]
          .map { t: (Long, String, String) =>
            DataRecord(t._1.toString, t._2, ts, ts, 1.0f, Seq(t._2),
              Seq(RecordSection("context", None,
                graft.functions.Sentences.normalizeInlineWhitespace(t._3), Nil)), None)
          }
        implicit val spark: org.apache.spark.sql.SparkSession = s
        Chunker.chunkRecords(records,
            ChunkingStrategy(maxWindowTokens = W, overlapTokens = Seq(OV),
              summaryFallbackWeight = 0.35f, summaryFallbackTokens = SUM))
          .toDF()
          .select(col("record_id").cast("long").as("doc_id"),
            col("window_index").cast("long").as("widx"),
            col("span").cast("long").as("span"),
            col("tokens_estimate").cast("long").as("wtokens"),
            graft.core.Determinism.portableHash(col("text")).as("whash"))
      },
      Some(s"""WITH d AS (
          SELECT doc_id, ${TextFunctions.duckTokens("text")} AS toks FROM documents
        ), p AS (
          SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
        ), q AS (
          SELECT doc_id, toks, n, LEAST($W, n) AS span,
            CASE WHEN n <= $W THEN 1
                 ELSE CAST(floor((n - LEAST($W, n) + ${ST - 1}) / $ST.0) AS INT) + 1 END AS k
          FROM p
        ), w AS (
          SELECT doc_id, toks, n, span, unnest(generate_series(0, k - 1)) AS i FROM q
        ), wins AS (
          SELECT doc_id, CAST(i AS BIGINT) AS widx, CAST(span AS BIGINT) AS span,
            CAST(LEAST(span, n - i * $ST) AS BIGINT) AS wtokens,
            array_to_string(list_slice(toks, i * $ST + 1, i * $ST + LEAST(span, n - i * $ST)), ' ') AS wtext
          FROM w
        ), fb AS (
          SELECT doc_id, CAST(-1 AS BIGINT) AS widx, CAST(span AS BIGINT) AS span,
            CAST(LEAST(n, $SUM) AS BIGINT) AS wtokens,
            array_to_string(list_slice(toks, 1, LEAST(n, $SUM)), ' ') AS wtext
          FROM q WHERE n > $W
        ), allrows AS (SELECT * FROM wins UNION ALL SELECT * FROM fb)
        SELECT doc_id, widx, span, wtokens, ${Determinism.duckHash("wtext")} AS whash
        FROM allrows""")),

    QueryDef("q14_group_refresh_caps",
      // per-group refresh caps against dominant directories/sources
      // (reference: file_corpus.rs:546-571, grouping.rs:27-33): cap each
      // source at 5 records per refresh cycle, seeded-rank selection
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(Determinism.seeded("grpcap", col("doc_id")), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
      },
      Some(s"""SELECT doc_id, source, rn FROM (
          SELECT doc_id, source,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY ${Determinism.duckSeeded("grpcap", "doc_id")}, doc_id) AS BIGINT) AS rn
          FROM documents)
        WHERE rn <= 5""")),

    QueryDef("q15_split_overrides",
      // persisted SplitStore upserts (reference src/splits.rs:122-131):
      // an explicit (id, split) assignment wins over the hash derivation —
      // here 1-in-37 docs are pinned to test; the override table is
      // broadcast, the corpus never shuffles
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val overrides = docs.filter(expr("doc_id % 37 = 0"))
          .select(col("doc_id").as("id"), lit("test").as("split"))
        Splits.withOverrides(docs, col("doc_id"), Seed, overrides)
      },
      Some(s"""SELECT d.doc_id,
          COALESCE(o.split, ${Splits.duckSplitSql("d.doc_id", Seed)}) AS split
        FROM documents d
        LEFT JOIN (SELECT doc_id AS id, 'test' AS split FROM documents WHERE doc_id % 37 = 0) o
        ON d.doc_id = o.id""")),

    QueryDef("q10_split_assign",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), Splits.splitCol(col("doc_id"), Seed).as("split"))
      },
      Some(s"""SELECT doc_id, ${Splits.duckSplitSql("doc_id", Seed)} AS split FROM documents""")),

    QueryDef("q11_split_counts",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(Splits.splitCol(col("doc_id"), Seed, SplitRatios(0.5, 0.5, 0.0)).as("split"))
          .groupBy(col("split")).agg(count(lit(1)).as("n"))
      },
      // zero-ratio label must never appear (reference: src/splits.rs:827-850)
      Some(s"""SELECT ${Splits.duckSplitSql("doc_id", Seed, SplitRatios(0.5, 0.5, 0.0))} AS split,
        CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1""")),

    QueryDef("q12_chunk_windows",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val base = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") > 0)
          .withColumn("span", least(lit(W), col("n")))
          .withColumn("k", when(col("n") <= W, lit(1))
            .otherwise(floor((col("n") - col("span") + lit(ST - 1)) / lit(ST)).cast("int") + 1))
        val windows = base
          .withColumn("widx", explode(sequence(lit(0), col("k") - 1)))
          .withColumn("wtoks", expr(s"slice(toks, widx * $ST + 1, least(span, n - widx * $ST))"))
          .select(
            col("doc_id"),
            col("widx").cast("long").as("widx"),
            col("span").cast("long").as("span"),
            size(col("wtoks")).cast("long").as("wtokens"),
            array_join(col("wtoks"), " ").as("wtext"),
            floor(lit(1000000) / (col("widx") + 1)).cast("long").as("weight_e6"))
        val fallback = base.filter(col("n") > W)
          .withColumn("ftoks", expr(s"slice(toks, 1, least(n, $SUM))"))
          .select(
            col("doc_id"),
            lit(-1L).as("widx"),
            col("span").cast("long").as("span"),
            size(col("ftoks")).cast("long").as("wtokens"),
            array_join(col("ftoks"), " ").as("wtext"),
            lit(350000L).as("weight_e6"))
        windows.unionByName(fallback)
          .withColumn("whash", Determinism.portableHash(col("wtext")))
          .drop("wtext")
      },
      Some(s"""WITH d AS (
          SELECT doc_id, ${TextFunctions.duckTokens("text")} AS toks FROM documents
        ), p AS (
          SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
        ), q AS (
          SELECT doc_id, toks, n, LEAST($W, n) AS span,
            CASE WHEN n <= $W THEN 1
                 ELSE CAST(floor((n - LEAST($W, n) + ${ST - 1}) / $ST.0) AS INT) + 1 END AS k
          FROM p
        ), w AS (
          SELECT doc_id, toks, n, span, unnest(generate_series(0, k - 1)) AS i FROM q
        ), wins AS (
          SELECT doc_id, CAST(i AS BIGINT) AS widx, CAST(span AS BIGINT) AS span,
            CAST(LEAST(span, n - i * $ST) AS BIGINT) AS wtokens,
            array_to_string(list_slice(toks, i * $ST + 1, i * $ST + LEAST(span, n - i * $ST)), ' ') AS wtext,
            CAST(1000000 // (i + 1) AS BIGINT) AS weight_e6
          FROM w
        ), fb AS (
          SELECT doc_id, CAST(-1 AS BIGINT) AS widx, CAST(span AS BIGINT) AS span,
            CAST(LEAST(n, $SUM) AS BIGINT) AS wtokens,
            array_to_string(list_slice(toks, 1, LEAST(n, $SUM)), ' ') AS wtext,
            CAST(350000 AS BIGINT) AS weight_e6
          FROM q WHERE n > $W
        ), allrows AS (
          SELECT * FROM wins UNION ALL SELECT * FROM fb
        )
        SELECT doc_id, widx, span, wtokens, weight_e6,
          ${Determinism.duckHash("wtext")} AS whash
        FROM allrows""")),

    QueryDef("q48_stratified_sample",
      // exact proportional STRATIFIED sampling: largest-remainder
      // allocation of 120 slots across source strata (every stratum within
      // 1 of its proportional share, counts sum exactly), then a seeded
      // rank-pick inside each stratum. Allocation runs on a #strata-sized
      // frame and is broadcast back — no global ordering at any width.
      (s, dir) => Mixing.stratifiedSample(
          Tables.load(s, dir, "documents")
            .select(col("doc_id").as("id"), col("source").as("group")),
          120L, Seed)
        .select(col("id").as("doc_id"), col("group").as("source"), col("r")),
      Some(s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        t AS (SELECT source, n, sum(n) OVER () AS tw,
          (120 * n) // (sum(n) OVER ()) AS flo,
          (120 * n) % (sum(n) OVER ()) AS rem FROM c),
        r AS (SELECT *, 120 - sum(flo) OVER () AS short,
          CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rr FROM t),
        a AS (SELECT source, flo + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS alloc FROM r),
        rk AS (SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY ${Determinism.duckSeeded(s"ss:$Seed", "doc_id")}, doc_id) AS BIGINT) AS r
          FROM documents)
        SELECT rk.doc_id, rk.source, rk.r
        FROM rk JOIN a ON rk.source = a.source WHERE rk.r <= a.alloc""")),

    QueryDef("q99_sequence_packing",
      // token-budget SEQUENCE PACKING (the pretraining-loader step): docs
      // sharded by seeded hash, seeded-shuffled within the shard, packed
      // greedily into 128-token sequences via one running-sum window per
      // shard. Sequences never cross shards, so shard count = packing
      // parallelism (size it so a shard's token mass fits one task);
      // boundary waste is at most one sequence per shard.
      (s, dir) => Curation.packSequences(
        Tables.load(s, dir, "documents"), "doc_id", "text", 128L, 4, Seed),
      Some(s"""WITH d AS (SELECT doc_id,
          CAST(${TextFunctions.duckTokenCount("text")} AS BIGINT) AS n_tok,
          ${Determinism.duckSeeded(s"ps:$Seed", "doc_id")} % 4 AS shard
        FROM documents),
        w AS (SELECT doc_id, shard, n_tok,
          CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard
            ORDER BY ${Determinism.duckSeeded(s"pk:$Seed", "doc_id")}, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM d)
        SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tok,
          CAST(cum_before // 128 AS BIGINT) AS seq_id,
          CAST(cum_before % 128 AS BIGINT) AS seq_offset
        FROM w""")),

    QueryDef("q67_sequence_packing_split",
      // boundary-SPLITTING packing (T5/GPT loader semantics): documents
      // are cut at sequence boundaries, so every sequence in a shard is
      // exactly 128 tokens (zero padding waste; only the shard's tail
      // runs short). Each doc explodes into one row per sequence it
      // touches with the half-open token slice [tok_start, tok_end) that
      // lands there — segments are contiguous, sum to the doc's tokens,
      // and the whole layout is a pure function of (seed, doc_id).
      (s, dir) => Curation.packSequencesSplit(
        Tables.load(s, dir, "documents"), "doc_id", "text", 128L, 4, Seed),
      Some(s"""WITH d AS (SELECT doc_id,
          CAST(${TextFunctions.duckTokenCount("text")} AS BIGINT) AS n_tok,
          ${Determinism.duckSeeded(s"ps:$Seed", "doc_id")} % 4 AS shard
        FROM documents),
        w AS (SELECT doc_id, shard, n_tok,
          CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard
            ORDER BY ${Determinism.duckSeeded(s"pk:$Seed", "doc_id")}, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM d WHERE n_tok > 0),
        g AS (SELECT doc_id, shard, n_tok, cum_before,
          unnest(generate_series(cum_before // 128, (cum_before + n_tok - 1) // 128)) AS seq_id
        FROM w)
        SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(seq_id AS BIGINT) AS seq_id,
          CAST(GREATEST(seq_id * 128 - cum_before, 0) AS BIGINT) AS tok_start,
          CAST(LEAST((seq_id + 1) * 128 - cum_before, n_tok) AS BIGINT) AS tok_end
        FROM g"""))
  )
}
