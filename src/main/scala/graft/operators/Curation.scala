package graft.operators

import graft.core.Determinism
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingestion and sampling: benchmark decontamination, repetition-based
  * quality gates, and token-budget sequence packing.
  *
  * None of these exist in the reference (its pipeline starts from already
  * curated corpora); they are the standard published recipes (n-gram
  * overlap decontamination as in GPT-3 appendix C / PaLM; repetition gates
  * as in Gopher's quality rules; greedy sequence packing as in T5/LLM
  * pretraining loaders) re-expressed as deterministic, oracle-portable
  * Spark plans on the [[Dedup]] / [[TextFunctions]] primitives.
  *
  * Scale doctrine, per operator:
  *   - decontamination joins shingle HASHES (longs), never text, and
  *     broadcasts the eval side — benchmark suites are MBs while the train
  *     corpus is the 100 TB side, so the scan stays shuffle-free for the
  *     big input;
  *   - repetition stats are two map-side-combinable keyed aggregations
  *     (doc,gram) → doc; no self-joins, no windows;
  *   - packing parallelism is the shard count: sequences never cross
  *     shards, so each shard packs independently under one window. Shard
  *     count is a knob — size it so a shard's token mass fits one task
  *     (corpus_tokens / shards ≈ 10⁸ is comfortable); boundary waste is
  *     at most one sequence per shard.
  */
object Curation {

  /** Train/eval n-gram overlap scan (benchmark decontamination).
    *
    * A train doc is contaminated when it shares at least one token
    * `k`-gram with any eval doc. Both sides are reduced to distinct
    * (doc, shingle-hash) pairs — the join carries longs only; the eval
    * side is broadcast (see scale doctrine above). Zero-token docs are
    * excluded from matching on BOTH sides (the shingle whole-text
    * fallback would otherwise hash "" and make any empty eval doc mark
    * every empty train doc contaminated). Emits EVERY train doc —
    * including zero-token ones, as uncontaminated:
    * `(doc_id, n_shared, n_eval_docs, contaminated)` so `contaminated = 0`
    * is directly the post-decontamination keep-list.
    */
  def contaminationScan(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    def shingleRows(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as), TextFunctions.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col(as), explode(Dedup.shingleHashes(
          Dedup.shingles(col("toks"), k))).as("h"))
        .distinct()
    val hits = shingleRows(train, "tid")
      .join(broadcast(shingleRows(evalSet, "eid")), "h")
      .groupBy(col("tid"))
      .agg(countDistinct(col("h")).as("n_shared"),
        countDistinct(col("eid")).as("n_eval_docs"))
    train.select(col(idCol).as("doc_id"))
      .join(hits, col("doc_id") === col("tid"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"),
        when(col("n_shared").isNotNull, 1L).otherwise(0L).as("contaminated"))
  }

  // Gopher-style repetition gate defaults: a doc is flagged when one token
  // exceeds 20% of the text or over 30% of its trigrams are repeats.
  val TopTokMaxE6 = 200000L
  val DupTrigramMaxE6 = 300000L
  // Gopher applies the ratio gates alongside a minimum-length gate; without
  // one, any doc of <= 4 all-distinct tokens trips the 20% top-token share
  // (1/4 = 250000 e6). Docs below this token count are never flagged —
  // at 5+, an all-distinct doc sits exactly at (not over) the threshold.
  val MinRepToks = 5L

  /** Per-doc repetition profile: share of the most frequent token
    * (`top_tok_e6`), share of the most frequent token bigram
    * (`top_bigram_e6`), duplicate-trigram fraction (`dup_trigram_e6`),
    * and the composite `repetitive` flag (gated on [[MinRepToks]] — very
    * short docs report their ratios but are never flagged). All ratios are
    * e6-scaled exact integers ([[TextAnalysis.ratioE6]]); zero-token docs
    * report zeros.
    *
    * Shape: one explode over the three gram kinds → (doc, kind, gram)
    * counts → (doc, kind) maxima → per-doc pivot by conditional agg. Both
    * aggregations combine map-side; nothing is quadratic in doc length.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = base.filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(array(
        struct(lit("u").as("kind"), col("toks").as("gs")),
        struct(lit("b").as("kind"), Dedup.shingles(col("toks"), 2).as("gs")),
        struct(lit("t").as("kind"), Dedup.shingles(col("toks"), 3).as("gs")))).as("e"))
      .select(col("doc_id"), col("e.kind").as("kind"), explode(col("e.gs")).as("g"))
    val stats = grams
      .groupBy(col("doc_id"), col("kind"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("kind"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"), count(lit(1)).as("nd"))
    def forKind(kind: String, c: org.apache.spark.sql.Column) =
      max(when(col("kind") === kind, c))
    val wide = stats.groupBy(col("doc_id")).agg(
      forKind("u", col("mx")).as("u_mx"), forKind("u", col("tot")).as("u_tot"),
      forKind("b", col("mx")).as("b_mx"), forKind("b", col("tot")).as("b_tot"),
      forKind("t", col("nd")).as("t_nd"), forKind("t", col("tot")).as("t_tot"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"))
      .join(wide, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        TextAnalysis.ratioE6(coalesce(col("u_mx"), lit(0L)),
          coalesce(col("u_tot"), lit(0L))).as("top_tok_e6"),
        TextAnalysis.ratioE6(coalesce(col("b_mx"), lit(0L)),
          coalesce(col("b_tot"), lit(0L))).as("top_bigram_e6"),
        TextAnalysis.ratioE6(
          coalesce(col("t_tot"), lit(0L)) - coalesce(col("t_nd"), lit(0L)),
          coalesce(col("t_tot"), lit(0L))).as("dup_trigram_e6"))
      .withColumn("repetitive",
        when(col("n_tok") >= MinRepToks &&
          (col("top_tok_e6") > TopTokMaxE6 ||
            col("dup_trigram_e6") > DupTrigramMaxE6), 1L).otherwise(0L))
  }

  /** Greedy token-budget sequence packing (the pretraining-loader step that
    * concatenates docs into fixed-size training sequences).
    *
    * Docs are sharded by a seeded hash, ordered within the shard by a
    * second seeded hash (deterministic global shuffle — no length or
    * source bias inside a sequence), then packed greedily: a doc starts at
    * the running token offset `cum_before`, its sequence is
    * `cum_before div budget`. A sequence may spill past the budget by less
    * than its last doc's length (standard streaming-packer semantics; the
    * trainer truncates or wraps the tail). Emits
    * `(doc_id, shard, n_tok, seq_id, seq_offset)` — `(shard, seq_id)` is
    * the training sequence key.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int,
      seed: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(Determinism.seeded(s"pk:$seed", col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("shard",
        pmod(Determinism.seeded(s"ps:$seed", col("doc_id")), lit(shards.toLong)))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        expr(s"cum_before div $budget").as("seq_id"),
        pmod(col("cum_before"), lit(budget)).as("seq_offset"))
  }

  /** Boundary-splitting variant of [[packSequences]] — the T5/GPT loader
    * semantics where documents are CUT at sequence boundaries instead of
    * spilling: every sequence in a shard holds exactly `budget` tokens
    * (only the shard's last sequence runs short), zero padding waste.
    *
    * Same shard/order/running-sum skeleton; each doc then explodes into
    * one row per sequence it touches (`sequence(seq0, seq1)` — a doc
    * longer than the budget spans several), carrying the half-open token
    * slice `[tok_start, tok_end)` of the doc that lands in that sequence.
    * Segments of a doc are contiguous and sum to its token count, so the
    * trainer reassembles or truncates locally; nothing about the split
    * depends on partitioning.
    */
  def packSequencesSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int,
      seed: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(Determinism.seeded(s"pk:$seed", col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("shard",
        pmod(Determinism.seeded(s"ps:$seed", col("doc_id")), lit(shards.toLong)))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        expr(s"cum_before div $budget"),
        expr(s"(cum_before + n_tok - 1) div $budget"))))
      .select(col("doc_id"), col("shard"), col("seq_id"),
        greatest(col("seq_id") * budget - col("cum_before"), lit(0L)).as("tok_start"),
        least((col("seq_id") + 1) * budget - col("cum_before"), col("n_tok")).as("tok_end"))
  }
}
