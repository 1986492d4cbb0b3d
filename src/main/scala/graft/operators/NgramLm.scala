package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language-model-based quality scoring — the CCNet recipe (Wenzek et al.
  * 2020): train a small LM on an in-domain corpus, score every candidate
  * document by its cross-entropy under that model, and keep the
  * low-perplexity band. The reference pipeline has no LM gate (its corpora
  * are pre-curated); this is the standard published filter a 100 TB crawl
  * pipeline runs before sampling, expressed with an add-one-smoothed
  * bigram model instead of KenLM (no external model artifacts, fully
  * oracle-portable).
  *
  * Determinism: per-bigram costs are floored at e6 scale BEFORE summation
  * (`floor(1e6 · ln((ctx + V) / (c + 1)))` — a non-negative integer), so
  * document scores are exact longs and summation order cannot change them
  * — the same doctrine as the BM25 per-term e6 floor. The floor of a
  * transcendental is the one residual cross-engine hazard (a 1-ulp libm
  * divergence in `ln` flips the integer when 1e6·ln(r) sits within ~1e-9
  * of a boundary); it is shared with — and bounded exactly like — the
  * BM25 idf/tf floors that have hash-matched since round 4, because both
  * engines' `ln` are correctly-rounded to well under the e6 grid.
  *
  * Scale shape: the model is two aggregates over the in-domain corpus
  * (map-side-combined (w1,w2) and w1 counts — the model corpus is the
  * SMALL curated side, the crawl is the big one); scoring joins the
  * exploded candidate bigram stream against the broadcast model tables
  * (a trained bigram table is MBs — the KenLM-artifact analogue), so the
  * candidate scan shuffles nothing but its final per-doc aggregate.
  */
object NgramLm {

  /** Adjacent token pairs of a token-array column as `(w1, w2)` structs
    * (empty for arrays shorter than 2 — `sequence` would otherwise count
    * DOWN from 0 to -1 and index element 0). Tokens are projected by the
    * caller (no CSE inside lambdas). */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Train the add-one bigram model: returns (bigram counts `(w1, w2, c)`,
    * context counts `(w1, ctx)`, vocab size). Counts are exact longs. */
  def train(model: DataFrame, textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = model.select(TextFunctions.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bg = toks.select(explode(bigrams(col("t"))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("ctx"))
    val vocab = model.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    (bg, ctx, vocab)
  }

  /** DuckDB twin of [[train]] + the per-doc cost aggregation of [[score]]
    * as a CTE block (`bg`/`ctx`/`v`/`st`/`costs`/`lmagg`): `rel` must
    * expose `(doc_id, source, <tokCol>)`; the model trains on the rows
    * matching `inDomainPred`. Shared by the q107 unit oracle and the
    * q111 composed-pipeline oracle so the smoothing formula can never
    * drift between them. */
  def duckLmCtes(rel: String, tokCol: String, inDomainPred: String): String =
    s"""bg AS (SELECT $tokCol[i] AS w1, $tokCol[i+1] AS w2,
          CAST(count(*) AS BIGINT) AS c
        FROM $rel, unnest(range(1, len($tokCol))) AS r(i)
        WHERE $inDomainPred AND len($tokCol) >= 2 GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS ctx FROM bg GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest($tokCol) AS w FROM $rel WHERE $inDomainPred)),
      st AS (SELECT doc_id, $tokCol[i] AS w1, $tokCol[i+1] AS w2
        FROM $rel, unnest(range(1, len($tokCol))) AS r(i)
        WHERE len($tokCol) >= 2),
      costs AS (SELECT doc_id,
          CAST(floor(1000000.0 * ln(
            (coalesce(ctx.ctx, 0) + v.v) / (coalesce(bg.c, 0) + 1)))
            AS BIGINT) AS cost_e6
        FROM st LEFT JOIN ctx USING (w1) LEFT JOIN bg USING (w1, w2)
          CROSS JOIN v),
      lmagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(cost_e6) AS BIGINT) AS cost_e6
        FROM costs GROUP BY doc_id)"""

  /** Score candidate docs under the trained model: per-doc
    * `(doc_id, n_bigrams, cost_e6, avg_cost_e6)` where `cost_e6` sums the
    * per-bigram e6-floored negative log-likelihoods and `avg_cost_e6` is
    * the integer mean (the perplexity-rank surrogate — lower is more
    * in-domain). Unseen contexts cost `ln(V)`, unseen continuations
    * `ln(ctx + V)` — add-one smoothing over the model vocabulary. Docs
    * with fewer than 2 tokens score 0 over 0 bigrams (no evidence). */
  def score(candidates: DataFrame, idCol: String, textCol: String,
      bg: DataFrame, ctx: DataFrame, vocab: DataFrame): DataFrame = {
    val toksed = candidates.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val stream = toksed.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(bigrams(col("t"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(broadcast(ctx), Seq("w1"), "left")
      .join(broadcast(bg), Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(lit(1000000.0) * log(
          (coalesce(col("ctx"), lit(0L)) + col("v")).cast("double") /
            (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")))
          .cast("long").as("cost_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cost_e6")).as("cost_e6"))
    toksed.select(col("doc_id")).join(stream, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("cost_e6"), lit(0L)).as("cost_e6"))
      .withColumn("avg_cost_e6",
        when(col("n_bigrams") > 0, expr("cost_e6 div n_bigrams")).otherwise(lit(0L)))
  }
}
