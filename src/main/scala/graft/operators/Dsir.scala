package graft.operators

import graft.core.Determinism
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * the named method behind domain-targeted pretraining subsets): score
  * every raw document by the log importance weight of a hashed
  * bag-of-n-grams generative model, log w(x) = Σ_f c_f(x)·(ln p̂_f −
  * ln q̂_f) with p̂ estimated on a TARGET sample and q̂ on the RAW
  * corpus over B hashed unigram+bigram buckets (paper §3), then
  * resample without replacement via Gumbel top-k (key = log w + G, the
  * exactly-equivalent streaming form of weighted sampling).
  *
  * Exactness doctrine: every per-bucket log ratio is floored at e6
  * scale BEFORE summation (the NgramLm/BM25 contract — integer sums
  * are order-independent), the Gumbel noise derives from the portable
  * hash, and both engines evaluate the SAME double expression shape
  * (products and divisions of exact-integer-valued doubles, one
  * correctly-rounded ln) — so DuckDB replays the scores bit-for-bit.
  *
  * Scale shape: features are one narrow explode (map-side), the two
  * count tables are B-row aggregates (map-side combined), the ratio
  * table is a B-row broadcast, and the per-doc score is one keyed
  * aggregation — nothing all-pairs, nothing corpus-scale on the
  * driver. The final global rank is demonstration-sized here; at
  * 100 TB the same key feeds an orderBy-limit top-k or a quantile
  * threshold instead of a full window.
  */
object Dsir {

  /** Hashed unigram+bigram bucket stream, one row per OCCURRENCE:
    * (doc_id, b). Tokens are projected as a column before the lambda
    * (the Generate barrier — no re-tokenize per lambda site). */
  def hashedFeatures(docs: DataFrame, textCol: Column, buckets: Int): DataFrame = {
    val bigrams = when(size(col("t")) >= 2,
      transform(sequence(lit(1), size(col("t")) - 1),
        i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1))))
      .otherwise(array().cast("array<string>"))
    docs.withColumn("t", TextFunctions.tokens(textCol))
      .select(col("doc_id"), explode(concat(col("t"), bigrams)).as("gram"))
      .select(col("doc_id"),
        pmod(Determinism.seeded("dsirf", col("gram")), lit(buckets.toLong)).as("b"))
  }

  /** The B-row broadcast ratio table: (b, r_e6) with r_e6 =
    * floor(1e6·ln(((ct+1)(tq+B)) / ((cq+1)(tt+B)))) — add-1-smoothed
    * target/raw bucket frequencies, one e6 floor per bucket. ONE pass
    * over the feature stream (raw + target counts in the same
    * aggregation); totals come off the B-row table (a tiny collect). */
  def logRatioTable(feat: DataFrame, isTarget: Column, buckets: Int): DataFrame = {
    val cnts = feat.groupBy(col("b")).agg(
      count(lit(1)).cast("long").as("cq"),
      count(when(isTarget, 1)).cast("long").as("ct"))
      .localCheckpoint(eager = false)
    val tot = cnts.agg(sum(col("cq")).cast("long"), sum(col("ct")).cast("long"))
      .collect()(0)
    // empty feature stream (all-blank corpus slice): sum() is NULL — treat
    // as 0 so the table is empty rather than the driver throwing (the
    // query layer's refuse-don't-throw posture)
    val tq = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val tt = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    cnts.select(col("b"), floor(lit(1000000.0) * log(
      ((col("ct") + 1).cast("double") * lit(tq + buckets.toDouble)) /
        ((col("cq") + 1).cast("double") * lit(tt + buckets.toDouble))))
      .cast("long").as("r_e6"))
  }

  /** Gumbel key noise for doc `id`: floor(1e6·(−ln(−ln u))) with u the
    * portable-hash unit draw — the Gumbel top-k resampling form. */
  def gumbelE6(id: Column): Column =
    floor(lit(1000000.0) *
      -log(-log((Determinism.seeded("dsirg", id) + lit(0.5)) /
        lit(Determinism.HashSpace.toDouble)))).cast("long")

  // -------------------------------------------------------------------
  // DuckDB twins (oracle fragments mirror the expressions above)
  // -------------------------------------------------------------------

  /** CTE chain from a tokenized relation `t(doc_id, toks)` to
    * `dsirscore(doc_id, logw_e6)` (docs with no grams are absent —
    * callers left-join and coalesce 0). `targetWhere` filters feature
    * rows to the target sample. */
  def duckScoreCtes(buckets: Int, targetWhere: String): String = {
    val h = Determinism.duckSeeded("dsirf", "gram")
    s"""dsirg0 AS (
        SELECT doc_id, unnest(toks) AS gram FROM t
        UNION ALL
        SELECT doc_id, list_aggregate(list_slice(toks, i, i + 1), 'string_agg', ' ') AS gram
        FROM t, unnest(range(1, len(toks))) AS r(i)
        WHERE len(toks) >= 2
      ), dsirf AS MATERIALIZED (
        SELECT doc_id, $h % $buckets AS b FROM dsirg0
      ), dsircnt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS cq,
          CAST(count(*) FILTER (WHERE $targetWhere) AS BIGINT) AS ct
        FROM dsirf GROUP BY b
      ), dsirtot AS (
        SELECT CAST(sum(cq) AS BIGINT) AS tq, CAST(sum(ct) AS BIGINT) AS tt
        FROM dsircnt
      ), dsirr AS (
        SELECT c.b,
          CAST(floor(1000000.0 * ln(
            (CAST(c.ct + 1 AS DOUBLE) * (tot.tq + $buckets.0)) /
            (CAST(c.cq + 1 AS DOUBLE) * (tot.tt + $buckets.0)))) AS BIGINT) AS r_e6
        FROM dsircnt c, dsirtot tot
      ), dsirscore AS (
        SELECT f.doc_id, CAST(sum(r.r_e6) AS BIGINT) AS logw_e6
        FROM dsirf f JOIN dsirr r USING (b) GROUP BY f.doc_id
      )"""
  }

  /** Duck twin of [[gumbelE6]]. */
  def duckGumbelE6(idExpr: String): String =
    s"CAST(floor(1000000.0 * -ln(-ln((${Determinism.duckSeeded("dsirg", idExpr)} + 0.5) / " +
      s"${Determinism.HashSpace}.0))) AS BIGINT)"
}
