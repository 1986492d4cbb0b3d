package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 postings with incremental refresh.
  *
  * The reference keeps per-(source, split) inverted indexes in memory and
  * REBUILDS them whenever a source refreshes (reference:
  * src/sampler/backends/bm25_backend.rs:42-47 index map, 60-118 rebuild).
  * Spark-first, the "index" is the `(doc_id, term, tf)` relation itself
  * ([[Bm25.termFrequencies]]) persisted as parquet: scoring restricts it to
  * the broadcast query vocabulary, so lookups are a bounded semi-join, not
  * a data structure walk.
  *
  * Why a persisted table instead of per-batch derivation (the
  * [[Sampler]] default): tokenize+aggregate is the dominant cost of a BM25
  * pass over a 100 TB corpus. Build once, refresh per landed shard
  * (`refresh` cost ∝ |new shard|, a plain union — no read-modify-write of
  * the standing postings, which stay immutable parquet), score many times.
  * `dl`, `df` and the corpus stats are all derived from the postings at
  * query time (cheap keyed aggregates over the restricted frame), so the
  * persisted state is ONE append-only relation — the same
  * build-once/append-forever shape as the span index (q109) and the
  * minhash index (q68).
  *
  * Determinism: [[scores]] delegates to the same scoring core as
  * [[Bm25.scores]], so a refreshed index scores bit-identically to a
  * from-scratch pass over the full corpus — q116's oracle checks exactly
  * that cross-engine (the DuckDB side scores the full corpus; the Spark
  * side scores base+refresh).
  */
case class Bm25Index(postings: DataFrame)

object Bm25Index {

  /** Build postings from scratch (one tokenization pass). */
  def build(docs: DataFrame, idCol: String, textCol: String): Bm25Index =
    Bm25Index(Bm25.termFrequencies(docs, idCol, textCol))

  /** Append a landed shard's postings: cost ∝ |newDocs|. Caller contract
    * (same as the reference's rebuild trigger): `newDocs` holds only docs
    * NOT already indexed — postings are keyed by (doc_id, term) and a
    * double-indexed doc would double its tf. */
  def refresh(idx: Bm25Index, newDocs: DataFrame, idCol: String,
      textCol: String): Bm25Index =
    Bm25Index(idx.postings.unionByName(Bm25.termFrequencies(newDocs, idCol, textCol)))

  /** Score literal queries from the index — bit-identical to
    * [[Bm25.scores]] over the same corpus. */
  def scores(spark: SparkSession, idx: Bm25Index,
      queries: Seq[(Int, String)]): DataFrame =
    Bm25.scoreFrom(spark, idx.postings, queries)

  /** Persist / reload. Postings are repartitioned by `term` on write so a
    * query-vocabulary restriction touches few files; at cluster scale the
    * same write would bucket by term (`bucketBy` via a table catalog). */
  def save(idx: Bm25Index, dir: String): Unit =
    idx.postings.repartition(col("term")).write.mode("overwrite").parquet(dir)

  def load(spark: SparkSession, dir: String): Bm25Index =
    Bm25Index(spark.read.parquet(dir))
}

/** Per-source postings + per-source corpus stats for the composed
  * sampler's pool — the cache the per-batch [[Sampler]] derivation
  * otherwise recomputes every batch (see `Sampler.bm25Lanes`). Built from
  * the pool's pre-tokenized `btoks`, so index-backed and per-batch scoring
  * are bit-identical (pinned by the golden bm25 config in SketchesSpec).
  *
  * `srcStats` counts ALL pool docs per source (including zero-token docs),
  * matching the per-batch derivation; it cannot be derived from postings
  * alone, hence the second frame.
  */
case class Bm25PoolIndex(postings: DataFrame, srcStats: DataFrame)

object Bm25PoolIndex {

  /** Derive both frames from a composed-sampler pool carrying
    * `(id, source, btoks)`. Callers persist/cache the result across
    * batches; on source refresh, rebuild (pool-sized, but off the batch
    * path) or union a per-shard delta like [[Bm25Index.refresh]]. */
  def fromPool(pool: DataFrame): Bm25PoolIndex = {
    val postings = pool
      .select(col("source"), col("id").as("cand"),
        size(col("btoks")).cast("long").as("dl"), explode(col("btoks")).as("term"))
      .groupBy(col("source"), col("cand"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val srcStats = pool.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("btoks"))).as("sum_dl"))
    Bm25PoolIndex(postings, srcStats)
  }
}
