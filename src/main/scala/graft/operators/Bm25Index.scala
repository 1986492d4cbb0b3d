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
  * The persisted state is TWO append-only relations — postings and the
  * per-doc lengths (`dl` covers all of a doc's terms, so it can never be
  * derived from a query-restricted frame; persisting it keeps the score
  * path free of corpus-wide aggregates). Both refresh by plain union —
  * the same build-once/append-forever shape as the span index (q109)
  * and the minhash index (q68). `df` and the corpus stats derive at
  * query time: df from the vocabulary-restricted postings, stats from a
  * map-side-combined aggregate over the #docs-sized lengths table.
  *
  * Determinism: [[scores]] delegates to the same scoring core as
  * [[Bm25.scores]], so a refreshed index scores bit-identically to a
  * from-scratch pass over the full corpus — q116's oracle checks exactly
  * that cross-engine (the DuckDB side scores the full corpus; the Spark
  * side scores base+refresh).
  */
case class Bm25Index(postings: DataFrame, docLens: DataFrame)

object Bm25Index {

  /** Build postings + doc lengths from scratch (one tokenization pass;
    * the lengths ride the same tf aggregate). */
  def build(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tf = Bm25.termFrequencies(docs, idCol, textCol)
    Bm25Index(tf, Bm25.docLengths(tf))
  }

  /** Append a landed shard's postings: cost ∝ |newDocs|. Caller contract
    * (same as the reference's rebuild trigger): `newDocs` holds only docs
    * NOT already indexed — postings are keyed by (doc_id, term) and a
    * double-indexed doc would double its tf. */
  def refresh(idx: Bm25Index, newDocs: DataFrame, idCol: String,
      textCol: String): Bm25Index = {
    val delta = build(newDocs, idCol, textCol)
    Bm25Index(idx.postings.unionByName(delta.postings),
      idx.docLens.unionByName(delta.docLens))
  }

  /** Score literal queries from the index — bit-identical to
    * [[Bm25.scores]] over the same corpus. */
  def scores(spark: SparkSession, idx: Bm25Index,
      queries: Seq[(Int, String)]): DataFrame =
    Bm25.scoreFrom(spark, idx.postings, idx.docLens, queries)

  /** Persist / reload. Postings are repartitioned by `term` on write so a
    * query-vocabulary restriction touches few files; at cluster scale the
    * same write would bucket by term (`bucketBy` via a table catalog).
    * Lengths are #docs rows alongside.
    *
    * Temp-then-publish (the SamplerState.save discipline): both relations
    * land in a `.tmp` sibling first and move into place together — two
    * sequential in-place overwrites could be interrupted between them,
    * leaving NEW postings with STALE lengths that `load` would accept and
    * score silently wrong. A torn publish here instead leaves the target
    * absent or the old generation intact — loud or consistent, never
    * mixed. */
  def save(idx: Bm25Index, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Staging.sweepStale(Paths.get(dir))
    val tmp = Paths.get(dir + ".tmp-" + ProcessHandle.current().pid())
    rmTree(tmp)
    idx.postings.repartition(col("term")).write.mode("overwrite")
      .parquet(s"$tmp/postings")
    idx.docLens.write.mode("overwrite").parquet(s"$tmp/doclens")
    rmTree(Paths.get(dir))
    Files.move(tmp, Paths.get(dir))
  }

  def load(spark: SparkSession, dir: String): Bm25Index =
    Bm25Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"))
}

/** Per-source postings + per-source corpus stats for the composed
  * sampler's pool — the cache the per-batch [[Sampler]] derivation
  * otherwise recomputes every batch (see `Sampler.bm25Lanes`). Built from
  * the pool's pre-tokenized `btoks`, so index-backed and per-batch scoring
  * are bit-identical (pinned in InvariantsSpec against the golden bm25
  * config).
  *
  * `srcStats` counts ALL pool docs per source (including zero-token docs),
  * matching the per-batch derivation; it cannot be derived from postings
  * alone, hence the second frame.
  *
  * `wterm` is the STAGED weighted-term table `(source, term, cand,
  * term_e6)` — [[Bm25PoolIndex.weightedTerms]] precomputed at build time.
  * term_e6 is a pure function of the pool (df window + idf/tf-part floor
  * arithmetic), so staging it moves the one remaining pool-scale shuffle
  * of the BM25 negative dispatch off the batch path entirely: a batch
  * reads the persisted table filtered to its anchor sources (parquet
  * row-group pruning) and scores. Present on every save/load round-trip;
  * None on hand-assembled pairs (the per-batch derivation fills it in). */
final class Bm25PoolIndex(postingsThunk: () => DataFrame,
    srcStatsThunk: () => DataFrame, wtermThunk: () => Option[DataFrame]) {
  // LAZY relations: reading a parquet relation costs a footer/schema job
  // at analysis time, and the staged-wterm serving path never touches
  // postings/srcStats — a loaded index only pays for the relations a
  // batch actually reads
  lazy val postings: DataFrame = postingsThunk()
  lazy val srcStats: DataFrame = srcStatsThunk()
  lazy val wterm: Option[DataFrame] = wtermThunk()
}

object Bm25PoolIndex {

  def apply(postings: DataFrame, srcStats: DataFrame,
      wterm: Option[DataFrame] = None): Bm25PoolIndex =
    new Bm25PoolIndex(() => postings, () => srcStats, () => wterm)

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
    Bm25PoolIndex(postings, srcStats, Some(weightedTerms(postings, srcStats)))
  }

  /** The weighted-term table `(source, term, cand, term_e6)` — THE
    * single definition of the composed BM25 backend's per-term score
    * (exact-integer e6 floor, graft.operators.Bm25 contract): df is a
    * keyed window over tf (one row per (cand, term) ⇒ the per-term count
    * IS the document frequency). Both the per-batch derivation and the
    * staged index build call this, so index-backed scoring cannot
    * silently diverge from the in-plan path. */
  def weightedTerms(postings: DataFrame, srcStats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    postings
      .withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("source"), col("term"))).cast("long"))
      .join(broadcast(srcStats), "source")
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("tfpart",
        (col("tf") * lit(Bm25.K1 + 1)) /
          (col("tf") + lit(Bm25.K1) * (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl"))))
      .select(col("source"), col("term"), col("cand"),
        floor(lit(1000000.0) * col("idf") * col("tfpart")).cast("long").as("term_e6"))
  }

  /** Persist / reload across sampler sessions — the long-lived
    * deployment's cache of the per-source tf table the composed bm25
    * backend otherwise re-derives every batch (Sampler.bm25Lanes
    * scaladoc). Postings repartition by (source, term) on write, the
    * keys every batch's scoring join restricts on; the staged wterm
    * table repartitions by source and sorts by (source, term) within
    * partitions so a batch's source filter prunes row groups. Same
    * torn-publish discipline as [[Bm25Index.save]]: all relations land
    * in a `.tmp` sibling and move into place as one unit — new postings
    * with stale per-source stats would score silently wrong. */
  def save(idx: Bm25PoolIndex, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Staging.sweepStale(Paths.get(dir))
    val tmp = Paths.get(dir + ".tmp-" + ProcessHandle.current().pid())
    rmTree(tmp)
    idx.postings.repartition(col("source"), col("term")).write.mode("overwrite")
      .parquet(s"$tmp/postings")
    idx.srcStats.write.mode("overwrite").parquet(s"$tmp/srcstats")
    idx.wterm.getOrElse(weightedTerms(idx.postings, idx.srcStats))
      .repartition(col("source")).sortWithinPartitions(col("source"), col("term"))
      .write.mode("overwrite").parquet(s"$tmp/wterm")
    rmTree(Paths.get(dir))
    Files.move(tmp, Paths.get(dir))
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Bm25PoolIndex = {
    import java.nio.file.{Files, Paths}
    // each relation loads on FIRST USE (parquet footer read deferred):
    // the staged-wterm serving path never opens postings/srcstats.
    // wterm absent only on pre-staging generations — the per-batch
    // derivation fills it in (values identical; just not staged)
    new Bm25PoolIndex(
      () => spark.read.parquet(s"$dir/postings"),
      () => spark.read.parquet(s"$dir/srcstats"),
      () => if (Files.exists(Paths.get(s"$dir/wterm")))
        Some(spark.read.parquet(s"$dir/wterm")) else None)
  }
}
