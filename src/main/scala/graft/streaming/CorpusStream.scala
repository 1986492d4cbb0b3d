package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.Determinism
import graft.functions.TextFunctions
import graft.operators.{Bm25Index, Dedup}

/** Continuous corpus intake — the Structured-Streaming composition of the
  * incremental curation operators (reference: the ingestion refresh loop,
  * src/ingestion.rs:462-506, grown to the corpus-maintenance pipeline a
  * 100 TB deployment runs on arrival, not nightly).
  *
  * Each micro-batch of documents is
  *   1. EXACT-deduped: the standing corpus wins over an arrival by
  *      doc_id first (records are immutable by contract — a known id is
  *      a re-send even when its text mutated in transit), then by
  *      content hash, with min-doc_id-per-hash inside the batch (q20
  *      semantics) — the reference's standing-pool-first contract;
  *   2. NEAR-dup checked with the incremental MinHash band index
  *      ([[Dedup.incrementalCandidatePairs]], the q68 shape): candidate
  *      cost ∝ |batch| × in-bucket collisions, never |corpus|²; candidates
  *      verify by signature agreement ≥ `minAgree` of `numPerms`; a new
  *      doc that verifies against a RETAINED doc drops, and new–new
  *      clusters resolve keep-min through
  *      [[Dedup.connectedComponents]] (q93's operator);
  *   3. appended: survivors land in batch-keyed stores (`corpus/b<id>`,
  *      `hashes/b<id>`, `sigs/b<id>`) and the persisted BM25 index grows
  *      by the batch's postings delta (`bm25/b<id>` — the
  *      [[Bm25Index.refresh]] union law made durable: the index IS the
  *      union of per-batch deltas).
  *
  * Exactly-once without a commit log: every per-batch store is written
  * with `overwrite` to a path keyed by the micro-batch id, and the batch
  * transition is a pure function of (STRICTLY-PRIOR stores, batch rows)
  * — the batch's own subdirectories are excluded from the standing
  * reads, so a replay after a partial publish recomputes byte-identical
  * frames into the same paths and heals whatever the crash skipped.
  * No meta file can get out of sync because there is none.
  *
  * Blank documents (no tokens) produce no signature rows (the
  * [[Dedup.minhashSignatures]] contract) and therefore skip the near-dup
  * stage; identical blanks still collapse through the exact lane.
  *
  * Scale shape: the only corpus-sized frames touched per batch are the
  * NARROW hash/signature stores (one long, resp. `numPerms` longs per
  * doc); corpus text is write-only. The band self-join is driven by the
  * new side, verified pairs are batch-bounded, and the component loop
  * runs on the edge-induced subgraph ([[Dedup.connectedComponents]]
  * scaladoc).
  */
object CorpusStream {

  /** @param numPerms    MinHash permutations per signature
    * @param shingleSize shingle width (tokens)
    * @param numBands    LSH bands (numBands × rowsPerBand == numPerms)
    * @param rowsPerBand rows per band
    * @param minAgree    verified near-dup = signatures agree on ≥ this
    *                    many of the `numPerms` permutations */
  case class IntakeConfig(
      numPerms: Int = 8,
      shingleSize: Int = 3,
      numBands: Int = 4,
      rowsPerBand: Int = 2,
      minAgree: Int = 6) {
    require(numBands * rowsPerBand == numPerms,
      s"bands ($numBands) x rows ($rowsPerBand) must equal perms ($numPerms)")
    require(minAgree >= 1 && minAgree <= numPerms,
      s"minAgree must be in [1, $numPerms]")
  }

  private def hashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("content_hash", LongType)))
  private def sigSchema(cfg: IntakeConfig) = StructType(
    StructField("doc_id", LongType) +:
      (0 until cfg.numPerms).map(j => StructField(s"mh$j", LongType)))

  /** Existing per-batch store subdirs under `root` (absent root → none).
    * `exclude` drops that batch's own subdir: a crash-REPLAY of batch b
    * must never see b's own partially-published stores as "standing"
    * state — with them visible, the replay's arrivals would drop against
    * their own hashes, survivors would come out empty, and any store the
    * crash skipped (e.g. the BM25 delta) would silently stay missing. */
  private def batchDirs(root: String, exclude: Option[Long] = None): Seq[String] = {
    val d = new java.io.File(root)
    val skip = exclude.map(b => s"b$b")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b") &&
        !skip.contains(f.getName))
      .map(_.getPath).toSeq.sorted
  }

  private def readStore(spark: SparkSession, root: String,
      schema: StructType, exclude: Option[Long]): DataFrame = {
    val dirs = batchDirs(root, exclude)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** The standing corpus (union of survivor batches); None before any
    * batch has landed. */
  def corpus(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val dirs = batchDirs(s"$stateDir/corpus")
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** The persisted BM25 index: the union of per-batch postings deltas —
    * bit-identical to [[Bm25Index.build]] over [[corpus]] (the refresh
    * law, pinned in CorpusStreamSpec). */
  def index(spark: SparkSession, stateDir: String): Option[Bm25Index] = {
    val dirs = batchDirs(s"$stateDir/bm25")
    if (dirs.isEmpty) None
    else Some(Bm25Index(
      spark.read.parquet(dirs.map(_ + "/postings"): _*),
      spark.read.parquet(dirs.map(_ + "/doclens"): _*)))
  }

  /** One micro-batch transition — a pure function of (stores, batch),
    * idempotent on replay (overwrite into batch-keyed paths). Returns the
    * survivor count (diagnostic). `batch` must carry `doc_id` (long) and
    * `textCol`; passthrough columns persist into the corpus store. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, cfg: IntakeConfig = IntakeConfig(),
      textCol: String = "text"): Long = {
    val prevHashes = readStore(spark, s"$stateDir/hashes", hashSchema, Some(batchId))
    val prevSigs = readStore(spark, s"$stateDir/sigs", sigSchema(cfg), Some(batchId))

    // 1. exact lane (q20 semantics): min doc_id per content hash within
    // the batch, then the standing corpus wins over arrivals — by
    // doc_id FIRST (records are immutable by contract, so a known id is
    // a re-send even when its text mutated in transit; admitting it
    // would duplicate the id in the store), then by content hash
    val hashed = batch.withColumn("content_hash",
      Determinism.portableHash(TextFunctions.normalizeWs(col(textCol))))
    val wH = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val exact = hashed
      .join(prevHashes.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("rk", row_number().over(wH)).filter(col("rk") === 1).drop("rk")
      .join(prevHashes.select(col("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
      .localCheckpoint(eager = false)

    // 2. near-dup lane: incremental candidates (new side drives the band
    // join), verified by signature agreement
    val newSigs = Dedup.minhashSignatures(
        exact, "doc_id", textCol, cfg.numPerms, cfg.shingleSize)
      .localCheckpoint(eager = false)
    val allSigs = prevSigs.withColumn("is_new", lit(false))
      .unionByName(newSigs.withColumn("is_new", lit(true)))
    val cand = Dedup.incrementalCandidatePairs(
      allSigs, "doc_id", "is_new", cfg.numBands, cfg.rowsPerBand)
    val mhCols = (0 until cfg.numPerms).map(j => s"mh$j")
    val sigsAll = allSigs.drop("is_new")
    val sa = col("doc_id").as("aid") +: mhCols.map(c => col(c).as(s"a_$c"))
    val sb = col("doc_id").as("bid") +: mhCols.map(c => col(c).as(s"b_$c"))
    val agree = mhCols.map(c =>
      when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L)).reduce(_ + _)
    val verified = cand
      .join(sigsAll.select(sa: _*), col("a") === col("aid"))
      .join(sigsAll.select(sb: _*), col("b") === col("bid"))
      .filter(agree >= cfg.minAgree)
      .select(col("a"), col("b"))
      .localCheckpoint(eager = false)
    val newIds = newSigs.select(col("doc_id"))
    // pairs with exactly one new endpoint → that endpoint drops (the
    // standing corpus wins); both-new pairs resolve keep-min below
    val aNew = verified.join(newIds.withColumnRenamed("doc_id", "a"), Seq("a"),
      "left_semi").select(col("a"), col("b"))
    val abNew = aNew.join(newIds.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
    val aOnlyNew = aNew.join(abNew, Seq("a", "b"), "left_anti").select(col("a").as("did"))
    val bNewOnly = verified
      .join(newIds.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
      .join(newIds.withColumnRenamed("doc_id", "a"), Seq("a"), "left_anti")
      .select(col("b").as("did"))
    val dropVsOld = aOnlyNew.unionByName(bNewOnly).distinct()
    val keptVsOld = exact.join(dropVsOld.withColumnRenamed("did", "doc_id"),
      Seq("doc_id"), "left_anti")
    // new–new clusters among the docs still standing: keep min per
    // component (a dropped-vs-old doc cannot justify dropping its
    // neighbors, so edges filter to kept endpoints first)
    val keptIds = keptVsOld.select(col("doc_id"))
    val nnEdges = abNew
      .join(keptIds.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .join(keptIds.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
    val comps = Dedup.connectedComponents(
      keptIds.withColumnRenamed("doc_id", "id"), nnEdges)
    val dropNn = comps.filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
    val survivors = keptVsOld.join(dropNn, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)

    // 3. publish: batch-keyed overwrites (idempotent replays), BM25 delta
    // per the refresh union law. A survivor-less batch writes nothing —
    // a replay recomputes the same empty set and skips identically, and
    // the store readers never meet a schema-less empty directory.
    val n = survivors.count()
    if (n > 0) {
      val b = s"b$batchId"
      survivors.drop("content_hash").write.mode("overwrite")
        .parquet(s"$stateDir/corpus/$b")
      survivors.select(col("doc_id"), col("content_hash")).write.mode("overwrite")
        .parquet(s"$stateDir/hashes/$b")
      newSigs.join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$stateDir/sigs/$b")
      val delta = Bm25Index.build(survivors, "doc_id", textCol)
      delta.postings.write.mode("overwrite").parquet(s"$stateDir/bm25/$b/postings")
      delta.docLens.write.mode("overwrite").parquet(s"$stateDir/bm25/$b/doclens")
    }
    n
  }

  /** The streaming wrapper: a file-source stream over `sourceDir` driving
    * [[applyBatch]] per micro-batch. `maxFilesPerTrigger = 1` keeps each
    * landed shard its own batch (the reference's shard-arrival grain). */
  def intake(spark: SparkSession, sourceDir: String, schema: StructType,
      stateDir: String, cfg: IntakeConfig = IntakeConfig(),
      textCol: String = "text"): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/checkpoint")
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(spark, b, id, stateDir, cfg, textCol); ()
      }
      .start()
}
