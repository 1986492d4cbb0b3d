package graft.ml

import graft.core.{Splits, SplitRatios}
import graft.functions.TextFunctions
import graft.operators.{TripletConfig, Triplets}
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MLlib-style pipeline stages (the BASELINE.json-stated approach): each
  * engine operator is also available as an `org.apache.spark.ml.Transformer`
  * so corpus → split → stats → triplets composes as a standard
  * `Pipeline().setStages(...)` and interoperates with MLlib tooling.
  *
  * The transformers are thin declarative wrappers over the operator kit —
  * they add no execution logic of their own, so everything stays one
  * Catalyst plan per stage.
  */
abstract class GraftTransformer(prefix: String) extends Transformer {
  override val uid: String = Identifiable.randomUID(prefix)
  override def copy(extra: ParamMap): Transformer = this
}

/** Adds the deterministic `split` column (train/validation/test). */
class SplitAssigner(
    idCol: String = "doc_id",
    seed: String = "42",
    ratios: SplitRatios = SplitRatios.Default) extends GraftTransformer("split_assigner") {

  override def transform(df: Dataset[_]): DataFrame =
    df.withColumn("split", Splits.splitCol(col(idCol), seed, ratios))

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("split", StringType, nullable = false))
}

/** Adds structural text statistics used by quality filtering. */
class TextStats(textCol: String = "text") extends GraftTransformer("text_stats") {

  override def transform(df: Dataset[_]): DataFrame =
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("n_alpha", TextFunctions.alphaCount(col(textCol)).cast("long"))
      .withColumn("digit_ratio", TextFunctions.digitRatio(col(textCol)))

  override def transformSchema(schema: StructType): StructType =
    schema.add("n_tokens", LongType).add("n_alpha", LongType)
      .add("digit_ratio", DoubleType)
}

/** Quality gate: drops rows outside the token/digit budget. */
class QualityFilter(
    minTokens: Int = 12,
    maxDigitRatio: Double = 0.35) extends GraftTransformer("quality_filter") {

  override def transform(df: Dataset[_]): DataFrame =
    df.toDF().filter(col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio)

  override def transformSchema(schema: StructType): StructType = schema
}

/** Which negative lane the sampler stage runs — every strategy the engine
  * implements is reachable from the MLlib facade. */
sealed trait SamplerLane
object SamplerLane {
  /** Plain WrongArticle rank-pick (q80). */
  case object WrongArticle extends SamplerLane
  /** WrongArticle + two-level cross-source fallback (q83). */
  case object WithFallback extends SamplerLane
  /** BM25 hard negatives, top-3 rotation + random fallback (q85). */
  case class Bm25(recipeName: String = "bm25_wrong_article") extends SamplerLane
  /** Date-preference staging: same-date → any-date → cross-source (q86). */
  case class DatePreferred(dateExpr: org.apache.spark.sql.Column) extends SamplerLane
  /** WrongPublicationDate two-level date-group pick (q84). */
  case class WrongDate(dateExpr: org.apache.spark.sql.Column,
      recipeName: String = "wrong_publication_date") extends SamplerLane
  /** negativeSelector = RoleAnchor: negative is the wrong record's anchor
    * section (q91). */
  case class NegativeAnchor(recipeName: String = "anchor_anchor_wrong_article") extends SamplerLane
  /** Decorate-in-build: all three chunks through the KVP prefix sampler,
    * swap + rejection on decorated texts (q90). */
  case class Decorated(sampler: graft.functions.KvpPrefixSampler,
      recipeName: String = "decorated_wrong_article") extends SamplerLane
}

/** Terminal stage: the corpus (doc_id, source, text) becomes triplet rows.
  * The `lane` selects the negative strategy; lanes that mark their stage
  * append a `lane` column. */
class TripletSamplerStage(
    cfg: TripletConfig = TripletConfig(),
    lane: SamplerLane = SamplerLane.WrongArticle)
    extends GraftTransformer("triplet_sampler") {

  override def transform(df: Dataset[_]): DataFrame = lane match {
    case SamplerLane.WrongArticle => Triplets.tripletRows(df.toDF(), cfg)
    case SamplerLane.WithFallback => Triplets.tripletRowsWithFallback(df.toDF(), cfg)
    case SamplerLane.Bm25(name) => Triplets.tripletRowsBm25(df.toDF(), cfg, name)
    case SamplerLane.DatePreferred(d) => Triplets.tripletRowsDatePreferred(df.toDF(), cfg, d)
    case SamplerLane.WrongDate(d, name) => Triplets.tripletRowsWrongDate(df.toDF(), cfg, d, name)
    case SamplerLane.NegativeAnchor(name) => Triplets.tripletRowsNegAnchor(df.toDF(), cfg, name)
    case SamplerLane.Decorated(sm, name) => Triplets.tripletRowsDecorated(df.toDF(), cfg, sm, name)
  }

  override def transformSchema(schema: StructType): StructType = {
    val base = StructType(Seq(
      StructField("aid", LongType), StructField("nid", LongType),
      StructField("split", StringType), StructField("recipe", StringType),
      StructField("a_hash", LongType), StructField("p_hash", LongType),
      StructField("n_hash", LongType), StructField("swapped", BooleanType),
      StructField("pidx", LongType), StructField("nidx", LongType),
      StructField("weight_e6", LongType)))
    lane match {
      case SamplerLane.Bm25(_) | SamplerLane.DatePreferred(_) =>
        base.add(StructField("lane", StringType, nullable = false))
      case SamplerLane.Decorated(_, _) =>
        // decorated rows drop the chunk indices and carry per-slot flags
        // inserted before 'swapped' (mirroring the tripletRowsDecorated
        // select). DERIVED from `base` so a column change to the shared
        // lanes cannot silently diverge from a literal copy here.
        val kept = base.fields.filterNot(f => f.name == "pidx" || f.name == "nidx")
        val (pre, post) = kept.span(_.name != "swapped")
        val flags = Seq("a_dec", "p_dec", "n_dec").map(StructField(_, BooleanType))
        StructType(pre.toSeq ++ flags ++ post.toSeq)
      case _ => base
    }
  }
}

/** Drops docs whose duplicated-substring coverage (exact 15-token-span
  * dedup, [[graft.operators.Curation.duplicateSpanProfile]]) reaches
  * `maxDupE6`. Schema unchanged — a pure filter stage. */
class SubstringDedupFilter(
    idCol: String = "doc_id",
    textCol: String = "text",
    width: Int = 15,
    maxDupE6: Long = 200000L) extends GraftTransformer("substring_dedup") {

  override def transform(df: Dataset[_]): DataFrame = {
    val keep = graft.operators.Curation
      .duplicateSpanProfile(df.toDF(), idCol, textCol, width, maxDupE6)
      .filter(col("keep") === 1L).select(col("doc_id").as(idCol))
    df.toDF().join(keep, Seq(idCol), "left_semi")
  }

  override def transformSchema(schema: StructType): StructType = schema
}

/** Drops docs sharing any token `k`-gram with the eval suite
  * ([[graft.operators.Curation.contaminationScan]] — the eval side is
  * broadcast; the train scan never shuffles). */
class DecontaminationFilter(
    evalSet: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text",
    k: Int = 4) extends GraftTransformer("decontamination") {

  override def transform(df: Dataset[_]): DataFrame = {
    val keep = graft.operators.Curation
      .contaminationScan(df.toDF(), evalSet, idCol, textCol, k)
      .filter(col("contaminated") === 0L).select(col("doc_id").as(idCol))
    df.toDF().join(keep, Seq(idCol), "left_semi")
  }

  override def transformSchema(schema: StructType): StructType = schema
}

/** Keeps the best-quality token-budget prefix
  * ([[graft.operators.Curation.budgetSelection]], `fracE6` of the corpus
  * tokens) — the terminal downselection stage of a curation pipeline. */
class BudgetSelector(
    idCol: String = "doc_id",
    textCol: String = "text",
    fracE6: Long = 300000L) extends GraftTransformer("budget_selector") {

  override def transform(df: Dataset[_]): DataFrame = {
    val keep = graft.operators.Curation
      .budgetSelection(df.toDF(), idCol, textCol, fracE6)
      .filter(col("kept") === 1L).select(col("doc_id").as(idCol))
    df.toDF().join(keep, Seq(idCol), "left_semi")
  }

  override def transformSchema(schema: StructType): StructType = schema
}

/** Which subword scheme a [[SubwordTokenizerEstimator]] trains — all
  * three production tokenizers are reachable from the MLlib facade. */
sealed trait SubwordScheme
object SubwordScheme {
  /** Greedy merge rules ([[graft.operators.Bpe]]). */
  case object Bpe extends SubwordScheme
  /** Longest-match-first with `##` continuations
    * ([[graft.operators.WordPiece]]). */
  case object WordPiece extends SubwordScheme
  /** Viterbi-optimal under unigram ln-costs
    * ([[graft.operators.Unigram]]). */
  case object Unigram extends SubwordScheme

  /** Soft-EM Unigram (full SentencePiece EM + likelihood-loss pruning);
    * decode contract identical to [[Unigram]]. */
  case object UnigramSoft extends SubwordScheme
}

/** The tokenizer trio as an `Estimator`/`Model` pair: `fit` trains the
  * chosen scheme from the corpus' capped word table (the one corpus-wide
  * pass); the fitted model adds a `n_pieces` column — the
  * piece-denominated length every token-budget stage downstream
  * (packing, selection, capacity) consumes. */
class SubwordTokenizerEstimator(
    scheme: SubwordScheme = SubwordScheme.Bpe,
    idCol: String = "doc_id",
    textCol: String = "text",
    maxWords: Int = 300)
    extends org.apache.spark.ml.Estimator[SubwordTokenizerModel] {
  override val uid: String = Identifiable.randomUID("subword_tokenizer")
  override def copy(extra: ParamMap): SubwordTokenizerEstimator = this

  override def fit(df: Dataset[_]): SubwordTokenizerModel = {
    val wc = graft.operators.Bpe.wordCounts(df.toDF(), textCol, maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val artifact: SubwordArtifact = scheme match {
      case SubwordScheme.Bpe =>
        SubwordArtifact.BpeMerges(graft.operators.Bpe.train(wc, nMerges = 60))
      case SubwordScheme.WordPiece =>
        // vocabTable runs on the bounded wc frame; rebuild it as a local DF
        val spark = df.sparkSession
        import spark.implicits._
        val v = graft.operators.WordPiece.vocabTable(
            wc.toDF("word", "cnt"), maxPieceLen = 8, topMulti = 200)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        SubwordArtifact.WpVocab(v)
      case SubwordScheme.Unigram =>
        SubwordArtifact.UgVocab(graft.operators.Unigram.train(wc))
      case SubwordScheme.UnigramSoft =>
        SubwordArtifact.UgVocab(graft.operators.Unigram.trainSoft(wc))
    }
    new SubwordTokenizerModel(artifact, idCol, textCol)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("n_pieces", LongType))
}

private[ml] sealed trait SubwordArtifact
private[ml] object SubwordArtifact {
  case class BpeMerges(merges: Seq[(String, String)]) extends SubwordArtifact
  case class WpVocab(vocab: Seq[(String, Long)]) extends SubwordArtifact
  case class UgVocab(vocab: Seq[(String, Long)]) extends SubwordArtifact
}

class SubwordTokenizerModel private[ml] (
    artifact: SubwordArtifact, idCol: String, textCol: String)
    extends org.apache.spark.ml.Model[SubwordTokenizerModel] {
  override val uid: String = Identifiable.randomUID("subword_tokenizer_model")
  override def copy(extra: ParamMap): SubwordTokenizerModel = this

  override def transform(df: Dataset[_]): DataFrame = {
    val spark = df.sparkSession
    val seg = artifact match {
      case SubwordArtifact.BpeMerges(m) =>
        graft.operators.Bpe.pieceCounts(spark, df.toDF(), m, idCol, textCol)
      case SubwordArtifact.WpVocab(v) =>
        graft.operators.WordPiece.segment(spark, df.toDF(), v, 8,
          idCol = idCol, textCol = textCol)
      case SubwordArtifact.UgVocab(v) =>
        graft.operators.Unigram.segment(spark, df.toDF(), v,
          idCol = idCol, textCol = textCol)
    }
    df.toDF().join(
      seg.select(col("doc_id").as(idCol), col("n_pieces")), Seq(idCol))
  }

  /** Persist the trained tokenizer — THE artifact a training run must
    * reuse exactly (a retrain on grown data yields a different token
    * space, silently shifting every piece count downstream). One
    * rank-ordered parquet relation per artifact (merge priority / vocab
    * order survive the round-trip) plus a flat meta JSON, published
    * temp-then-move as one unit (the Bm25Index discipline). Corpus
    * strings ride parquet, never hand-escaped JSON. */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val tmp = Paths.get(dir + ".tmp")
    rmTree(tmp)
    val kind = artifact match {
      case SubwordArtifact.BpeMerges(m) =>
        m.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
          .toDF("rank", "left", "right").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/artifact")
        "bpe_merges"
      case SubwordArtifact.WpVocab(v) =>
        v.zipWithIndex.map { case ((p, n), i) => (i.toLong, p, n) }
          .toDF("rank", "piece", "val").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/artifact")
        "wp_vocab"
      case SubwordArtifact.UgVocab(v) =>
        v.zipWithIndex.map { case ((p, n), i) => (i.toLong, p, n) }
          .toDF("rank", "piece", "val").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/artifact")
        "ug_vocab"
    }
    Files.writeString(Paths.get(s"$tmp/meta.json"),
      s"""{"kind":"$kind","id_col":"$idCol","text_col":"$textCol"}""")
    rmTree(Paths.get(dir))
    Files.move(tmp, Paths.get(dir))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("n_pieces", LongType))
}

object SubwordTokenizerModel {
  /** Reload a [[SubwordTokenizerModel.save]]d tokenizer. Absent vs
    * corrupt are distinguished (the SamplerState.loadFor discipline). */
  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): SubwordTokenizerModel = {
    import java.nio.file.{Files, Paths}
    val metaPath = Paths.get(s"$dir/meta.json")
    require(Files.exists(metaPath), s"no persisted tokenizer at $dir")
    val meta = Files.readString(metaPath)
    def str(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"corrupt tokenizer meta: missing $k")).group(1)
    val rows = spark.read.parquet(s"$dir/artifact").collect()
    val artifact = str("kind") match {
      case "bpe_merges" => SubwordArtifact.BpeMerges(
        rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sortBy(_._1).map(t => (t._2, t._3)).toSeq)
      case "wp_vocab" => SubwordArtifact.WpVocab(
        rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sortBy(_._1).map(t => (t._2, t._3)).toSeq)
      case "ug_vocab" => SubwordArtifact.UgVocab(
        rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sortBy(_._1).map(t => (t._2, t._3)).toSeq)
      case other => sys.error(s"corrupt tokenizer meta: unknown kind $other")
    }
    new SubwordTokenizerModel(artifact, str("id_col"), str("text_col"))
  }
}

/** The CCNet-style LM quality gate as a proper `Estimator`/`Model` pair:
  * `fit` trains the add-one bigram model on the (caller-filtered)
  * in-domain corpus; the fitted [[NgramLmModel]] adds `avg_cost_e6`
  * (lower = more in-domain) for downstream thresholding — the MLlib
  * idiom for the train-then-score shape of
  * [[graft.operators.NgramLm]]. */
class NgramLmEstimator(
    idCol: String = "doc_id",
    textCol: String = "text")
    extends org.apache.spark.ml.Estimator[NgramLmModel] {
  override val uid: String = Identifiable.randomUID("ngram_lm")
  override def copy(extra: ParamMap): NgramLmEstimator = this

  override def fit(df: Dataset[_]): NgramLmModel = {
    val (bg, ctx, v) = graft.operators.NgramLm.train(df.toDF(), textCol)
    new NgramLmModel(bg, ctx, v, idCol, textCol)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("avg_cost_e6", LongType))
}

class NgramLmModel private[ml] (
    bg: DataFrame, ctx: DataFrame, vocab: DataFrame,
    idCol: String, textCol: String)
    extends org.apache.spark.ml.Model[NgramLmModel] {
  override val uid: String = Identifiable.randomUID("ngram_lm_model")
  override def copy(extra: ParamMap): NgramLmModel = this

  override def transform(df: Dataset[_]): DataFrame = {
    val scores = graft.operators.NgramLm
      .score(df.toDF(), idCol, textCol, bg, ctx, vocab)
      .select(col("doc_id").as(idCol), col("avg_cost_e6"))
    df.toDF().join(scores, Seq(idCol))
  }

  /** Persist the trained quality model — three relations (bigrams,
    * contexts, vocab) that must never mix generations (new bigrams with
    * a stale vocab score silently wrong), so all three land in a `.tmp`
    * sibling and move into place as one unit. A calibrated threshold is
    * only meaningful against the exact model it was tuned on. */
  def save(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val tmp = Paths.get(dir + ".tmp")
    rmTree(tmp)
    bg.write.mode("overwrite").parquet(s"$tmp/bigrams")
    ctx.write.mode("overwrite").parquet(s"$tmp/contexts")
    vocab.write.mode("overwrite").parquet(s"$tmp/vocab")
    Files.writeString(Paths.get(s"$tmp/meta.json"),
      s"""{"id_col":"$idCol","text_col":"$textCol"}""")
    rmTree(Paths.get(dir))
    Files.move(tmp, Paths.get(dir))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("avg_cost_e6", LongType))
}

object NgramLmModel {
  /** Reload a [[NgramLmModel.save]]d quality model; absent vs corrupt
    * distinguished. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): NgramLmModel = {
    import java.nio.file.{Files, Paths}
    val metaPath = Paths.get(s"$dir/meta.json")
    require(Files.exists(metaPath), s"no persisted ngram-lm model at $dir")
    val meta = Files.readString(metaPath)
    def str(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"corrupt ngram-lm meta: missing $k")).group(1)
    new NgramLmModel(
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/vocab"),
      str("id_col"), str("text_col"))
  }
}

/** The ANN index family as an `Estimator`/`Model` pair (the MLlib facade
  * over [[graft.operators.Similarity]] + [[graft.operators.Pq]], the
  * idiom of [[SubwordTokenizerEstimator]]): `fit` learns the IVF coarse
  * centroids and — FAISS IVFADC semantics — the PQ codebooks over the
  * residuals x − centroid(cell(x)); both artifacts are collected to the
  * driver (K + M·Ks rows — the broadcast-sized index metadata, never
  * corpus data). The fitted [[IvfPqModel]]:
  *
  *   - `transform` adds the persisted-index columns: `cell` (coarse
  *     assignment) and `pq_codes` (the M codes, ordered by subspace) —
  *     M·8 bytes of index per vector, the ~compression dial;
  *   - `search(k)` runs the residual ADC top-k of q122's pipeline
  *     against a transformed (encoded) corpus.
  *
  * Parity with the operator kit (codebooks, codes, search ranks) is
  * pinned in PipelineSpec.
  */
class IvfPqIndexer(
    idCol: String = "vec_id",
    embCol: String = "embedding",
    dim: Int = 64,
    ivfK: Int = 8,
    m: Int = 8,
    ks: Int = 8)
    extends org.apache.spark.ml.Estimator[IvfPqModel] {
  override val uid: String = Identifiable.randomUID("ivf_pq_indexer")
  override def copy(extra: ParamMap): IvfPqIndexer = this

  override def fit(df: Dataset[_]): IvfPqModel = {
    import graft.operators.{Pq, Similarity}
    val emb = df.toDF()
    val cents = Similarity.ivfCentroids(emb, idCol, embCol, ivfK)
      .localCheckpoint()
    val assign = Similarity.ivfAssign(emb, idCol, embCol, cents)
      .localCheckpoint()
    val resid = IvfPqModel.residuals(emb, idCol, embCol, assign, cents)
      .localCheckpoint()
    val cb = Pq.codebook(resid, idCol, "_resid", dim, m, ks)
    val centRows = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val cbRows = cb.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray)).toSeq
    new IvfPqModel(centRows, cbRows, idCol, embCol, dim, m)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("cell", LongType))
      .add(StructField("pq_codes", ArrayType(LongType)))
}

object IvfPqModel {
  /** Residual table `(id, _resid)` on the float lattice (double
    * subtraction of floats is exact; the float cast IEEE-stable). */
  private[ml] def residuals(emb: DataFrame, idCol: String, embCol: String,
      assign: DataFrame, cents: DataFrame): DataFrame =
    emb.join(assign.select(col(idCol), col("cell")), Seq(idCol))
      .join(broadcast(cents.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col(idCol),
        zip_with(col(embCol).cast("array<double>"), col("cemb").cast("array<double>"),
          (x, y) => x - y).cast("array<float>").as("_resid"))

  /** Reload a [[IvfPqModel.save]]d index: centroid/codebook parquet plus
    * the flat meta JSON. Distinguishes absent from unparseable (the
    * SamplerState.loadFor discipline — a corrupt index must surface, not
    * silently retrain). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): IvfPqModel = {
    import java.nio.file.{Files, Paths}
    val metaPath = Paths.get(s"$dir/meta.json")
    require(Files.exists(metaPath), s"no persisted IVF-PQ index at $dir")
    val meta = Files.readString(metaPath)
    def str(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"corrupt IVF-PQ meta: missing $k")).group(1)
    def num(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(sys.error(s"corrupt IVF-PQ meta: missing $k")).group(1).toInt
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    val cb = spark.read.parquet(s"$dir/codebook").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .toSeq.sortBy(t => (t._1, t._2))
    new IvfPqModel(cents, cb, str("id_col"), str("emb_col"), num("dim"), num("m"))
  }
}

class IvfPqModel private[ml] (
    cents: Seq[(Long, Array[Float])],
    cb: Seq[(Long, Long, Array[Float])],
    idCol: String, embCol: String, dim: Int, m: Int)
    extends org.apache.spark.ml.Model[IvfPqModel] {
  override val uid: String = Identifiable.randomUID("ivf_pq_model")
  override def copy(extra: ParamMap): IvfPqModel = this

  private def centsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    cents.map { case (cid, e) => (cid, e.toSeq) }.toDF("cid", "cemb")
      .select(col("cid"), col("cemb").cast("array<float>").as("cemb"))
  }
  private def cbDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    cb.map { case (mm, code, e) => (mm, code, e.toSeq) }.toDF("m", "code", "cemb")
      .select(col("m"), col("code"), col("cemb").cast("array<float>").as("cemb"))
  }

  /** Adds `cell` + `pq_codes` — the persisted index columns. */
  override def transform(df: Dataset[_]): DataFrame = {
    import graft.operators.{Pq, Similarity}
    val spark = df.sparkSession
    val emb = df.toDF()
    val cents0 = centsDf(spark)
    val assign = Similarity.ivfAssign(emb, idCol, embCol, cents0)
    val resid = IvfPqModel.residuals(emb, idCol, embCol, assign, cents0)
    val codes = Pq.encode(resid, idCol, "_resid", dim, m, cbDf(spark))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("m"), col("code")))).as("cs"))
      .select(col("id").as(idCol),
        expr("transform(cs, x -> x.code)").as("pq_codes"))
    emb.join(assign.select(col(idCol), col("cell")), Seq(idCol))
      .join(codes, Seq(idCol))
  }

  /** Residual ADC top-`k` of `queries` against a `transform`ed corpus
    * (must carry `cell` + `pq_codes`): (qid, id, adist, rank). */
  def search(encoded: DataFrame, queries: DataFrame,
      qidCol: String, qembCol: String, nprobe: Int, k: Int): DataFrame = {
    import graft.operators.{Pq, Similarity}
    import org.apache.spark.sql.expressions.Window
    val spark = encoded.sparkSession
    val cents0 = centsDf(spark)
    val cbd = cbDf(spark)
    val probes = Similarity.ivfProbes(queries, qidCol, qembCol, cents0, nprobe)
      .select(col(qidCol).as("qid"), col("cell"))
    val subN = dim / m
    val qslices = (0 until m).map(j =>
      struct(lit(j.toLong).as("m"), slice(col("qres"), j * subN + 1, subN).as("semb")))
    val adc = probes
      .join(queries.select(col(qidCol).as("qid"), col(qembCol).as("_qemb")), "qid")
      .join(broadcast(cents0.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col("qid"), col("cell"),
        zip_with(col("_qemb").cast("array<double>"), col("cemb").cast("array<double>"),
          (x, y) => x - y).cast("array<float>").as("qres"))
      .select(col("qid"), col("cell"), explode(array(qslices: _*)).as("sl"))
      .join(broadcast(cbd), col("sl.m") === col("m"))
      .select(col("qid"), col("cell"), col("m"), col("code"),
        Pq.distE3(col("sl.semb"), col("cemb")).as("d"))
    val cand = encoded
      .select(col(idCol).as("id"), col("cell"),
        posexplode(col("pq_codes")).as(Seq("m", "code")))
      .select(col("id"), col("cell"), col("m").cast("long").as("m"), col("code"))
      .join(broadcast(probes), "cell")
      .filter(col("id") =!= col("qid"))
    val scored = cand.join(broadcast(adc), Seq("qid", "cell", "m", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d")).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Persist the fitted index (FAISS `write_index` semantics): centroids
    * + codebooks as parquet plus a flat meta JSON, all landing in a
    * `.tmp` sibling first and moving into place as ONE unit (the
    * Bm25Index.save discipline — never a mixed-generation index). The
    * encoded corpus is NOT part of the index: codes are data the caller
    * persists like any frame; re-encoding a new shard against a loaded
    * model IS the incremental add. */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    val tmp = Paths.get(dir + ".tmp")
    rmTree(tmp)
    centsDf(spark).write.mode("overwrite").parquet(s"$tmp/centroids")
    cbDf(spark).write.mode("overwrite").parquet(s"$tmp/codebook")
    Files.writeString(Paths.get(s"$tmp/meta.json"),
      s"""{"id_col":"$idCol","emb_col":"$embCol","dim":$dim,"m":$m}""")
    rmTree(Paths.get(dir))
    Files.move(tmp, Paths.get(dir))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField("cell", LongType))
      .add(StructField("pq_codes", ArrayType(LongType)))
}
