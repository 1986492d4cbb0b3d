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

/** Terminal stage: the corpus (doc_id, source, text) becomes triplet rows. */
class TripletSamplerStage(cfg: TripletConfig = TripletConfig())
    extends GraftTransformer("triplet_sampler") {

  override def transform(df: Dataset[_]): DataFrame =
    Triplets.tripletRows(df.toDF(), cfg)

  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField("aid", LongType), StructField("nid", LongType),
      StructField("split", StringType), StructField("recipe", StringType),
      StructField("a_hash", LongType), StructField("p_hash", LongType),
      StructField("n_hash", LongType), StructField("swapped", BooleanType),
      StructField("pidx", LongType), StructField("nidx", LongType),
      StructField("weight_e6", LongType)))
}
