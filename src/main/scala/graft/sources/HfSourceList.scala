package graft.sources

import graft.core.{DataRecord, SectionRole}
import graft.functions.Sentences
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Hugging-Face source-list parsing and row→record mapping
  * (reference: huggingface_source.rs:231-417 parser, 573-609 column
  * config, 3990-4047 record assembly; format spec README.md:225-256).
  *
  * The network layer (datasets-server manifest walk, shard download) is a
  * driver-side concern outside the engine (zero-egress here); the engine
  * consumes already-landed parquet shards via `spark.read.parquet` —
  * which at scale is strictly better than the reference's hand-rolled
  * row-group reader (vectorized scan, predicate pushdown, row-group
  * pruning for free).
  *
  * Mapping truth table (reference README.md:155-215):
  *   - `anchor=` columns: ordered candidates, first non-blank wins
  *     (coalesce); row dropped when all blank;
  *   - `positive=` columns: same coalescing; falls back to anchor text when
  *     absent;
  *   - `context=` columns: ALL required — row dropped if any is blank; each
  *     becomes one more Context section;
  *   - `text=` columns: text mode (SimCSE) — first non-blank duplicated
  *     into Anchor and Context;
  *   - unknown `key=` tokens are hard errors.
  */
case class HfSourceEntry(
    uri: String,
    dataset: String,
    config: String,
    split: String,
    anchorColumns: Seq[String],
    positiveColumns: Seq[String],
    contextColumns: Seq[String],
    textColumns: Seq[String],
    trust: Option[Float],
    sourceId: Option[String],
    /** Explicit stable-id column (reference `id_column`,
      * huggingface_source.rs:3844-4004) — the strongest id form: survives
      * shard re-sharding, not just re-reads. */
    idColumn: Option[String] = None) {
  /** Auto source id: dataset path slug (reference slug generation). */
  def resolvedSourceId: String =
    sourceId.getOrElse(dataset.replaceAll("[^A-Za-z0-9]+", "_").toLowerCase)
}

object HfSourceList {

  def parseUri(uri: String): Either[String, (String, String, String)] = {
    val trimmed = uri.trim
    if (!trimmed.startsWith("hf://")) Left(s"unsupported source URI (expected hf://...): $trimmed")
    else {
      val rest = trimmed.stripPrefix("hf://")
      val parts = rest.split('/')
      if (parts.length < 2 || parts.take(2).exists(_.isEmpty))
        Left(s"invalid hf:// URI (expected org/dataset[/config[/split]]): $uri")
      else {
        val dataset = parts.take(2).mkString("/")
        val config = if (parts.length >= 3) parts(2) else "default"
        val split = if (parts.length >= 4) parts(3) else "train"
        Right((dataset, config, split))
      }
    }
  }

  private def csvFields(v: String): Seq[String] =
    v.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** Parse one source-list line; comments (#) and blank lines yield None. */
  def parseLine(line: String): Either[String, Option[HfSourceEntry]] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return Right(None)
    val parts = t.split("\\s+").toSeq
    val uri = parts.head
    parseUri(uri).flatMap { case (dataset, config, split) =>
      var entry = HfSourceEntry(uri, dataset, config, split, Nil, Nil, Nil, Nil, None, None)
      val errors = parts.tail.flatMap { token =>
        token.split("=", 2) match {
          case Array(rawKey, rawValue) =>
            val key = rawKey.trim.toLowerCase
            val value = rawValue.trim
            key match {
              case "anchor" => entry = entry.copy(anchorColumns = csvFields(value)); None
              case "positive" => entry = entry.copy(positiveColumns = csvFields(value)); None
              case "context" => entry = entry.copy(contextColumns = csvFields(value)); None
              case "text" | "text_columns" => entry = entry.copy(textColumns = csvFields(value)); None
              case "trust" =>
                value.toFloatOption match {
                  case Some(f) if f >= 0.0f && f <= 1.0f =>
                    entry = entry.copy(trust = Some(f)); None
                  case _ => Some(s"invalid trust value '$value': expected a float in [0.0, 1.0]")
                }
              case "source_id" =>
                if (value.isEmpty) Some("source_id must not be empty")
                else { entry = entry.copy(sourceId = Some(value)); None }
              case "id" | "id_column" =>
                if (value.isEmpty) Some("id column must not be empty")
                else { entry = entry.copy(idColumn = Some(value)); None }
              case _ => Some(s"unsupported mapping key '$rawKey'")
            }
          case _ => Some(s"invalid mapping token '$token' (expected key=value)")
        }
      }
      if (errors.nonEmpty) Left(errors.head)
      else if (entry.anchorColumns.isEmpty && entry.positiveColumns.isEmpty &&
        entry.contextColumns.isEmpty && entry.textColumns.isEmpty)
        Left(s"source '${entry.uri}' has no field mapping; expected at least one of anchor=, positive=, context=, text=")
      else Right(Some(entry))
    }
  }

  def parseList(text: String): Either[String, Seq[HfSourceEntry]] = {
    val results = text.split('\n').toSeq.map(parseLine)
    results.collectFirst { case Left(e) => e } match {
      case Some(err) => Left(err)
      case None => Right(results.collect { case Right(Some(e)) => e })
    }
  }

  /** ClassLabel resolution: HF datasets store categorical columns as
    * integer codes with a names list in the dataset info
    * (reference: huggingface_source.rs ClassLabel handling; SURVEY maps it
    * to a labels dim join). The labels list is tiny → literal map column,
    * no join, fused into the scan. Unknown codes keep their integer form. */
  def resolveClassLabels(df: DataFrame, colName: String, labels: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val mapping = map(labels.zipWithIndex.flatMap { case (name, i) =>
      Seq(lit(i), lit(name))
    }: _*)
    df.withColumn(colName,
      coalesce(element_at(mapping, col(colName).cast("int")), col(colName).cast("string")))
  }

  /** Stable-id column for a shard frame. Resolution order (reference
    * stable-id contract src/config.rs:138-145, id forms
    * huggingface_source.rs:3844-4004):
    *   1. explicit id column (strongest — survives re-sharding);
    *   2. file-backed shards: `(file name, in-file row index)` from the
    *      scan's `_metadata` column — stable across partition counts,
    *      scan-split config, and added shards, where a global zipWithIndex
    *      renumbers wholesale (Spark bin-packs scan splits by size, not
    *      dataset order);
    *   3. in-memory frames (tests only): partition-order numbering.
    */
  private def withStableId(shard: DataFrame, sourceId: String,
      idColumn: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    idColumn match {
      case Some(c) =>
        shard.withColumn("_graft_id", concat(lit(s"$sourceId::"), col(c).cast("string")))
      case None =>
        try shard.withColumn("_graft_id",
          concat(lit(s"$sourceId::"), col("_metadata.file_name"), lit(":row_"),
            col("_metadata.row_index").cast("string")))
        catch { case _: org.apache.spark.sql.AnalysisException =>
          val spark = shard.sparkSession
          val schema = shard.schema.add("_graft_id", org.apache.spark.sql.types.StringType)
          val rdd = shard.rdd.zipWithIndex().map { case (row, i) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq :+ s"$sourceId::row_$i")
          }
          spark.createDataFrame(rdd, schema)
        }
    }
  }

  /** Map landed shard rows to records per the entry's column config. */
  def toRecords(spark: SparkSession, shard: DataFrame, entry: HfSourceEntry): Dataset[DataRecord] = {
    import spark.implicits._
    val cols = shard.columns
    def idx(name: String): Option[Int] = cols.indexWhere(_.equalsIgnoreCase(name)) match {
      case -1 => None
      case i => Some(i)
    }
    val aIdx = entry.anchorColumns.flatMap(idx(_))
    val pIdx = entry.positiveColumns.flatMap(idx(_))
    val cIdx = entry.contextColumns.flatMap(idx(_))
    val tIdx = entry.textColumns.flatMap(idx(_))
    require(entry.contextColumns.isEmpty || cIdx.size == entry.contextColumns.size,
      s"missing context columns for ${entry.uri}")
    val sourceId = entry.resolvedSourceId
    val trust = entry.trust.getOrElse(0.5f)
    val textMode = tIdx.nonEmpty

    val rows = withStableId(shard, sourceId, entry.idColumn).rdd.flatMap { row =>
      def cell(j: Int): String =
        Option(row.get(j)).map(v => Sentences.normalizeInlineWhitespace(v.toString)).getOrElse("")
      def coalesce(ixs: Seq[Int]): String = ixs.map(cell).find(_.nonEmpty).getOrElse("")
      val id = row.getString(row.fieldIndex("_graft_id"))
      val secs =
        if (textMode) {
          val t = coalesce(tIdx)
          if (t.isEmpty) None
          else Some(Seq(Sources.makeSection(SectionRole.Anchor, None, t),
            Sources.makeSection(SectionRole.Context, None, t)))
        } else {
          val anchor = coalesce(aIdx)
          val positive = { val p = coalesce(pIdx); if (p.isEmpty) anchor else p }
          val contexts = cIdx.map(cell)
          if (anchor.isEmpty || contexts.exists(_.isEmpty)) None
          else Some(
            Sources.makeSection(SectionRole.Anchor, None, anchor) +:
              Sources.makeSection(SectionRole.Context, None, positive) +:
              contexts.map(c => Sources.makeSection(SectionRole.Context, None, c)))
        }
      secs.map(ss => DataRecord(id, sourceId, Sources.EpochTs, Sources.EpochTs,
        trust, Seq(sourceId), ss, None))
    }
    spark.createDataset(rows)
  }
}
