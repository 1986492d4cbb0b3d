package graft.sources

import graft.core.{DataRecord, RecordSection, SectionRole}
import graft.functions.Sentences
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Shared record-construction helpers for all sources. */
object Sources {
  /** Deterministic default timestamp: sources with no time metadata pin
    * epoch 0 rather than wall-clock (reproducibility over recency). */
  val EpochTs = new Timestamp(0L)

  def makeSection(role: String, heading: Option[String], text: String): RecordSection =
    RecordSection(role, heading, text, Sentences.sentences(text))
}

/** CSV corpus source (reference: src/source/backends/csv_source.rs:143-348).
  *
  * Role mode: `anchorColumn` → Anchor section, `positiveColumn` (fallback:
  * anchor) → Context. Text mode: one column duplicated into both roles
  * (SimCSE). Header row required; column match is case-insensitive; values
  * whitespace-normalized; rows with empty required fields are skipped.
  * Record id = `<sourceId>::row_<idx>` with `idx` the exact row order
  * within the file — per-file window numbering over an unsplittable
  * (multiLine) scan, so ids survive re-reads, partition-count changes,
  * and added files (stable-id contract, reference src/config.rs:138-145).
  */
case class CsvSourceConfig(
    sourceId: String,
    path: String,
    anchorColumn: Option[String] = None,
    positiveColumn: Option[String] = None,
    textColumn: Option[String] = None,
    trust: Float = 0.5f) {
  require(anchorColumn.nonEmpty || textColumn.nonEmpty,
    "CSV source needs anchorColumn (role mode) or textColumn (text mode)")
  def isRoleMode: Boolean = anchorColumn.nonEmpty
}

object CsvSource {

  def read(spark: SparkSession, cfg: CsvSourceConfig): Dataset[DataRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // multiLine pins each file to a single scan partition (the whole-file
    // parser is not splittable), so monotonically_increasing_id() is
    // read-order within the file and the per-file window renumbers rows
    // by exact file order — ids survive partition-count and scan-split
    // changes, unlike a global zipWithIndex over bin-packed splits
    // (stable-id contract, reference src/config.rs:138-145)
    val df0 = spark.read.option("header", "true").option("multiLine", "true").csv(cfg.path)
    val headers = df0.columns
    val df = df0
      .withColumn("_gfile", input_file_name())
      .withColumn("_gmono", monotonically_increasing_id())
      .withColumn("_gidx", row_number().over(
        Window.partitionBy(col("_gfile")).orderBy(col("_gmono"))).cast("long") - 1)
    def resolve(name: Option[String]): Option[Int] =
      name.flatMap(n => headers.indexWhere(_.equalsIgnoreCase(n)) match {
        case -1 => None
        case i => Some(i)
      })
    val aIdx = resolve(cfg.anchorColumn)
    val pIdx = resolve(cfg.positiveColumn)
    val tIdx = resolve(cfg.textColumn)
    val roleMode = cfg.isRoleMode
    val (sourceId, trust) = (cfg.sourceId, cfg.trust)
    val aHeading = cfg.anchorColumn
    val pHeading = cfg.positiveColumn.orElse(cfg.anchorColumn)
    val tHeading = cfg.textColumn

    val rows = df.rdd.flatMap { row =>
      def cell(i: Option[Int]): String = i.map(j =>
        Option(row.getString(j)).getOrElse("")).getOrElse("")
      def norm(s: String): String = Sentences.normalizeInlineWhitespace(s)
      val id = s"$sourceId::row_${row.getLong(row.fieldIndex("_gidx"))}"
      val sections: Option[Seq[RecordSection]] =
        if (roleMode) {
          val anchor = norm(cell(aIdx))
          // positive column, when configured, is required; otherwise the
          // anchor text doubles as positive
          val positiveOpt =
            if (pIdx.nonEmpty) Some(norm(cell(pIdx))).filter(_.nonEmpty)
            else Some(anchor)
          if (anchor.isEmpty) None
          else positiveOpt.map(positive => Seq(
            Sources.makeSection(SectionRole.Anchor, aHeading, anchor),
            Sources.makeSection(SectionRole.Context, pHeading, positive)))
        } else {
          val text = norm(cell(tIdx))
          if (text.isEmpty) None
          else Some(Seq(
            Sources.makeSection(SectionRole.Anchor, tHeading, text),
            Sources.makeSection(SectionRole.Context, tHeading, text)))
        }
      sections.map(secs => DataRecord(id, sourceId, Sources.EpochTs, Sources.EpochTs,
        trust, Seq(sourceId), secs, None))
    }
    spark.createDataset(rows)
  }
}

/** JSONL corpus source — a pipeline extension beyond the reference's
  * CSV/File/HF backends (JSON-lines is the lingua franca of training
  * corpora). Same contracts as the CSV source: role mode
  * (`anchorField` → Anchor, `contextField` required when configured,
  * else anchor doubles as Context) or text mode (SimCSE duplication);
  * values whitespace-normalized; rows with empty required fields or
  * invalid JSON are silently skipped but still CONSUME their line id.
  *
  * Stable ids: id = `<sourceId>::<file stem>::line_<i>` — survives
  * partition-count and scan-split changes (stable-id contract, reference
  * src/config.rs:138-145). Two lanes produce identical ids (spec-pinned):
  *
  *   - [[JsonlSource.read]] — wholetext: ONE scan row per file, never
  *     split mid-file. SIZE BOUND: the entire file is a single task AND a
  *     single in-memory string, so per-file size is limited by executor
  *     task memory (keep files well under a few hundred MB; shard large
  *     corpora into many files). Parallelism is #files, not #bytes.
  *   - [[JsonlSource.readSplittable]] — `spark.read.text`: large files
  *     split at block boundaries, so one 100 GB file still fans out
  *     across the cluster. Line ids are reconstructed from
  *     `_metadata.file_block_start` + in-block position + per-file block
  *     prefix sums (split-geometry invariant). Prefer this lane at scale;
  *     the wholetext lane remains for parity with unsplittable formats.
  */
case class JsonlSourceConfig(
    sourceId: String,
    path: String,
    anchorField: Option[String] = None,
    contextField: Option[String] = None,
    textField: Option[String] = None,
    trust: Float = 0.5f) {
  require(anchorField.nonEmpty || textField.nonEmpty,
    "JSONL source needs anchorField (role mode) or textField (text mode)")
  def isRoleMode: Boolean = anchorField.nonEmpty
}

object JsonlSource {

  def read(spark: SparkSession, cfg: JsonlSourceConfig): Dataset[DataRecord] = {
    import org.apache.spark.sql.functions._
    val lines = spark.read.option("wholetext", "true").text(cfg.path)
      .withColumn("_gfile", regexp_extract(input_file_name(), "([^/]+?)(\\.[A-Za-z0-9]+)?$", 1))
      .select(col("_gfile"), posexplode(split(col("value"), "\n")))
      .toDF("file", "lidx", "line")
    toRecords(spark, lines, cfg)
  }

  /** Splittable lane — see the class scaladoc. Within a (file, block) the
    * scan preserves row order, so `row_number` over
    * `monotonically_increasing_id` is the in-block line position; block
    * line-offsets are a prefix sum over the per-file block counts (a
    * #blocks-sized frame, broadcast back). The (block_start, position)
    * order IS file order for any split geometry, so ids match the
    * wholetext lane bit-for-bit. One caveat vs wholetext: the text reader
    * strips \r\n while the wholetext lane splits on \n only — identical
    * on \n-delimited corpora (the JSONL norm). */
  def readSplittable(spark: SparkSession, cfg: JsonlSourceConfig): Dataset[DataRecord] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.text(cfg.path)
      .select(col("value").as("line"),
        regexp_extract(col("_metadata.file_name"), "^(.+?)(\\.[A-Za-z0-9]+)?$", 1).as("file"),
        col("_metadata.file_path").as("fpath"),
        col("_metadata.file_block_start").as("bstart"),
        monotonically_increasing_id().as("mid"))
    val inBlock = raw.withColumn("bpos",
      row_number().over(Window.partitionBy(col("fpath"), col("bstart"))
        .orderBy(col("mid"))).cast("long") - 1)
    val offsets = inBlock.groupBy(col("fpath"), col("bstart"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(
        Window.partitionBy(col("fpath")).orderBy(col("bstart"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("fpath"), col("bstart"), col("boff"))
    val lines = inBlock.join(broadcast(offsets), Seq("fpath", "bstart"))
      .select(col("file"), (col("boff") + col("bpos")).as("lidx"), col("line"))
    toRecords(spark, lines, cfg)
  }

  /** Shared (file, lidx, line) → [[DataRecord]] mapping for both lanes —
    * identical skip/consume and section semantics by construction. */
  private def toRecords(spark: SparkSession, linesDf: org.apache.spark.sql.DataFrame,
      cfg: JsonlSourceConfig): Dataset[DataRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = linesDf
    val af = cfg.anchorField.map(f => get_json_object(col("line"), s"$$.$f"))
    val pf = cfg.contextField.map(f => get_json_object(col("line"), s"$$.$f"))
    val tf = cfg.textField.map(f => get_json_object(col("line"), s"$$.$f"))
    val parsed = lines.select(col("file"), col("lidx").cast("long").as("lidx"),
      af.getOrElse(lit(null)).as("a"), pf.getOrElse(lit(null)).as("p"),
      tf.getOrElse(lit(null)).as("t"))
    val roleMode = cfg.isRoleMode
    val hasContextField = cfg.contextField.nonEmpty
    val (sourceId, trust) = (cfg.sourceId, cfg.trust)
    val (aH, pH, tH) = (cfg.anchorField, cfg.contextField.orElse(cfg.anchorField), cfg.textField)
    parsed.as[(String, Long, String, String, String)].flatMap { case (file, lidx, a, p, t) =>
      def norm(s: String): String =
        Sentences.normalizeInlineWhitespace(Option(s).getOrElse(""))
      val id = s"$sourceId::$file::line_$lidx"
      val sections: Option[Seq[RecordSection]] =
        if (roleMode) {
          val anchor = norm(a)
          val positiveOpt =
            if (hasContextField) Some(norm(p)).filter(_.nonEmpty)
            else Some(anchor)
          if (anchor.isEmpty) None
          else positiveOpt.map(positive => Seq(
            Sources.makeSection(SectionRole.Anchor, aH, anchor),
            Sources.makeSection(SectionRole.Context, pH, positive)))
        } else {
          val text = norm(t)
          if (text.isEmpty) None
          else Some(Seq(
            Sources.makeSection(SectionRole.Anchor, tH, text),
            Sources.makeSection(SectionRole.Context, tH, text)))
        }
      sections.map(secs => DataRecord(id, sourceId, Sources.EpochTs, Sources.EpochTs,
        trust, Seq(sourceId), secs, None))
    }
  }
}

/** In-memory source (reference: src/source/backends/in_memory_source.rs). */
object InMemorySource {
  def read(spark: SparkSession, records: Seq[DataRecord]): Dataset[DataRecord] = {
    import spark.implicits._
    spark.createDataset(records)
  }
}

/** File-corpus source (reference: src/source/backends/file_source.rs:213-312,
  * id format src/source/indexing/file_corpus.rs:276-282).
  *
  * Recursive `.txt` scan; filename stem (underscores → spaces) becomes the
  * Anchor section, the body the Context. Taxonomy = [sourceId, parent dirs
  * under the root]; a parseable dated folder adds a `date=YYYY-MM-DD`
  * taxonomy entry (reference: src/metadata.rs:8-34). Record id =
  * `<sourceId>::<relative path>`.
  */
case class FileSourceConfig(sourceId: String, rootPath: String, trust: Float = 0.5f)

object FileSource {

  /** Shared (path, body) → record mapping for the batch, streaming, and
    * paged ([[FileStream]]) scans — identical semantics by construction. */
  private[sources] def mapRecords(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, cfg: FileSourceConfig): Dataset[DataRecord] = {
    import spark.implicits._
    val (sourceId, trust) = (cfg.sourceId, cfg.trust)
    val root = cfg.rootPath.stripSuffix("/")
    df.as[(String, String)].map { case (fullPath, body) =>
      val cleaned = fullPath.stripPrefix("file://").stripPrefix("file:")
      val rel = cleaned.substring(cleaned.indexOf(root) + root.length).stripPrefix("/")
      val parts = rel.split('/')
      val stem = parts.last.stripSuffix(".txt")
      val anchor = Sentences.normalizeInlineWhitespace(stem.replace('_', ' '))
      val dirs = parts.dropRight(1).toSeq
      val date = DateHelpers.dateFromDirs(dirs)
      val taxonomy = (sourceId +: dirs) ++ date.map(d => s"date=$d")
      DataRecord(s"$sourceId::$rel", sourceId, Sources.EpochTs, Sources.EpochTs,
        trust, taxonomy,
        Seq(Sources.makeSection(SectionRole.Anchor, None, anchor),
          Sources.makeSection(SectionRole.Context, None, body)),
        None)
    }
  }

  /** SIZE BOUND: the wholetext scan makes each file one task and one
    * in-memory string — per-file size is limited by executor task memory
    * (keep corpus files well under a few hundred MB) and parallelism is
    * #files, not #bytes. That is the right trade for a file corpus whose
    * unit of meaning is the document; for line-structured data use
    * [[JsonlSource.readSplittable]]. */
  def read(spark: SparkSession, cfg: FileSourceConfig): Dataset[DataRecord] = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    mapRecords(spark, spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.txt")
      .text(cfg.rootPath)
      .select(input_file_name().as("path"), col("value")), cfg)
  }

  /** Streaming twin — the reference's `FileStream` (SURVEY §2.1 #7):
    * newly arriving corpus files become records incrementally; ids,
    * taxonomy, and sections are byte-identical to [[read]] because both
    * scans feed the same mapping. Checkpointing/exactly-once comes from
    * Structured Streaming instead of the reference's mtime cursors. */
  def stream(spark: SparkSession, cfg: FileSourceConfig): Dataset[DataRecord] = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    mapRecords(spark, spark.readStream
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.txt")
      .text(cfg.rootPath)
      .select(input_file_name().as("path"), col("value")), cfg)
  }
}
