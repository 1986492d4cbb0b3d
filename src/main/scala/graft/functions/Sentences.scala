package graft.functions

/** Heuristic sentence splitter (reference: src/utils.rs:37-121).
  *
  * Paragraph blocks split on blank lines; inside a block, boundaries at
  * `!`/`?` always, and at `.` unless it is a decimal middle (digit.digit),
  * a ticker middle (uppercase/digit on both sides), or part of an
  * ellipsis (`..`). Pure Scala; used at section-construction time
  * (`makeSection`) and registered as a UDF when needed in column form.
  */
object Sentences {

  def normalizeInlineWhitespace(text: String): String =
    text.split("\\s+").filter(_.nonEmpty).mkString(" ")

  def sentences(text: String): Seq[String] = {
    val normalized = text.replace("\r\n", "\n").replace('\r', '\n')
    normalized.split("\n\n", -1).toSeq.flatMap { block =>
      if (block.trim.isEmpty) Nil
      else {
        val n = normalizeInlineWhitespace(block)
        if (n.isEmpty) Nil else blockSentences(n)
      }
    }
  }

  private def blockSentences(block: String): Seq[String] = {
    val chars = block.toCharArray
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    var i = 0
    while (i < chars.length) {
      buf.append(chars(i))
      if (isBoundary(chars, i)) {
        val t = buf.toString.trim
        if (t.nonEmpty) out += t
        buf.clear()
      }
      i += 1
    }
    val trailing = buf.toString.trim
    if (trailing.nonEmpty) out += trailing
    out.result()
  }

  private def isBoundary(chars: Array[Char], idx: Int): Boolean = chars(idx) match {
    case '.' => isDotBoundary(chars, idx)
    case '!' | '?' => true
    case _ => false
  }

  private def isDotBoundary(chars: Array[Char], idx: Int): Boolean = {
    if (isDecimalMiddle(chars, idx) || isTickerMiddle(chars, idx)) return false
    if (idx + 1 < chars.length && chars(idx + 1) == '.') return false
    true
  }

  private def isDecimalMiddle(chars: Array[Char], idx: Int): Boolean =
    idx > 0 && idx + 1 < chars.length &&
      chars(idx - 1).isDigit && chars(idx + 1).isDigit

  private def isTickerMiddle(chars: Array[Char], idx: Int): Boolean =
    idx > 0 && idx + 1 < chars.length &&
      isTickerChar(chars(idx - 1)) && isTickerChar(chars(idx + 1))

  private def isTickerChar(ch: Char): Boolean =
    (ch >= 'A' && ch <= 'Z') || ch.isDigit

  /** Per-block character cap for the prefix-sum lane of [[sentenceRows]].
    * The prefix-sum plan explodes one row per CHARACTER and windows on
    * (doc, block) — per-key work is bounded by the block length, and
    * per-(doc,block) keys cannot subdivide, so a multi-MB single-block
    * document would serialize ~25× its size onto one task. Blocks above
    * this cap instead take the pure-function lane ([[blockSentences]] as
    * a one-row-in/array-out UDF — linear, no explosion); both lanes
    * implement the identical boundary rule, so the union is
    * lane-invisible to callers and to the q47 oracle. */
  val MaxPrefixSumBlockChars = 4096

  /** Distributed column form of [[sentences]] — the boundary rule only
    * looks one character left and right, so the per-character scan is a
    * prefix-sum, not a loop: explode characters, flag boundaries from
    * lag/lead, running-sum the flags into sentence ids, reassemble per
    * (doc, block, sentence). Fully declarative (no UDF) for blocks up to
    * [[MaxPrefixSumBlockChars]]; oversized blocks take the pure-function
    * UDF lane (see the cap's scaladoc for the scale rationale). Exactly
    * replayed by the DuckDB oracle (q47); pinned equal to the pure path
    * in SourcesSpec.
    *
    * Returns `(doc_id, sent_idx, sentence)` with `sent_idx` the 0-based
    * document-wide sentence position. */
  def sentenceRows(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      maxBlockChars: Int = MaxPrefixSumBlockChars): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val normalized = regexp_replace(
      regexp_replace(col(textCol), "\r\n", "\n"), "\r", "\n")
    val blocks = docs
      .select(col(idCol).as("doc_id"), posexplode(split(normalized, "\n\n", -1)))
      .toDF("doc_id", "bidx", "block")
      .withColumn("n", TextFunctions.normalizeWs(col("block")))
      .filter(col("n") =!= "")
    val oversized = blocks.filter(length(col("n")) > maxBlockChars)
    val chars = blocks.filter(length(col("n")) <= maxBlockChars)
      .select(col("doc_id"), col("bidx"), posexplode(split(col("n"), "")))
      .toDF("doc_id", "bidx", "pos", "c")
      .filter(col("c") =!= "")
    val wOrd = Window.partitionBy(col("doc_id"), col("bidx")).orderBy(col("pos"))
    def ticker(c: org.apache.spark.sql.Column) = coalesce(c.rlike("^[A-Z0-9]$"), lit(false))
    def digit(c: org.apache.spark.sql.Column) = coalesce(c.rlike("^[0-9]$"), lit(false))
    val flagged = chars
      .withColumn("pc", lag(col("c"), 1).over(wOrd))
      .withColumn("nc", lead(col("c"), 1).over(wOrd))
      .withColumn("bnd",
        col("c").isin("!", "?") ||
          (col("c") === "." &&
            !(digit(col("pc")) && digit(col("nc"))) &&
            !(ticker(col("pc")) && ticker(col("nc"))) &&
            coalesce(col("nc") =!= ".", lit(true))))
      .withColumn("sid", coalesce(sum(when(col("bnd"), 1L).otherwise(0L))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val prefixSumLane = flagged
      .groupBy(col("doc_id"), col("bidx"), col("sid"))
      .agg(trim(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("c")))), x => x("c")),
        "")).as("sentence"))
      .filter(col("sentence") =!= "")
    val blockUdf = udf((s: String) => blockSentences(s))
    val pureLane = oversized
      .select(col("doc_id"), col("bidx"), posexplode(blockUdf(col("n"))))
      .toDF("doc_id", "bidx", "sid", "sentence")
      .withColumn("sid", col("sid").cast("long"))
    prefixSumLane.unionByName(pureLane)
      .withColumn("sent_idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("bidx"), col("sid"))).cast("long") - 1)
      .select(col("doc_id"), col("sent_idx"), col("sentence"))
  }
}
