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

  /** Per-block character cap for the declarative lane of [[sentenceRows]].
    * Historically the lane exploded one row per CHARACTER through a
    * (doc, block)-keyed window (per-(doc,block) keys cannot subdivide, so
    * a multi-MB single-block document serialized ~25× its size onto one
    * task); the lane is now a single regex boundary-split (below), which
    * is linear per block with no explosion — but the cap STAYS as the
    * lane-membership boundary because the two lanes' digit classes differ
    * outside ASCII (the declarative lane tests `[0-9]`, the pure scanner
    * `Char.isDigit` — Unicode digits land differently), and moving a
    * block across lanes could change its boundaries. Same cap, same lane
    * per block, same rows as every previous round. */
  val MaxPrefixSumBlockChars = 4096

  /** Distributed column form of [[sentences]] — the boundary rule only
    * looks one character left and right, so a boundary position is
    * exactly expressible as a zero-width regex (lookbehind on the
    * boundary char, lookarounds for the decimal/ticker/ellipsis guards):
    * ONE `split` per block replaces the former per-character explode +
    * lag/lead window + running-sum + collect_list reassembly (five
    * corpus-width operators deleted; pieces are per-SENTENCE rows, not
    * per-character). Blocks above [[MaxPrefixSumBlockChars]] take the
    * pure-function UDF lane (see the cap's scaladoc). Exactly replayed by
    * the DuckDB oracle (q47); pinned equal to the pure path in
    * SourcesSpec (fixtures + 150-text fuzz).
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
    // zero-width boundary positions, the exact column-lane rule the old
    // per-character window computed: after `!`/`?` always; after `.` when
    // the next char is not `.` (ellipsis guard) AND NOT(digit.digit)
    // (decimal guard, `¬(a∧b)` as a lookaround alternation) AND
    // NOT(ticker.ticker). Pieces between boundaries ARE the sentences
    // (trimmed, empties dropped — the scanner's buffer-flush semantics).
    val boundaryRe = "(?<=[!?])" +
      "|(?<=\\.)(?!\\.)" +
      "(?:(?<![0-9]\\.)|(?![0-9]))" +
      "(?:(?<![A-Z0-9]\\.)|(?![A-Z0-9]))"
    val prefixSumLane = blocks.filter(length(col("n")) <= maxBlockChars)
      .select(col("doc_id"), col("bidx"),
        posexplode(split(col("n"), boundaryRe, -1)))
      .toDF("doc_id", "bidx", "sid", "piece")
      .select(col("doc_id"), col("bidx"), col("sid").cast("long").as("sid"),
        trim(col("piece")).as("sentence"))
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
