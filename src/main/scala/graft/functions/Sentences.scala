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
}
