package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** OCR denoiser: three line-level gates
  * (reference: preprocessor/backends/denoiser_preprocessor.rs:221-268,
  * config src/config.rs:12-42).
  *
  *  Gate 1 — GFM pipe-table rows: separator rows (only `| - : `/tab)
  *           dropped; header/data rows have pipes stripped, cell text joined
  *           by single spaces and passed to gates 2–3.
  *  Gate 2 — lines with zero alphabetic characters dropped.
  *  Gate 3 — lines whose digit/(digit+alpha) ratio exceeds the threshold are
  *           rescued by iterative wave expansion from alpha-token seeds:
  *           each wave adds ±1 neighbors of kept tokens if the cumulative
  *           ratio stays within budget; otherwise the line keeps only what
  *           survived so far (dropped when nothing survives).
  *
  * Returns None when every line is removed → the section produces no chunks.
  *
  * The per-line state machine is genuinely loop-carried, so this stays a
  * Scala function registered as a UDF — invoked once per section before
  * chunking (narrow stage, no shuffle). Everything around it remains
  * column expressions.
  */
case class DenoiserConfig(
    enabled: Boolean = true,
    maxDigitRatio: Double = 0.35,
    stripMarkdown: Boolean = true)

object Denoiser {

  private def countDigitAlpha(s: String): (Int, Int) = {
    var d = 0; var a = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') d += 1
      else if (Character.isLetter(ch)) a += 1
      i += 1
    }
    (d, a)
  }

  private def digitRatio(s: String): Double = {
    val (d, a) = countDigitAlpha(s)
    val total = d + a
    if (total == 0) 0.0 else d.toDouble / total
  }

  private def isTableLine(line: String): Boolean = {
    val t = line.trim
    t.startsWith("|") && t.count(_ == '|') >= 2
  }

  private def isTableSeparator(line: String): Boolean = {
    val t = line.trim
    t.startsWith("|") && t.count(_ == '|') >= 2 &&
      t.forall(c => c == '|' || c == '-' || c == ':' || c == ' ' || c == '\t')
  }

  private def stripTablePipes(line: String): String =
    line.split('|').map(_.trim).filter(_.nonEmpty).mkString(" ")

  /** Wave-expansion token rescue for a digit-heavy line. */
  private[graft] def stripDigitTokens(line: String, maxDigitRatio: Double): String = {
    val tokens = line.split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) return ""
    val n = tokens.length
    val counts = tokens.map(countDigitAlpha)
    val keep = tokens.map(_.exists(Character.isLetter))
    var d = 0; var a = 0
    for (i <- 0 until n if keep(i)) { d += counts(i)._1; a += counts(i)._2 }
    var expanding = true
    while (expanding) {
      val wave = (0 until n).filter(i =>
        !keep(i) && ((i > 0 && keep(i - 1)) || (i + 1 < n && keep(i + 1))))
      if (wave.isEmpty) expanding = false
      else {
        var wd = 0; var wa = 0
        wave.foreach { i => wd += counts(i)._1; wa += counts(i)._2 }
        val nd = d + wd; val na = a + wa
        val ratio = if (nd + na == 0) 0.0 else nd.toDouble / (nd + na)
        if (ratio > maxDigitRatio) expanding = false
        else { wave.foreach(keep(_) = true); d = nd; a = na }
      }
    }
    tokens.indices.filter(keep).map(tokens).mkString(" ")
  }

  /** Full denoise; None means drop the whole section. */
  def denoiseText(text: String, cfg: DenoiserConfig): Option[String] = {
    if (!cfg.enabled) return Some(text)
    val normalized = text.replace("\r\n", "\n").replace('\r', '\n')
    val cleaned = normalized.split('\n').toSeq.flatMap { line =>
      val effective =
        if (cfg.stripMarkdown && isTableLine(line)) {
          if (isTableSeparator(line)) None // layout-only row: drop
          else Some(stripTablePipes(line))
        } else Some(line)
      effective.flatMap { eff =>
        val (_, alpha) = countDigitAlpha(eff)
        if (alpha == 0) None
        else if (digitRatio(eff) > cfg.maxDigitRatio) {
          val retained = stripDigitTokens(eff, cfg.maxDigitRatio)
          if (retained.nonEmpty) Some(retained) else None
        } else Some(eff)
      }
    }
    if (cleaned.isEmpty) None else Some(cleaned.mkString("\n"))
  }

  /** Column form: null when the section is dropped. */
  def denoiseUdf(cfg: DenoiserConfig): Column => Column = {
    val f = udf((s: String) =>
      if (s == null) None else denoiseText(s, cfg))
    c => f(c)
  }

  /** Preprocessor-chain form for [[graft.operators.ChunkingStrategy]]. */
  def preprocessor(cfg: DenoiserConfig): String => Option[String] =
    s => denoiseText(s, cfg)
}
