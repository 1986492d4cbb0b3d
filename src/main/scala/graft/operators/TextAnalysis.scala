package graft.operators

import graft.core.Determinism
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: stopword-based
  * language ID, quality scoring, and document fingerprinting.
  *
  * All pure column expressions (narrow, codegen'd, fused into the scan) and
  * integer-exact so the DuckDB oracle reproduces them bit-for-bit: ratios
  * are emitted at e6 integer scale via floor of an exact int division.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (n-gram-free heuristic lang-ID).
    * Order matters: ties resolve to the earlier language. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"))

  /** Count of tokens that hit a stopword list. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => lower(t).isin(words.map(_.asInstanceOf[Any]): _*)))

  def duckStopwordHits(toksExpr: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, t -> lower(t) IN ($list)))"
  }

  /** Predicted language: argmax of stopword hits, first-profile tie-break;
    * "und" (undetermined) when no profile scores at all. */
  def langId(toks: Column): Column = {
    val scores = LangProfiles.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
  }

  def duckLangId(toksExpr: String): String = {
    val scores = LangProfiles.map { case (lang, words) => lang -> duckStopwordHits(toksExpr, words) }
    val best = scores.map(_._2).reduceRight((a, b) => s"GREATEST($a, $b)")
    // mirror foldRight: first profile wins ties
    scores.foldRight("'und'") { case ((lang, sc), acc) =>
      s"(CASE WHEN $sc = $best AND $best > 0 THEN '$lang' ELSE $acc END)"
    }
  }

  /** e6-scaled exact ratio of two integer columns (0 when denom is 0). */
  def ratioE6(num: Column, denom: Column): Column =
    when(denom === 0, 0L).otherwise(
      floor(num.cast("double") * 1000000.0 / denom.cast("double")).cast("long"))

  def duckRatioE6(num: String, denom: String): String =
    s"(CASE WHEN $denom = 0 THEN 0 ELSE CAST(floor(CAST($num AS DOUBLE) * 1000000.0 / CAST($denom AS DOUBLE)) AS BIGINT) END)"

  /** Composite quality score at e6 scale: mean of (stopword presence,
    * 1 − digitiness, lexical diversity). The single authoritative
    * definition — q31 reports it per-doc, the q94 curation funnel gates
    * on it. Stopword presence uses the first (en) profile deliberately:
    * the score is a "looks like well-formed prose" prior, not a language
    * judgment (that's [[langId]]'s job in the funnel's next stage). */
  def qualityE6(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val nTok = size(toks).cast("long")
    val nAlpha = TextFunctions.alphaCount(text).cast("long")
    val nDigit = TextFunctions.digitCount(text).cast("long")
    val stops = stopwordHits(toks, LangProfiles.head._2).cast("long")
    val uniq = size(array_distinct(toks)).cast("long")
    val stopRatio = ratioE6(stops, nTok)
    val digitRatio = ratioE6(nDigit, nAlpha + nDigit)
    val uniqRatio = ratioE6(uniq, nTok)
    floor((stopRatio + (lit(1000000L) - digitRatio) + uniqRatio) / 3).cast("long")
  }

  def duckQualityE6(textExpr: String, toksExpr: String): String = {
    val nTok = s"len($toksExpr)"
    val nAlpha = TextFunctions.duckAlphaCount(textExpr)
    val nDigit = TextFunctions.duckDigitCount(textExpr)
    val stops = duckStopwordHits(toksExpr, LangProfiles.head._2)
    val uniq = s"len(list_distinct($toksExpr))"
    val stopRatio = duckRatioE6(stops, nTok)
    val digitRatio = duckRatioE6(nDigit, s"($nAlpha + $nDigit)")
    val uniqRatio = duckRatioE6(uniq, nTok)
    s"CAST(floor(($stopRatio + (1000000 - $digitRatio) + $uniqRatio) / 3) AS BIGINT)"
  }

  /** Rolling polynomial fingerprint is engine-internal; the portable
    * document fingerprint is the content hash of normalized text plus a
    * head-window hash (cheap near-head-dup probe). */
  def fingerprintFull(text: Column): Column =
    Determinism.portableHash(TextFunctions.normalizeWs(text))

  def fingerprintHead(text: Column, nTokens: Int): Column =
    Determinism.portableHash(
      concat_ws(" ", slice(TextFunctions.tokens(text), 1, nTokens)))
}
