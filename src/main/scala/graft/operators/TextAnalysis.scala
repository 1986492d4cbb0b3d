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

  /** The GOPHER quality rules (Rae et al. 2021, Appendix A1.1 — the
    * named rule set most web-scale pipelines start from), as exact
    * integer metrics plus the combined gate:
    *   1. word count in [50, 100000];
    *   2. mean word length in [3, 10] characters;
    *   3. `#`/`...` symbol-to-word ratio ≤ 0.1;
    *   4. ≤ 10% of lines start with a bullet, ≤ 30% end with `...`;
    *   5. ≥ 80% of words contain an alphabetic character;
    *   6. ≥ 2 distinct required stop words present.
    * Ratios are e6 floors (mean word length e3), so the gate is
    * bit-stable cross-engine; all metrics are scan-fused column
    * algebra over one tokenization + one line split. Returns a struct
    * `(n_words, mwl_e3, sym_e6, bullet_e6, ellipsis_e6, alpha_e6,
    * n_stop, pass)`. */
  def gopherMetrics(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val nW = size(toks).cast("long")
    val charSum = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (a, v) => a + v)
    val mwlE3 = when(nW === 0, 0L)
      .otherwise(floor(charSum.cast("double") * 1000.0 / nW.cast("double")).cast("long"))
    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nEll = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val symE6 = ratioE6(nHash + nEll, nW)
    val lines = filter(split(text, "\n"), l => l =!= "")
    val nL = size(lines).cast("long")
    val bulletE6 = ratioE6(size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* "))).cast("long"), nL)
    val ellLineE6 = ratioE6(size(filter(lines, l => l.endsWith("..."))).cast("long"), nL)
    val alphaE6 = ratioE6(size(filter(toks, w => w.rlike("[a-zA-Z]"))).cast("long"), nW)
    val nStop = size(array_intersect(array_distinct(toks),
      array(GopherStops.map(lit): _*))).cast("long")
    val pass = (nW >= 50L && nW <= 100000L &&
      mwlE3 >= 3000L && mwlE3 <= 10000L &&
      symE6 <= 100000L && bulletE6 <= 100000L && ellLineE6 <= 300000L &&
      alphaE6 >= 800000L && nStop >= 2L).cast("long")
    struct(nW.as("n_words"), mwlE3.as("mwl_e3"), symE6.as("sym_e6"),
      bulletE6.as("bullet_e6"), ellLineE6.as("ellipsis_e6"),
      alphaE6.as("alpha_e6"), nStop.as("n_stop"), pass.as("pass"))
  }

  /** The rule set's required stop words (Rae et al. A1.1). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** DuckDB twin of [[gopherMetrics]] — emits the struct fields as a
    * SELECT-fragment over `textExpr`/`toksExpr` column expressions. */
  def duckGopherFields(textExpr: String, toksExpr: String): String = {
    val nW = s"len($toksExpr)"
    val charSum = s"coalesce(list_sum(list_transform($toksExpr, w -> length(w))), 0)"
    val mwlE3 = s"(CASE WHEN $nW = 0 THEN 0 ELSE " +
      s"CAST(floor(CAST($charSum AS DOUBLE) * 1000.0 / $nW) AS BIGINT) END)"
    val nHash = s"(length($textExpr) - length(replace($textExpr, '#', '')))"
    val nEll = s"((length($textExpr) - length(replace($textExpr, '...', ''))) // 3)"
    val symE6 = duckRatioE6(s"($nHash + $nEll)", nW)
    val lines = s"list_filter(string_split($textExpr, chr(10)), l -> l <> '')"
    val nL = s"len($lines)"
    val bulletE6 = duckRatioE6(
      s"len(list_filter($lines, l -> starts_with(l, chr(8226)) OR " +
        s"starts_with(l, '- ') OR starts_with(l, '* ')))", nL)
    val ellLineE6 = duckRatioE6(
      s"len(list_filter($lines, l -> l LIKE '%...'))", nL)
    val alphaE6 = duckRatioE6(
      s"len(list_filter($toksExpr, w -> regexp_matches(w, '[a-zA-Z]')))", nW)
    val stops = GopherStops.map(w => s"'$w'").mkString(", ")
    val nStop = s"len(list_intersect(list_distinct($toksExpr), [$stops]))"
    s"""CAST($nW AS BIGINT) AS n_words, $mwlE3 AS mwl_e3,
      $symE6 AS sym_e6, $bulletE6 AS bullet_e6, $ellLineE6 AS ellipsis_e6,
      $alphaE6 AS alpha_e6, CAST($nStop AS BIGINT) AS n_stop,
      CAST(CASE WHEN $nW >= 50 AND $nW <= 100000
        AND $mwlE3 >= 3000 AND $mwlE3 <= 10000
        AND $symE6 <= 100000 AND $bulletE6 <= 100000 AND $ellLineE6 <= 300000
        AND $alphaE6 >= 800000 AND $nStop >= 2
        THEN 1 ELSE 0 END AS BIGINT) AS pass"""
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
