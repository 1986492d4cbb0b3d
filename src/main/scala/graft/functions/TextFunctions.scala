package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression text kit (codegen-friendly; no UDFs on the hot path).
  *
  * Mirrors the reference's structural text primitives: whitespace
  * normalization (reference: src/utils.rs:18-33), the whitespace tokenizer
  * (reference: src/tokenizer.rs:25-65 — structural counts, explicitly not
  * BPE), and sentence counting. Every function here has a DuckDB SQL mirror
  * so oracle-checked queries stay in lock-step.
  */
object TextFunctions {

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  def duckNormalizeWs(e: String): String =
    s"trim(regexp_replace($e, '\\s+', ' ', 'g'))"

  /** Whitespace tokens; empty/blank text yields an empty array (the
    * reference's `split_whitespace` drops empty spans). Single regex pass:
    * split on the normalized text, then drop the one empty token a blank
    * input produces — evaluating `normalizeWs` once, not twice (this
    * expression gets inlined into lambdas/generators where Spark does no
    * common-subexpression elimination, so every extra reference is a full
    * regex pass per row). */
  def tokens(c: Column): Column =
    filter(split(normalizeWs(c), " "), t => t =!= "")

  def duckTokens(e: String): String =
    s"list_filter(string_split(${duckNormalizeWs(e)}, ' '), t -> t <> '')"

  /** Structural token count (reference: src/tokenizer.rs:55-65). */
  def tokenCount(c: Column): Column = size(tokens(c))

  def duckTokenCount(e: String): String = s"len(${duckTokens(e)})"

  /** ASCII-digit count. */
  def digitCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[0-9]", ""))

  def duckDigitCount(e: String): String =
    s"(length($e) - length(regexp_replace($e, '[0-9]', '', 'g')))"

  /** ASCII-alphabetic count (the denoiser's alpha gate uses the same class;
    * reference: denoiser_preprocessor.rs:21-32 counts unicode alphabetic —
    * we standardize on ASCII since the oracle and test corpora are ASCII). */
  def alphaCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Za-z]", ""))

  def duckAlphaCount(e: String): String =
    s"(length($e) - length(regexp_replace($e, '[A-Za-z]', '', 'g')))"

  /** digit / (digit + alpha) ratio, 0.0 when no alphanumerics
    * (reference: denoiser_preprocessor.rs:34-45). */
  def digitRatio(c: Column): Column = {
    val d = digitCount(c).cast("double")
    val a = alphaCount(c).cast("double")
    when(d + a === 0.0, 0.0).otherwise(d / (d + a))
  }

  /** Count of sentence-final punctuation runs — a cheap, oracle-portable
    * stand-in for full sentence segmentation (the exact heuristic splitter
    * lives in [[SentenceSplitter]] as a Scala function). */
  def sentenceMarkCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.!?]+(?:\\s|$)"), lit(0)))

  def duckSentenceMarkCount(e: String): String =
    s"len(regexp_extract_all($e, '[.!?]+(\\s|$$)'))"
}
