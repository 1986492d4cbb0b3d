package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword vocabulary + greedy longest-match-first segmentation
  * — the OTHER production subword scheme next to [[Bpe]] (BERT-family
  * models tokenize with exactly this inference rule; public algorithm,
  * Schuster & Nakajima 2012 / Devlin et al. 2018).
  *
  * Split of work mirrors [[Bpe]] (the production-trainer shape):
  *
  *   1. [[Bpe.wordCounts]] — the ONLY corpus-scale pass: word-frequency
  *      table capped at the top `maxWords` by the deterministic
  *      (count DESC, word ASC) order.
  *   2. [[vocabTable]] — candidate pieces are every ≤`maxPieceLen`-char
  *      substring of the capped words, word-initial substrings plain and
  *      word-internal ones `##`-prefixed (the BERT continuation
  *      convention), weighted by word count. The vocabulary keeps ALL
  *      single-char pieces (minimizing [UNK], as BERT vocabularies do)
  *      plus the top `topMulti` multi-char pieces by (count DESC,
  *      piece ASC). One explode over an already-capped table — driver
  *      never sees the corpus. (Real WordPiece training scores merges by
  *      likelihood; the count-ranked candidate table is our documented
  *      deterministic stand-in — the INFERENCE below is the real
  *      algorithm.)
  *   3. [[segment]] — distributed encode: the bounded vocabulary rides a
  *      broadcast; segmentation is greedy longest-match-first per word
  *      (at each position take the LONGEST vocab piece that prefixes the
  *      remainder; continuation positions match `##` pieces), and a word
  *      with an unmatchable position becomes ONE `[UNK]` piece — BERT's
  *      `is_bad` contract, applied whole-word. One narrow mapPartitions
  *      with a per-partition word memo, exactly the [[Bpe.pieceCounts]]
  *      scale shape.
  *
  * Determinism: the vocabulary is a pure function of the capped word
  * table (total orders everywhere), and greedy longest-match is
  * deterministic by construction — the q121 DuckDB oracle replays it
  * step by step as a recursive CTE over the SAME SQL-derived vocabulary,
  * so the per-doc piece sequences hash-match only if both engines pick
  * identical pieces at every position of every word.
  */
object WordPiece {

  /** The whole-word unknown piece (BERT convention). */
  val Unk = "[UNK]"

  /** Continuation-piece prefix (BERT convention). */
  val ContPrefix = "##"

  /** Candidate piece table from a capped `(word, cnt)` frame: every
    * substring of length 1..`maxPieceLen`, `##`-prefixed when not
    * word-initial, weighted by word count. Emits
    * `(piece, mlen, pcnt)` where `mlen` is the MATCHABLE length (without
    * the `##` prefix). */
  def candidates(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, char_length(word)), s ->
           transform(sequence(1, least($maxPieceLen, char_length(word) - s + 1)), l ->
             struct(CASE WHEN s = 1 THEN substring(word, s, l)
                    ELSE concat('$ContPrefix', substring(word, s, l)) END AS piece,
                    CAST(l AS BIGINT) AS mlen))))""")).as("c"))
      .select(col("c.piece").as("piece"), col("c.mlen").as("mlen"), col("cnt"))
      .groupBy(col("piece"), col("mlen"))
      .agg(sum(col("cnt")).as("pcnt"))

  /** The vocabulary: ALL single-char pieces plus the top `topMulti`
    * multi-char pieces by (pcnt DESC, piece ASC). `(piece, mlen, pcnt)`;
    * bounded rows at any corpus size (the input is the capped word
    * table), so it broadcasts/collects freely. */
  def vocabTable(words: DataFrame, maxPieceLen: Int, topMulti: Int): DataFrame = {
    val cand = candidates(words, maxPieceLen)
    val singles = cand.filter(col("mlen") === 1L)
    val multi = cand.filter(col("mlen") > 1L)
      .orderBy(col("pcnt").desc, col("piece").asc).limit(topMulti)
    singles.unionByName(multi)
  }

  /** Codepoint split (agrees with the SQL oracle's per-character ops). */
  private def codepoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Greedy longest-match-first segmentation of one word. `init` holds
    * word-initial pieces (plain), `cont` continuation pieces WITHOUT the
    * `##` prefix; emitted continuation pieces carry the prefix. A word
    * with any unmatchable position is ONE `[UNK]`. Pure — safe inside
    * mapPartitions. */
  def encodeWord(w: String, init: Set[String], cont: Set[String],
      maxPieceLen: Int): Vector[String] = {
    val cps = codepoints(w)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      val limit = math.min(maxPieceLen, cps.length - i)
      var l = limit
      var hit = 0
      while (l >= 1 && hit == 0) {
        val cand = cps.slice(i, i + l).mkString
        val ok = if (i == 0) init.contains(cand) else cont.contains(cand)
        if (ok) hit = l else l -= 1
      }
      if (hit == 0) return Vector(Unk)
      val piece = cps.slice(i, i + hit).mkString
      out += (if (i == 0) piece else ContPrefix + piece)
      i += hit
    }
    out.result()
  }

  /** Distributed segmentation digest under a bounded vocabulary:
    * `(doc_id, n_words, n_pieces, n_unk_words, head_pieces_hash)` — the
    * hash covers the doc's first `headK` pieces in order (the q56
    * convention: pins the piece STRINGS, not just counts). `vocab` rows
    * are `(piece, mlen)`; bounded, so they broadcast. */
  def segment(spark: SparkSession, docs: DataFrame,
      vocab: Seq[(String, Long)], maxPieceLen: Int, headK: Int = 12,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val init = vocab.collect { case (p, _) if !p.startsWith(ContPrefix) => p }.toSet
    val cont = vocab.collect {
      case (p, _) if p.startsWith(ContPrefix) => p.substring(ContPrefix.length)
    }.toSet
    val bc = spark.sparkContext.broadcast((init, cont))
    docs
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val (ini, con) = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, ws) =>
          var n = 0L
          var unk = 0L
          val head = Vector.newBuilder[String]
          var kept = 0
          ws.foreach { w =>
            val pieces = memo.getOrElseUpdate(w, encodeWord(w, ini, con, maxPieceLen))
            n += pieces.length
            if (pieces.length == 1 && pieces.head == Unk) unk += 1
            if (kept < headK) {
              val take = math.min(headK - kept, pieces.length)
              head ++= pieces.take(take)
              kept += take
            }
          }
          (id, ws.length.toLong, n, unk,
            graft.core.Determinism.jvmHash(head.result().mkString(" ")))
        }
      }.toDF("doc_id", "n_words", "n_pieces", "n_unk_words", "head_pieces_hash")
  }

  // ------------------------------------------------------------------
  // DuckDB oracle fragments.
  // ------------------------------------------------------------------

  /** Vocabulary CTEs over `documents`: capped word counts → candidate
    * pieces → `wp_vocab(piece, mlen, pcnt)`. Lock-step with
    * [[Bpe.wordCounts]] + [[vocabTable]]. */
  def duckVocabCtes(maxWords: Int, maxPieceLen: Int, topMulti: Int): String =
    s"""wp_words AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(${TextFunctions.duckTokens("lower(text)")}) AS word
        FROM documents) t
      GROUP BY word ORDER BY cnt DESC, word LIMIT $maxWords
    ), wp_cand AS (
      SELECT CASE WHEN s = 1 THEN substr(word, s, l)
             ELSE '$ContPrefix' || substr(word, s, l) END AS piece,
        CAST(l AS BIGINT) AS mlen, cnt
      FROM wp_words,
        LATERAL (SELECT unnest(generate_series(1, length(word))) AS s),
        LATERAL (SELECT unnest(generate_series(1,
          least($maxPieceLen, length(word) - s + 1))) AS l)
    ), wp_cagg AS (
      SELECT piece, mlen, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM wp_cand GROUP BY piece, mlen
    ), wp_vocab AS MATERIALIZED (
      SELECT piece, mlen, pcnt FROM wp_cagg WHERE mlen = 1
      UNION ALL
      SELECT piece, mlen, pcnt FROM (
        SELECT piece, mlen, pcnt FROM wp_cagg WHERE mlen > 1
        ORDER BY pcnt DESC, piece LIMIT $topMulti) t
    )"""

  /** Greedy longest-match replay as a recursive CTE: per DISTINCT word,
    * march through the remainder taking the longest matching vocab piece
    * (word-initial list at position 0, stripped continuation list after),
    * flagging the word bad when no piece matches. Emits
    * `wp_fin(w, pieces, np, unk)`; requires [[duckVocabCtes]] relations
    * and must live under `WITH RECURSIVE`. */
  def duckEncodeCtes(maxPieceLen: Int): String = {
    val mlExpr =
      s"""list_max(list_transform(
           CASE WHEN len(pieces) = 0
             THEN (SELECT list(piece) FROM wp_vocab WHERE piece NOT LIKE '$ContPrefix%')
             ELSE (SELECT list(substr(piece, ${ContPrefix.length + 1}))
                   FROM wp_vocab WHERE piece LIKE '$ContPrefix%') END,
           p -> CASE WHEN starts_with(rem, p) THEN length(p) ELSE 0 END))"""
    s"""wp_occ AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS idx, unnest(toks) AS w
      FROM (SELECT doc_id,
        ${TextFunctions.duckTokens("lower(text)")} AS toks FROM documents)
    ), wp_dw AS (
      SELECT DISTINCT w FROM wp_occ
    ), wp_enc(w, pieces, rem, bad) AS (
      SELECT w, CAST([] AS VARCHAR[]), w, 0 FROM wp_dw
      UNION ALL
      SELECT w,
        CASE WHEN ml = 0 THEN pieces
             WHEN len(pieces) = 0 THEN list_append(pieces, substr(rem, 1, ml))
             ELSE list_append(pieces, '$ContPrefix' || substr(rem, 1, ml)) END,
        CASE WHEN ml = 0 THEN '' ELSE substr(rem, ml + 1) END,
        CASE WHEN ml = 0 THEN 1 ELSE bad END
      FROM (SELECT w, pieces, rem, bad, coalesce($mlExpr, 0) AS ml
            FROM wp_enc WHERE rem <> '') t
    ), wp_fin AS (
      SELECT w,
        CASE WHEN bad = 1 THEN ['$Unk'] ELSE pieces END AS pieces,
        CAST(CASE WHEN bad = 1 THEN 1 ELSE len(pieces) END AS BIGINT) AS np,
        CAST(bad AS BIGINT) AS unk
      FROM wp_enc WHERE rem = ''
    )"""
  }
}
