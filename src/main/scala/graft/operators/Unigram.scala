package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece's model; Kudo 2018 —
  * public algorithm), completing the production tokenizer trio next to
  * [[Bpe]] (merge rules) and [[WordPiece]] (longest-match): segmentation
  * here is GLOBALLY optimal per word — Viterbi over per-piece costs —
  * rather than greedy.
  *
  * Split of work is the [[Bpe]] shape:
  *
  *   1. [[Bpe.wordCounts]] — the only corpus pass (capped word table).
  *   2. [[train]] — hard-EM (Viterbi-EM) over the capped table on the
  *      driver, corpus-size independent: seed vocabulary = all single
  *      chars + the top multi-char substrings by weighted count; each
  *      round scores pieces by `cost(p) = floor(1e6·ln(total/count))`
  *      (integer costs — exact to compare and sum), Viterbi-segments
  *      every word, re-counts pieces by actual USE, prunes unused
  *      multi-char pieces. (Full SentencePiece uses soft EM over all
  *      segmentations + likelihood-loss pruning; hard EM is the
  *      documented deterministic variant — the INFERENCE below is the
  *      real Viterbi.)
  *   3. [[segment]] — distributed encode: the pinned `(piece, cost)`
  *      table broadcasts; one narrow mapPartitions with per-partition
  *      word memo Viterbi-segments each word. A word containing a
  *      character outside the vocabulary is ONE `[UNK]` (same contract
  *      as [[WordPiece]]).
  *
  * Determinism: integer costs; DP tie-break is fixed — at equal total
  * cost prefer the LONGER last piece at every position. The q123 oracle
  * replays the exact forward DP + backtrace as recursive CTEs under the
  * same pinned cost map, so segmentations hash-match only if both
  * engines pick identical optimal paths (including ties). Costs are
  * pinned constants ([[PinnedVocab]], retrain-asserted in spec), so no
  * transcendental is ever compared across engines.
  */
object Unigram {

  val Unk = "[UNK]"

  /** Codepoint split (agrees with the SQL oracle's substr semantics). */
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

  /** Viterbi segmentation of one word under integer piece costs: the
    * minimum-total-cost split; at equal cost the LONGER last piece wins
    * at every DP position. Returns None when a position has no matching
    * piece (callers map that to [[Unk]]). Pure. */
  def viterbi(w: String, costs: Map[String, Long], maxPieceLen: Int): Option[Vector[String]] = {
    val cps = codepoints(w)
    val n = cps.length
    if (n == 0) return Some(Vector.empty)
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var pos = 1
    while (pos <= n) {
      var l = 1
      val lim = math.min(maxPieceLen, pos)
      while (l <= lim) {
        if (best(pos - l) != Long.MaxValue) {
          val piece = cps.slice(pos - l, pos).mkString
          costs.get(piece) match {
            case Some(c) =>
              val cand = best(pos - l) + c
              // strictly better, or equal cost with a longer last piece
              if (cand < best(pos) || (cand == best(pos) && l > back(pos))) {
                best(pos) = cand; back(pos) = l
              }
            case None =>
          }
        }
        l += 1
      }
      // an unreachable intermediate prefix is NOT failure — a longer
      // piece can span it (vocab {ab}, word "ab": prefix "a" unreachable,
      // the word still segments); only the full word decides
      pos += 1
    }
    if (best(n) == Long.MaxValue) return None
    // backtrace
    val out = List.newBuilder[String]
    var p = n
    var acc = List.empty[String]
    while (p > 0) {
      val l = back(p)
      acc = cps.slice(p - l, p).mkString :: acc
      p -= l
    }
    val _ = out
    Some(acc.toVector)
  }

  /** Hard-EM (Viterbi-EM) training over a capped word-count table.
    * Driver-side by design (input is the [[Bpe.wordCounts]] cap). Seed =
    * all single codepoints + top `seedTopN` multi-char substrings (length
    * ≤ `maxPieceLen`) by (weighted count DESC, piece ASC); each of
    * `rounds` rounds re-costs pieces from current counts, re-segments
    * every word by [[viterbi]], re-counts pieces by USE (word-count
    * weighted), drops unused multi-char pieces and caps them at
    * `keepTopV`. Single chars never drop (they guarantee totality on
    * seen characters; unused ones keep count 1). Returns the final
    * `(piece, cost_e6)` table sorted by (piece). */
  def train(wordCounts: Seq[(String, Long)], maxPieceLen: Int = 6,
      seedTopN: Int = 150, rounds: Int = 2, keepTopV: Int = 120): Seq[(String, Long)] = {
    val words = wordCounts.map { case (w, c) => (codepoints(w), c) }
    // seed counts: every substring occurrence, weighted
    val seedCnt = scala.collection.mutable.HashMap.empty[String, Long]
    for ((cps, c) <- words; i <- cps.indices;
         l <- 1 to math.min(maxPieceLen, cps.length - i)) {
      val p = cps.slice(i, i + l).mkString
      seedCnt.update(p, seedCnt.getOrElse(p, 0L) + c)
    }
    val singles = seedCnt.keysIterator.filter(p => codepoints(p).length == 1).toVector.sorted
    def capMulti(cnt: collection.Map[String, Long], top: Int): Vector[(String, Long)] =
      cnt.iterator.filter { case (p, _) => codepoints(p).length > 1 }
        .toVector.sortBy { case (p, c) => (-c, p) }.take(top)
    var counts: Map[String, Long] =
      (singles.map(p => p -> seedCnt(p)) ++ capMulti(seedCnt, seedTopN)).toMap
    def costsOf(cnt: Map[String, Long]): Map[String, Long] = {
      val total = cnt.valuesIterator.sum
      cnt.map { case (p, c) =>
        // StrictMath: java.lang.Math.log is only pinned to 1 ulp and may
        // differ across JDK/platform; a value near a floor(1e6*ln)
        // boundary would flip a pinned cost. StrictMath is bit-identical
        // everywhere, so the e6 lattice is portable.
        p -> math.floor(1e6 * StrictMath.log(total.toDouble / c)).toLong
      }
    }
    var r = 0
    while (r < rounds) {
      val costs = costsOf(counts)
      val use = scala.collection.mutable.HashMap.empty[String, Long]
      for ((cps, c) <- words) {
        viterbi(cps.mkString, costs, maxPieceLen).foreach { pieces =>
          pieces.foreach(p => use.update(p, use.getOrElse(p, 0L) + c))
        }
      }
      counts = (singles.map(p => p -> math.max(use.getOrElse(p, 0L), 1L)) ++
        capMulti(use, keepTopV)).toMap
      r += 1
    }
    costsOf(counts).toVector.sortBy(_._1)
  }

  /** SOFT-EM training — the full SentencePiece algorithm (Kudo 2018 §3.2,
    * public literature), next to [[train]]'s hard-EM variant: the E-step
    * computes EXPECTED piece counts over ALL segmentations of each word
    * by lattice forward–backward (not just the Viterbi path), the M-step
    * renormalizes, and pruning is by LIKELIHOOD LOSS — each multi-char
    * piece scores Σ_w c_w·(ln Z_w − ln Z_w^{¬p}), the corpus-likelihood
    * drop if the piece were removed (recomputing the forward pass with
    * θ(p)=0), and the top `keepTopV` by (loss DESC, piece ASC) survive;
    * single codepoints never drop (totality floor 1e-9).
    *
    * Determinism: driver-side only (the capped table), StrictMath
    * transcendentals, and FIXED summation order everywhere (words in
    * input order, positions ascending, piece length ascending) — double
    * arithmetic is bit-stable across JVMs, so the pinned vocabulary
    * ([[PinnedSoftVocab]]) is retrain-assertable exactly like the
    * hard-EM pin. INFERENCE is unchanged: the emitted `(piece, cost_e6)`
    * table drives the same integer-cost [[viterbi]]/[[segment]] (also
    * SentencePiece's default decode), so the q131 lane oracle-replays
    * segmentation under the soft-trained costs with zero float compares.
    *
    * Returns the final `(piece, cost_e6)` table, `cost = floor(−1e6·ln θ)`
    * (the hard-EM formula with expected in place of Viterbi counts). */
  def trainSoft(wordCounts: Seq[(String, Long)], maxPieceLen: Int = 6,
      seedTopN: Int = 150, rounds: Int = 2, emIters: Int = 2,
      keepTopV: Int = 120): Seq[(String, Long)] = {
    val words = wordCounts.map { case (w, c) => (codepoints(w), c) }
    val Floor = 1e-9
    // seed identical to the hard-EM trainer
    val seedCnt = scala.collection.mutable.HashMap.empty[String, Long]
    for ((cps, c) <- words; i <- cps.indices;
         l <- 1 to math.min(maxPieceLen, cps.length - i)) {
      val p = cps.slice(i, i + l).mkString
      seedCnt.update(p, seedCnt.getOrElse(p, 0L) + c)
    }
    val singles = seedCnt.keysIterator.filter(p => codepoints(p).length == 1).toVector.sorted
    val seedMulti = seedCnt.iterator.filter { case (p, _) => codepoints(p).length > 1 }
      .toVector.sortBy { case (p, c) => (-c, p) }.take(seedTopN).map(_._1)
    var pieces: Vector[String] = (singles ++ seedMulti).sorted
    var theta: Map[String, Double] = {
      val tot = pieces.iterator.map(p => seedCnt(p).toDouble).sum
      pieces.iterator.map(p => p -> seedCnt(p).toDouble / tot).toMap
    }
    // lattice forward under θ (piece absent or θ=0 ⇒ skipped); fixed
    // ascending (pos, len) order keeps the double sums bit-stable
    def forward(cps: Vector[String], th: Map[String, Double],
        skip: String): Array[Double] = {
      val n = cps.length
      val a = new Array[Double](n + 1)
      a(0) = 1.0
      var j = 1
      while (j <= n) {
        var acc = 0.0
        var l = 1
        val lim = math.min(maxPieceLen, j)
        while (l <= lim) {
          if (a(j - l) != 0.0) {
            val p = cps.slice(j - l, j).mkString
            if (p != skip) th.get(p).foreach(t => acc += a(j - l) * t)
          }
          l += 1
        }
        a(j) = acc
        j += 1
      }
      a
    }
    def backward(cps: Vector[String], th: Map[String, Double]): Array[Double] = {
      val n = cps.length
      val b = new Array[Double](n + 1)
      b(n) = 1.0
      var i = n - 1
      while (i >= 0) {
        var acc = 0.0
        var l = 1
        val lim = math.min(maxPieceLen, n - i)
        while (l <= lim) {
          if (b(i + l) != 0.0) {
            val p = cps.slice(i, i + l).mkString
            th.get(p).foreach(t => acc += t * b(i + l))
          }
          l += 1
        }
        b(i) = acc
        i -= 1
      }
      b
    }
    var r = 0
    while (r < rounds) {
      // EM sub-iterations: expected counts by forward–backward
      var it = 0
      while (it < emIters) {
        val ec = scala.collection.mutable.HashMap.empty[String, Double]
        for ((cps, c) <- words) {
          val n = cps.length
          val a = forward(cps, theta, skip = "")
          val b = backward(cps, theta)
          val z = a(n)
          if (z > 0.0) {
            var i = 0
            while (i < n) {
              var l = 1
              val lim = math.min(maxPieceLen, n - i)
              while (l <= lim) {
                val p = cps.slice(i, i + l).mkString
                theta.get(p).foreach { t =>
                  val post = a(i) * t * b(i + l) / z
                  if (post != 0.0) ec.update(p, ec.getOrElse(p, 0.0) + c * post)
                }
                l += 1
              }
              i += 1
            }
          }
        }
        // M-step over the CURRENT piece set, totality floor for singles
        val kept = pieces.map(p => p ->
          (if (codepoints(p).length == 1) math.max(ec.getOrElse(p, 0.0), Floor)
           else ec.getOrElse(p, 0.0)))
        val tot = kept.iterator.map(_._2).sum
        theta = kept.iterator.map { case (p, e) => p -> e / tot }.toMap
        it += 1
      }
      // likelihood-loss pruning of multi-char pieces
      val multi = pieces.filter(p => codepoints(p).length > 1 && theta(p) > 0.0)
      val baseLL = words.iterator.map { case (cps, c) =>
        val z = forward(cps, theta, skip = "").last
        if (z > 0.0) c * StrictMath.log(z) else 0.0
      }.sum
      val losses = multi.map { p =>
        val ll = words.iterator.map { case (cps, c) =>
          // skip recomputation for words the piece cannot touch
          if (!cps.mkString.contains(p)) {
            val z = forward(cps, theta, skip = "").last
            if (z > 0.0) c * StrictMath.log(z) else 0.0
          } else {
            val z = forward(cps, theta, skip = p).last
            if (z > 0.0) c * StrictMath.log(z)
            else Double.NegativeInfinity // indispensable (cannot happen: singles cover)
          }
        }.sum
        p -> (baseLL - ll)
      }
      val keptMulti = losses.sortBy { case (p, loss) => (-loss, p) }
        .take(keepTopV).map(_._1)
      pieces = (singles ++ keptMulti).sorted
      val mass = pieces.iterator.map(theta).sum
      theta = pieces.iterator.map(p => p -> theta(p) / mass).toMap
      r += 1
    }
    pieces.map(p =>
      p -> math.floor(-1e6 * StrictMath.log(theta(p))).toLong).sortBy(_._1)
  }

  /** The corpus-pinned SOFT-EM vocabulary (q131 lane) — trained from the
    * same sf0.001 word table as [[PinnedVocab]] with [[trainSoft]]
    * defaults; retrain-asserted in UnigramSpec, regenerate via
    * `RepinUnigram`. */
  lazy val PinnedSoftVocab: Seq[(String, Long)] = PinnedSoftVocabData.rows

  /** Distributed segmentation digest under a pinned `(piece, cost)`
    * table: `(doc_id, n_words, n_pieces, n_unk_words, head_pieces_hash)`
    * — same shape/convention as [[WordPiece.segment]]; the hash pins the
    * doc's first `headK` piece STRINGS in order. */
  def segment(spark: SparkSession, docs: DataFrame, vocab: Seq[(String, Long)],
      maxPieceLen: Int = 6, headK: Int = 12, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    docs
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val costs = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, ws) =>
          var n = 0L
          var unk = 0L
          val head = Vector.newBuilder[String]
          var kept = 0
          ws.foreach { w =>
            val pieces = memo.getOrElseUpdate(w,
              viterbi(w, costs, maxPieceLen).getOrElse(Vector(Unk)))
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

  /** The corpus-pinned vocabulary the q123 lane and its oracle share —
    * trained from `Bpe.wordCounts(documents @ sf0.001, maxWords = 300)`
    * with the [[train]] defaults. UnigramSpec retrains and asserts
    * equality; re-pin only for an intentional trainer change. Set by
    * `sbt "runMain graft.tools.RepinUnigram"`-style throwaway if needed. */
  lazy val PinnedVocab: Seq[(String, Long)] = PinnedVocabData.rows

  /** DuckDB `MAP {'piece': cost}` literal. */
  def duckCostMap(vocab: Seq[(String, Long)]): String = {
    def esc(s: String) = s.replace("'", "''")
    "MAP {" + vocab.map { case (p, c) => s"'${esc(p)}': CAST($c AS BIGINT)" }
      .mkString(", ") + "}"
  }

  /** Viterbi replay as recursive CTEs under the pinned cost map: a
    * forward DP carrying the per-prefix best-cost and chosen-length
    * lists, then a backtrace recursion reconstructing the piece strings.
    * Tie-break matches [[viterbi]]: at equal cost the longer last piece
    * wins (the candidate sort key is `[cost, -l]`). Emits
    * `ug_fin(w, pieces, np, unk)`; must live under `WITH RECURSIVE` and
    * needs `ug_occ`/`ug_dw` (same shapes as the WordPiece oracle). */
  def duckEncodeCtes(vocab: Seq[(String, Long)], maxPieceLen: Int): String = {
    val cm = duckCostMap(vocab)
    // candidates at prefix length pos+1: l in 1..min(maxLen, pos+1),
    // piece = substr(w, pos-l+2, l), cumulative = best[pos-l+2] + cost(p)
    // (the costs list is 1-based: costs[k] = best cost of prefix k-1)
    val candsExpr =
      s"""list_sort(list_filter(
           list_transform(generate_series(1, least($maxPieceLen, pos + 1)), l ->
             [($cm[substr(w, pos - l + 2, l)])[1] + costs[pos - l + 2],
              CAST(-l AS BIGINT)]),
           x -> x[1] IS NOT NULL))[1]"""
    s"""ug_occ AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS idx, unnest(toks) AS w
      FROM (SELECT doc_id,
        ${TextFunctions.duckTokens("lower(text)")} AS toks FROM documents)
    ), ug_dw AS (
      SELECT DISTINCT w FROM ug_occ
    ), ug_fwd(w, pos, costs, lens) AS (
      -- costs[k] = best total cost of the length-(k-1) prefix (NULL =
      -- unreachable; an unreachable INTERMEDIATE prefix is not failure —
      -- a longer piece can span it — so the walk always runs to the end)
      SELECT w, 0, [CAST(0 AS BIGINT)], CAST([] AS BIGINT[]) FROM ug_dw
      UNION ALL
      SELECT w, pos + 1,
        list_append(costs, best[1]),
        list_append(lens, coalesce(-best[2], CAST(0 AS BIGINT)))
      FROM (SELECT w, pos, costs, lens, $candsExpr AS best
            FROM ug_fwd WHERE pos < length(w)) t
    ), ug_done AS (
      SELECT w, lens,
        CASE WHEN costs[length(w) + 1] IS NULL THEN 1 ELSE 0 END AS bad
      FROM ug_fwd WHERE pos = length(w)
    ), ug_back(w, pos, pieces) AS (
      SELECT w, CASE WHEN bad = 1 THEN 0 ELSE length(w) END,
        CAST([] AS VARCHAR[])
      FROM ug_done
      UNION ALL
      SELECT b.w, b.pos - CAST(d.lens[b.pos] AS INTEGER),
        [substr(b.w, b.pos - CAST(d.lens[b.pos] AS INTEGER) + 1,
          CAST(d.lens[b.pos] AS INTEGER))] || b.pieces
      FROM ug_back b JOIN ug_done d ON b.w = d.w
      WHERE b.pos > 0
    ), ug_fin AS (
      SELECT d.w,
        CASE WHEN d.bad = 1 THEN ['$Unk'] ELSE b.pieces END AS pieces,
        CAST(CASE WHEN d.bad = 1 THEN 1 ELSE len(b.pieces) END AS BIGINT) AS np,
        CAST(d.bad AS BIGINT) AS unk
      FROM ug_done d JOIN ug_back b ON b.w = d.w AND b.pos = 0
    )"""
  }
}
