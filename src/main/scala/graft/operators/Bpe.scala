package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding subword vocabulary: training and encoding,
  * Spark-first.
  *
  * The reference's tokenizer counts whitespace tokens
  * (src/tokenizer.rs:55-65); a training-data pipeline additionally needs
  * SUBWORD vocabularies (token budgets, sequence packing, capacity
  * planning are all piece-denominated). The split of work follows how
  * production tokenizer trainers operate (Sennrich et al. 2016; public
  * BPE algorithm):
  *
  *   1. [[wordCounts]] — the corpus-scale half: one explode + map-side-
  *      combined hash aggregate to a word-frequency table, capped at the
  *      top `maxWords` rows by (count DESC, word ASC) — a deterministic
  *      total order, and the ONLY pass that touches the corpus.
  *   2. [[train]] — greedy merge learning over the bounded word table on
  *      the driver (cost ∝ vocab × merges, independent of corpus size —
  *      the standard design: production trainers also learn from
  *      word-frequency tables, never raw corpora).
  *   3. [[pieceCounts]] — distributed encode: merge ranks broadcast, one
  *      narrow mapPartitions with a per-partition word memo (corpus words
  *      repeat heavily, so each distinct word is encoded once per
  *      partition, not once per occurrence).
  *
  * Determinism end to end: pair ties break to the lexicographically
  * smallest pair, the word-table cap is a total order, and the encoder
  * merges the LEFTMOST occurrence of the lowest-rank pair per step — the
  * exact rule the q54 DuckDB recursive-CTE oracle replays symbol by
  * symbol. On a trained rank table this greedy loop reproduces the
  * training segmentation (a learned pair's parts always have lower ranks
  * than the pair itself, so rank order is consistent with creation
  * order).
  */
object Bpe {

  /** End-of-word marker symbol (the classic `</w>` convention) — contains
    * no whitespace, so `"left right"` rank keys stay unambiguous. */
  val Eow = "</w>"

  /** Codepoint symbols of `w` plus the end-of-word marker (codepoints,
    * not UTF-16 chars, so the SQL oracle's per-character split agrees). */
  def initial(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    (b += Eow).result()
  }

  /** Word-frequency table: lower-cased whitespace tokens → occurrence
    * counts, top `maxWords` by (count DESC, word ASC). One Generate + one
    * map-side-combined aggregate + TakeOrdered — at 100 TB this is the
    * only corpus-wide pass in the whole training flow, and the cap bounds
    * what the driver ever sees. */
  def wordCounts(docs: DataFrame, textCol: String = "text",
      maxWords: Int = 2000): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)

  /** Merge `l`+`r` left-to-right, non-overlapping (the training-side
    * application rule). */
  private[operators] def applyMerge(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE training over a word-frequency table: each round counts
    * adjacent symbol pairs weighted by word frequency, merges the most
    * frequent pair everywhere (ties → lexicographically smallest pair),
    * and stops after `nMerges` or when the best pair drops below
    * `minPairCount`. Driver-side by design — the input is the CAPPED
    * [[wordCounts]] table, so cost is independent of corpus size. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    var words = wordCounts.iterator.map { case (w, c) => (initial(w), c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var halt = false
    while (k < nMerges && !halt) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          pc.update(key, pc.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      // max count, ties to the smallest pair — independent of map order
      var best: (String, String) = null
      var bc = 0L
      for ((p, c) <- pc)
        if (c > bc || (c == bc && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bc = c
        }
      if (best == null || bc < minPairCount) halt = true
      else {
        merges += best
        words = words.map { case (s, c) => (applyMerge(s, best._1, best._2), c) }
        k += 1
      }
    }
    merges.result()
  }

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Greedy encode: repeatedly merge the LEFTMOST occurrence of the
    * lowest-rank adjacent pair; stops when no pair is in the table. Pure
    * — safe inside mapPartitions. */
  def encodeWord(w: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = initial(w)
    var going = true
    while (going && syms.length > 1) {
      var bestI = -1
      var bestR = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestR) { bestR = r; bestI = i }
        i += 1
      }
      if (bestI < 0) going = false
      else syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
        syms.drop(bestI + 2)
    }
    syms
  }

  /** Distributed piece counting: `(doc_id, n_words, n_pieces)` per doc.
    * Ranks ride a broadcast; the encode is one narrow mapPartitions with
    * a per-partition word memo. Blank docs yield (0, 0). */
  def pieceCounts(spark: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ranksOf(merges))
    docs
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, ws) =>
          var pieces = 0L
          ws.foreach { w =>
            pieces += memo.getOrElseUpdate(w, encodeWord(w, ranks).length.toLong)
          }
          (id, ws.length.toLong, pieces)
        }
      }.toDF("doc_id", "n_words", "n_pieces")
  }

  /** Per-doc segmentation digest: `(doc_id, n_pieces, head_pieces_hash)`
    * where the hash covers the doc's first `headK` pieces (words in
    * order, each word's pieces in order, space-joined) — this pins the
    * actual SEGMENTATION, strictly stronger than the piece COUNTS of
    * [[pieceCounts]] (two different segmentations can tie on length).
    * Blank docs hash the empty string. */
  def segmentation(spark: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)], headK: Int = 12, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ranksOf(merges))
    docs
      .select(col(idCol).cast("long"),
        TextFunctions.tokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, ws) =>
          var n = 0L
          val head = Vector.newBuilder[String]
          var kept = 0
          ws.foreach { w =>
            val pieces = memo.getOrElseUpdate(w, encodeWord(w, ranks))
            n += pieces.length
            if (kept < headK) {
              val take = math.min(headK - kept, pieces.length)
              head ++= pieces.take(take)
              kept += take
            }
          }
          (id, n, graft.core.Determinism.jvmHash(head.result().mkString(" ")))
        }
      }.toDF("doc_id", "n_pieces", "head_pieces_hash")
  }

  /** The corpus-pinned merge table the q54 lane and its oracle share:
    * trained once from `wordCounts(documents @ sf0.001, maxWords = 2000)`
    * with 60 merges — BpeSpec retrains and asserts equality, so the
    * constant stays tied to the trainer. Re-pin only for an intentional
    * trainer change. */
  val PinnedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "e" -> "</w>", "n" -> "</w>", "o" -> "r", "t" -> "</w>",
    "er" -> "</w>", "o" -> "w", "ow" -> "</w>", "l" -> "u", "i" -> "n",
    "y" -> "</w>", "a" -> "r", "p" -> "ar", "g" -> "</w>", "a" -> "s",
    "h" -> "</w>", "a" -> "</w>", "s" -> "t", "a" -> "t", "a" -> "n</w>",
    "c" -> "an</w>", "s" -> "can</w>", "c" -> "o", "co" -> "lu",
    "colu" -> "m", "colum" -> "n</w>", "d" -> "ow</w>", "in" -> "dow</w>",
    "w" -> "indow</w>", "d" -> "er</w>", "or" -> "der</w>", "or" -> "t</w>",
    "s" -> "ort</w>", "p" -> "</w>", "par" -> "t</w>", "u" -> "p</w>",
    "a" -> "g", "ag" -> "g</w>", "a" -> "lu", "alu" -> "e</w>",
    "v" -> "alue</w>", "in" -> "e</w>", "l" -> "ine</w>", "e" -> "y</w>",
    "k" -> "ey</w>", "i" -> "n</w>", "j" -> "o", "jo" -> "in</w>",
    "er" -> "g", "erg" -> "e</w>", "m" -> "erge</w>", "er" -> "y</w>",
    "g" -> "r", "gr" -> "o", "gro" -> "up</w>", "q" -> "u",
    "qu" -> "ery</w>", "c" -> "t", "ct" -> "or", "ctor" -> "</w>")

  /** DuckDB `MAP {'l r': rank, ...}` literal for `merges` — the oracle's
    * rank table (single quotes escaped; keys are space-joined pairs,
    * unambiguous because symbols never contain whitespace). */
  def duckRankMap(merges: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("'", "''")
    "MAP {" + merges.zipWithIndex.map { case ((l, r), i) =>
      s"'${esc(l)} ${esc(r)}': $i"
    }.mkString(", ") + "}"
  }
}
