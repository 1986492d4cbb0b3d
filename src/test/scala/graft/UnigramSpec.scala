package graft

import graft.core.Tables
import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer laws. The distributed encode is additionally
  * oracle-checked by q123 (recursive-CTE Viterbi replay).
  */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("viterbi: optimal cost vs brute-force enumeration (fuzzed)") {
    // random cost tables over a 3-char alphabet; the DP must match an
    // exhaustive enumeration of ALL segmentations on both cost and the
    // longer-last-piece tie rule
    val rnd = new scala.util.Random(7)
    def allSplits(w: String, maxLen: Int): Seq[Vector[String]] =
      if (w.isEmpty) Seq(Vector.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        allSplits(w.drop(l), maxLen).map(rest => w.take(l) +: rest)
      }
    for (_ <- 0 until 200) {
      val pieces = (Seq("a", "b", "c") ++
        (0 until 6).map(_ => (0 until 2 + rnd.nextInt(3))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)).distinct
      val costs = pieces.map(p => p -> (100L + rnd.nextInt(1000))).toMap
      val w = (0 until 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val got = Unigram.viterbi(w, costs, 4).get
      val bestCost = allSplits(w, 4).filter(_.forall(costs.contains))
        .map(_.map(costs).sum).min
      assert(got.map(costs).sum == bestCost, s"suboptimal cost for '$w': $got")
      // round-trip always holds
      assert(got.mkString == w)
    }
  }

  test("viterbi: longer piece spans an unreachable intermediate prefix") {
    // vocab {ab}: prefix 'a' is unreachable but the word still segments
    assert(Unigram.viterbi("ab", Map("ab" -> 10L), 4).contains(Vector("ab")))
    assert(Unigram.viterbi("abab", Map("ab" -> 10L), 4)
      .contains(Vector("ab", "ab")))
    // truly unsegmentable → None (callers emit [UNK])
    assert(Unigram.viterbi("abc", Map("ab" -> 10L), 4).isEmpty)
    // tie-break: equal costs prefer the longer piece
    val m = Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)
    assert(Unigram.viterbi("ab", m, 4).contains(Vector("ab")))
  }

  test("trainer: hard EM keeps singles, prunes unused pieces, converges to words") {
    val vocab = Unigram.train(Seq("banana" -> 20L, "band" -> 5L),
      maxPieceLen = 6, seedTopN = 20, rounds = 2, keepTopV = 10).toMap
    // every seen char survives as a single
    for (ch <- "band") assert(vocab.contains(ch.toString), s"single '$ch' missing")
    // whole words win: both segment as single pieces, so the singles go
    // unused (floor count 1) and cost far more than the word pieces
    assert(vocab.contains("banana") && vocab.contains("band"))
    assert(vocab("banana") < vocab("b"))
    assert(vocab("band") < vocab("b"))
  }

  test("soft EM: hand-checked forward-backward expectations on a one-word corpus") {
    // corpus {"ab": 1}, seed θ uniform over {a, b, ab} (each substring
    // count 1). One E-step: segmentations [ab] (prob 1/3) and [a, b]
    // (1/9); Z = 4/9, posteriors 3/4 / 1/4 / 1/4 → expected counts
    // (.75, .25, .25) → M-step θ = (.6, .2, .2). Pruning keeps `ab`
    // (positive likelihood loss) and the mass already sums to 1, so
    // cost_e6 = floor(−1e6·ln θ) exactly.
    val got = Unigram.trainSoft(Seq("ab" -> 1L), rounds = 1, emIters = 1)
    assert(got == Seq(
      "a" -> 1609437L,   // floor(−1e6·ln 0.2)
      "ab" -> 510825L,   // floor(−1e6·ln 0.6)
      "b" -> 1609437L))
  }

  test("soft EM: expected counts see non-Viterbi paths (diverges from hard EM)") {
    // a corpus where the Viterbi path under the seed costs is unique but
    // alternative segmentations carry mass: soft and hard training must
    // produce different cost tables, and BOTH segment corpus words
    // round-trip under their own vocabularies
    val wc = Seq("abab" -> 4L, "aba" -> 3L, "bab" -> 2L, "ab" -> 5L)
    val hard = Unigram.train(wc)
    val soft = Unigram.trainSoft(wc)
    assert(hard != soft)
    for ((vocab, tag) <- Seq((hard, "hard"), (soft, "soft")); (w, _) <- wc) {
      val segd = Unigram.viterbi(w, vocab.toMap, 6)
      assert(segd.exists(_.mkString == w), s"$tag round-trip for $w: $segd")
    }
    // determinism: retraining is bit-identical (fixed summation order +
    // StrictMath — the pin contract)
    assert(Unigram.trainSoft(wc) == soft)
  }

  test("pinned soft vocab: retraining from the sf0.001 corpus reproduces the constant") {
    val wc = Bpe.wordCounts(Tables.load(spark, sfDir, "documents"), maxWords = 300)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(Unigram.trainSoft(wc) == Unigram.PinnedSoftVocab)
    // and the two pinned training algorithms genuinely diverge
    assert(Unigram.PinnedSoftVocab != Unigram.PinnedVocab)
    assert(Unigram.PinnedSoftVocab.map(_._1) != Unigram.PinnedVocab.map(_._1),
      "soft pruning must select a different piece set than hard pruning")
  }

  test("pinned vocab: retraining from the sf0.001 corpus reproduces the constant") {
    val docs = Tables.load(spark, sfDir, "documents")
    val wc = Bpe.wordCounts(docs, maxWords = 300).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val fresh = Unigram.train(wc)
    if (fresh != Unigram.PinnedVocab)
      info("fresh vocab:\n" + fresh.map { case (p, c) =>
        "\"" + p + "\" -> " + c + "L" }.mkString(",\n"))
    assert(fresh == Unigram.PinnedVocab, "trainer drift against the pinned table")
  }

  test("segment: partition invariance + blank/unk accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join merge query group"),
      (2L, ""),
      (3L, "zzz join")).toDF("doc_id", "text")
    def run(parts: Int) =
      Unigram.segment(spark, docs.repartition(parts), Unigram.PinnedVocab)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toVector
    val r1 = run(1)
    assert(r1 == run(13))
    val byId = r1.map(t => t._1 -> t).toMap
    assert(byId(2L) == ((2L, 0L, 0L, 0L, byId(2L)._5)))
    assert(byId(1L)._4 == 0L) // all in pinned vocab (whole-word pieces)
    assert(byId(1L)._3 == 4L) // each is a single piece
    assert(byId(3L)._4 == 1L) // 'z' absent from the capped table → [UNK]
  }
}
