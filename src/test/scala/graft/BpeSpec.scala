package graft

import graft.core.Tables
import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer + encoder laws. The distributed halves (word counts,
  * piece counts) are additionally oracle-checked by q55/q54.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("trainer on a hand-checkable corpus: exact merge sequence") {
    // words: aa ×4, ab ×2. Round 1 pairs: (a,a)=4, (a,</w>)=4, (a,b)=2,
    // (b,</w>)=2 — tie broken to the smallest pair ('<' < 'a'), so
    // (a,</w>) wins. Then (a,a</w>)=4; then (a,b)=2 vs (b,</w>)=2 tie →
    // (a,b); then (ab,</w>)=2; then every word is one symbol → halt
    // early regardless of the merge budget.
    val merges = Bpe.train(Seq("aa" -> 4L, "ab" -> 2L), nMerges = 10)
    assert(merges == Seq("a" -> Bpe.Eow, "a" -> ("a" + Bpe.Eow),
      "a" -> "b", "ab" -> Bpe.Eow))
    val ranks = Bpe.ranksOf(merges)
    // trained words reproduce their training segmentation
    assert(Bpe.encodeWord("aa", ranks) == Vector("aa" + Bpe.Eow))
    assert(Bpe.encodeWord("ab", ranks) == Vector("ab" + Bpe.Eow))
    // unseen word: greedy lowest-rank-first over the learned table
    assert(Bpe.encodeWord("aab", ranks) == Vector("a", "ab" + Bpe.Eow))
    // minPairCount halts training when nothing repeats
    assert(Bpe.train(Seq("xy" -> 1L), nMerges = 5).isEmpty)
  }

  test("encode round-trip: pieces concatenate back to word + marker (fuzzed)") {
    val merges = Bpe.train(Seq("aa" -> 4L, "ab" -> 2L, "banana" -> 9L,
      "bandana" -> 3L), nMerges = 20, minPairCount = 1L)
    val ranks = Bpe.ranksOf(merges)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val w = (0 until 1 + rnd.nextInt(12))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val pieces = Bpe.encodeWord(w, ranks)
      assert(pieces.mkString == w + Bpe.Eow, s"round-trip broke on '$w'")
      assert(pieces.length <= w.length + 1)
    }
    // zero merges: one piece per codepoint plus the marker
    assert(Bpe.encodeWord("abc", Map.empty).length == 4)
  }

  test("pinned merges: retraining from the sf0.001 corpus reproduces the constant") {
    val docs = Tables.load(spark, sfDir, "documents")
    val wc = Bpe.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = Bpe.train(wc, nMerges = 60)
    if (merges != Bpe.PinnedMerges)
      info("fresh merges:\n" + merges.map { case (l, r) =>
        "\"" + l + "\" -> \"" + r + "\"" }.mkString(",\n"))
    assert(merges == Bpe.PinnedMerges, "trainer drift against the pinned table")
  }

  test("word counts are partition invariant and deterministically capped") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Bpe.wordCounts(docs.repartition(1), maxWords = 50).collect().toSeq
    val b = Bpe.wordCounts(docs.repartition(13), maxWords = 50).collect().toSeq
    assert(a == b, "cap boundary depends on partitioning")
    // the cap keeps the HIGHEST counts; nothing outside beats anything in
    val all = Bpe.wordCounts(docs, maxWords = Int.MaxValue).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val inSet = a.map(_.getString(0)).toSet
    val minIn = a.map(_.getLong(1)).min
    assert(all.filterNot(kv => inSet(kv._1)).forall(_._2 <= minIn))
  }

  test("segmentation digest is consistent with pieceCounts and the driver encode") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val seg = Bpe.segmentation(spark, docs, Bpe.PinnedMerges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pc = Bpe.pieceCounts(spark, docs, Bpe.PinnedMerges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(seg.view.mapValues(_._1).toMap == pc,
      "segmentation and pieceCounts disagree on n_pieces")
    val ranks = Bpe.ranksOf(Bpe.PinnedMerges)
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val ws = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val head = ws.iterator.flatMap(w => Bpe.encodeWord(w, ranks))
        .take(12).mkString(" ")
      assert(seg(r.getLong(0))._2 == graft.core.Determinism.jvmHash(head),
        s"head-pieces hash drift on doc ${r.getLong(0)}")
    }
  }

  test("distributed pieceCounts equals the driver-side encode") {
    val docs = Tables.load(spark, sfDir, "documents").limit(80)
    val got = Bpe.pieceCounts(spark, docs, Bpe.PinnedMerges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ranks = Bpe.ranksOf(Bpe.PinnedMerges)
    val want = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val ws = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> (ws.length.toLong,
        ws.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum)
    }.toMap
    assert(got == want)
  }
}
