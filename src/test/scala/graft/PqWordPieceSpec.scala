package graft

import graft.core.Tables
import graft.operators.{Bpe, Pq, WordPiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-9 extension operators: product quantization (ADC
  * search) and WordPiece segmentation. The distributed lanes are
  * additionally oracle-checked by q118/q120/q121.
  */
class PqWordPieceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- WordPiece

  test("encodeWord: longest-match-first, continuation prefix, UNK law") {
    val init = Set("a", "b", "un", "unable")
    val cont = Set("a", "b", "le", "able")
    // longest match wins at position 0: 'unable' beats 'un'
    assert(WordPiece.encodeWord("unable", init, cont, 8) == Vector("unable"))
    // after position 0 only continuation pieces match; longest first
    assert(WordPiece.encodeWord("unab", init, cont, 8) ==
      Vector("un", "##a", "##b"))
    // maxPieceLen=3 caps 'unable'/'able' out of reach: un ##a ##b ##le
    assert(WordPiece.encodeWord("unable", init, cont, 3) ==
      Vector("un", "##a", "##b", "##le"))
    // any unmatchable position → the WHOLE word is one [UNK]
    assert(WordPiece.encodeWord("unax", init, cont, 8) == Vector(WordPiece.Unk))
    assert(WordPiece.encodeWord("xa", init, cont, 8) == Vector(WordPiece.Unk))
    // round-trip: stripped pieces concatenate back to the word
    val pieces = WordPiece.encodeWord("unab", init, cont, 8)
    assert(pieces.map(_.stripPrefix(WordPiece.ContPrefix)).mkString == "unab")
  }

  test("vocabTable: all singles kept, multi capped, deterministic") {
    import spark.implicits._
    val words = Seq(("banana", 10L), ("band", 5L)).toDF("word", "cnt")
    val v = WordPiece.vocabTable(words, maxPieceLen = 4, topMulti = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val singles = v.filter(_._2 == 1L).map(_._1).toSet
    // every char of both words appears as initial (pos 1) or continuation
    assert(singles.contains("b") && singles.contains("##a") &&
      singles.contains("##n") && singles.contains("##d"))
    // 'a'/'n'/'d' never start a word here → no plain single for them
    assert(!singles.contains("a") && !singles.contains("n"))
    assert(v.count(_._2 > 1L) == 3) // capped
    // counts are word-count weighted: '##an' occurs 2× in banana (10) + 1× in band (5)
    val an = v.find(_._1 == "##an")
    assert(an.forall(_._3 == 25L))
  }

  test("segment: partition invariance + blank/unk accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banana band banana"),
      (2L, ""),
      (3L, "zzz banana")).toDF("doc_id", "text")
    // cap = 2 keeps banana(3) + band(1; count-tie broken by word asc) and
    // drops zzz — so 'z' is absent from the vocabulary entirely
    val words = Bpe.wordCounts(docs, maxWords = 2)
    val vocab = WordPiece.vocabTable(words, 4, 50)
      .select(col("piece"), col("mlen"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def run(parts: Int) =
      WordPiece.segment(spark, docs.repartition(parts), vocab, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toVector
    val r1 = run(1)
    assert(r1 == run(13), "segmentation must be partition-invariant")
    val byId = r1.map(t => t._1 -> t).toMap
    assert(byId(2L)._2 == 0L && byId(2L)._3 == 0L) // blank doc
    assert(byId(1L)._4 == 0L) // all in-vocab
    // 'zzz' has chars in vocab ('z' never appears) → whole-word UNK
    assert(byId(3L)._4 == 1L)
  }

  // ------------------------------------------------------------------ PQ

  private val Dim = 64
  private val M = 8
  private val Ks = 8

  test("codebook: M×Ks rows, codes 0..Ks-1 per subspace, partition-invariant") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    def cb(parts: Int) =
      Pq.codebook(emb.repartition(parts), "vec_id", "embedding", Dim, M, Ks)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          r.getSeq[Float](2).toVector)).toMap
    val c = cb(3)
    assert(c.size == M * Ks)
    for (m <- 0 until M)
      assert((0 until Ks).forall(k => c.contains((m.toLong, k.toLong))))
    assert(c == cb(7), "codebook must not depend on partitioning")
    assert(c.values.forall(_.length == Dim / M))
  }

  test("encode + ADC: codes are nearest codewords; adist = Σ sub-distances") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 40).cache()
    val cb = Pq.codebook(emb, "vec_id", "embedding", Dim, M, Ks)
    val codes = Pq.encode(emb, "vec_id", "embedding", Dim, M, cb)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(codes.values.forall(k => k >= 0 && k < Ks))
    // brute-force check in Scala against the collected floats
    val cbm = Pq.codebook(emb, "vec_id", "embedding", Dim, M, Ks)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getSeq[Float](2).toVector)).toMap
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    def e3(x: Float): Long = math.round(x.toDouble * 1000)
    def d2(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => val d = e3(x) - e3(y); d * d }.sum
    val sub = Dim / M
    for ((id, v) <- vecs; m <- 0 until M) {
      val s = v.slice(m * sub, m * sub + sub)
      val best = (0 until Ks).minBy(k => (d2(s, cbm((m.toLong, k.toLong))), k))
      assert(codes((id, m.toLong)) == best.toLong,
        s"wrong code for vec $id subspace $m")
    }
    // ADC distances reproduce the same sums
    val q = emb.filter(col("vec_id") < 3)
    val adc = Pq.adcTables(q, "vec_id", "embedding", Dim, M, cb)
    val scored = Pq.adcScores(
      Pq.encode(emb, "vec_id", "embedding", Dim, M, cb), adc)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (qid <- vecs.keys.filter(_ < 3); id <- vecs.keys) {
      val expect = (0 until M).map { m =>
        val qs = vecs(qid).slice(m * sub, m * sub + sub)
        d2(qs, cbm((m.toLong, codes((id, m.toLong)))))
      }.sum
      assert(scored((qid, id)) == expect, s"adist mismatch q=$qid id=$id")
    }
    emb.unpersist()
  }
}
