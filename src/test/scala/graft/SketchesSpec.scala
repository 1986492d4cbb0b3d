package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the portable HLL sketch: cardinality accuracy inside the
  * published error bound, multiplicity invariance (a sketch is a max),
  * and partition invariance (register values are pure hash functions). */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def est(pairs: Seq[(String, String)], parts: Int = 4): Map[String, Long] =
    Sketches.hllDistinct(pairs.toDF("group", "elem").repartition(parts), "group", "elem")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates land within the m=64 error envelope across regimes") {
    // σ = 1.04/√64 = 13%; allow 4σ (plus small-range discretization)
    val pairs =
      (1 to 20).map(i => "small" -> s"s$i") ++
      (1 to 2000).map(i => "mid" -> s"m$i") ++
      (1 to 30000).map(i => "big" -> s"b$i")
    val e = est(pairs)
    assert(math.abs(e("small") - 20) <= 10, s"small: ${e("small")}")
    assert(math.abs(e("mid") - 2000) <= 1040, s"mid: ${e("mid")}")
    assert(math.abs(e("big") - 30000) <= 15600, s"big: ${e("big")}")
  }

  test("multiplicity never changes a register: 5x-duplicated stream sketches identically") {
    val uniq = (1 to 500).map(i => "g" -> s"e$i")
    val dup = (1 to 5).flatMap(_ => uniq)
    assert(est(uniq) == est(dup))
  }

  test("sketch is partition invariant") {
    val pairs = (1 to 3000).map(i => s"g${i % 3}" -> s"e$i")
    assert(est(pairs, parts = 1) == est(pairs, parts = 13))
  }

  // ---- Bloom filter laws ----

  private def bloomVerdicts(inserted: Seq[String], probed: Seq[String],
      parts: Int = 4): Map[String, Long] = {
    val filt = Sketches.bloomBuild(
      inserted.toDF("elem").repartition(parts), "elem")
    Sketches.bloomProbe(
        probed.map(e => (e, e)).toDF("pid", "elem").repartition(parts),
        filt, "pid", "elem")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("bloom: one-sided error — every inserted element reports maybe, FP rate inside the envelope") {
    val inserted = (1 to 500).map(i => s"in$i")
    val disjoint = (1 to 2000).map(i => s"out$i")
    val v = bloomVerdicts(inserted, inserted ++ disjoint)
    assert(inserted.forall(v(_) == 1L), "a member reported not-present")
    // one-sidedness survives DUPLICATE probe rows (the verdict is a min
    // over lanes, not a lane count — a sum==k verdict would flip here)
    val vd = bloomVerdicts(inserted, inserted ++ inserted)
    assert(inserted.forall(vd(_) == 1L), "duplicated probe rows flipped a member")
    // expected FP ≈ (1 − e^(−kn/m))^k ≈ 2.6% at n=500, m=4096, k=3;
    // allow a wide band (binomial noise) but require BOTH that FPs are
    // rare AND that the filter isn't saturated-vacuous
    val fp = disjoint.count(v(_) == 1L)
    assert(fp < 200, s"FP rate too high: $fp/2000")
    assert(disjoint.exists(v(_) == 0L), "filter saturated: everything reports maybe")
  }

  test("bloom: duplicates free, partition invariant, filter ≤ 128 words") {
    val ins = (1 to 300).map(i => s"x$i")
    val probe = (1 to 600).map(i => s"x$i")
    assert(bloomVerdicts(ins, probe) == bloomVerdicts(ins ++ ins, probe))
    assert(bloomVerdicts(ins, probe, parts = 1) == bloomVerdicts(ins, probe, parts = 13))
    val words = Sketches.bloomBuild(ins.toDF("elem"), "elem").count()
    assert(words <= Sketches.BloomBits / Sketches.BloomWordBits)
  }

  // ---- Count-Min laws ----

  private def cmsOf(elems: Seq[String], parts: Int = 4) =
    Sketches.cmsBuild(elems.toDF("elem").repartition(parts), "elem")

  private def estimates(sketch: org.apache.spark.sql.DataFrame,
      items: Seq[String]): Map[String, Long] =
    Sketches.cmsEstimate(items.distinct.toDF("q"), sketch, "q")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cms: one-sided — est ≥ true for every item, exact on dominant keys") {
    // zipf-ish stream: item i appears ~1500/i times
    val stream = (1 to 80).flatMap(i => Seq.fill(1500 / i)(s"t$i"))
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val e = estimates(cmsOf(stream), truth.keys.toSeq)
    truth.foreach { case (k, n) =>
      assert(e(k) >= n, s"$k: est ${e(k)} < true $n") }
    // overshoot bound: ≤ εN with ε = e/w at prob 1−e^−d; the heavy head
    // should estimate exactly or near-exactly
    val n = stream.size
    val bound = math.ceil(math.E / Sketches.CmsWidth * n).toLong * 3
    truth.foreach { case (k, t) =>
      assert(e(k) - t <= bound, s"$k overshoot ${e(k) - t} > $bound") }
  }

  test("cms: the aggregate IS the merge — sharded build sums to the whole") {
    import org.apache.spark.sql.functions._
    val a = (1 to 1000).map(i => s"e${i % 60}")
    val b = (1 to 800).map(i => s"e${i % 45}")
    val merged = cmsOf(a).unionByName(cmsOf(b))
      .groupBy(col("row"), col("pos")).agg(sum(col("cnt")).as("cnt"))
    val whole = cmsOf(a ++ b)
    assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
    assert(estimates(merged, a ++ b) == estimates(whole, a ++ b))
  }

  // ---- bottom-k hash-sample quantile laws ----

  private def quantRows(n: Int, parts: Int = 4) =
    (1 to n).map(i => ("g", i.toLong, i.toLong)).toDF("group", "id", "value")
      .repartition(parts)

  test("sample quantiles: k past the group size is exactly the type-1 quantile") {
    val got = Sketches.sampleQuantiles(quantRows(200), Int.MaxValue, Seq(10, 50, 90))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // value i at rank i: type-1 quantile p over 1..200 = ceil(p*200/100)
    assert(got == Map(10L -> 20L, 50L -> 100L, 90L -> 180L))
  }

  test("sample quantiles: k=64 estimates land inside the sampling-error envelope") {
    // uniform 1..5000; sample-quantile rank error ~ sqrt(p(1-p)/k):
    // 4 sigma at p=0.5, k=64 is 0.25 — assert the loose band
    val got = Sketches.sampleQuantiles(quantRows(5000), 64, Seq(10, 50, 90))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    Seq(10, 50, 90).foreach { p =>
      val err = math.abs(got(p.toLong) / 5000.0 - p / 100.0)
      val bound = 4 * math.sqrt(p / 100.0 * (1 - p / 100.0) / 64) + 0.02
      assert(err <= bound, s"p$p: est ${got(p.toLong)} rank error $err > $bound")
    }
  }

  test("sample quantiles: membership is a pure hash — partition invariant") {
    def run(parts: Int) = Sketches.sampleQuantiles(quantRows(1000, parts), 64, Seq(25, 75))
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(13))
  }

  // ---- persisted BM25 index laws ----

  test("bm25 index: refresh ≡ from-scratch, save/load round-trips, scores match the text path") {
    import graft.operators.{Bm25, Bm25Index}
    import org.apache.spark.sql.functions._
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to 12).map(j => s"w${(i * j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(4)) === 0
    val refreshed = Bm25Index.refresh(
      Bm25Index.build(docs.filter(!isNew), "doc_id", "text"),
      docs.filter(isNew), "doc_id", "text")
    val scratch = Bm25Index.build(docs, "doc_id", "text")
    assert(refreshed.postings.collect().map(_.toSeq).toSet ==
      scratch.postings.collect().map(_.toSeq).toSet, "refresh != from-scratch build")
    assert(refreshed.docLens.collect().map(_.toSeq).toSet ==
      scratch.docLens.collect().map(_.toSeq).toSet, "refreshed doc lengths drifted")
    val qs = Seq(1 -> "w3 w5 w11", 2 -> "w0 w16")
    val fromIdx = Bm25Index.scores(spark, refreshed, qs)
      .collect().map(_.toSeq).toSet
    assert(fromIdx == Bm25.scores(spark, docs, "doc_id", "text", qs)
      .collect().map(_.toSeq).toSet, "index path != text path")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25Index.save(refreshed, dir)
    val loaded = Bm25Index.load(spark, dir)
    assert(Bm25Index.scores(spark, loaded, qs).collect().map(_.toSeq).toSet == fromIdx,
      "persisted index scores drifted")
  }
}
