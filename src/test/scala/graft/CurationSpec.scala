package graft

import graft.operators.{Curation, Mixing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the curation kit (operators.Curation + Mixing.stratifiedSample):
  * exact hand-computed outputs on planted corpora, plus partition-count
  * invariance for every operator (the determinism doctrine — same result on
  * any cluster topology).
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariantUnderRepartition(mk: DataFrame => DataFrame, df: DataFrame): Unit =
    assert(sortedRows(mk(df.repartition(1))) == sortedRows(mk(df.repartition(13))))

  // ---- contaminationScan ----

  test("contaminationScan flags exactly the planted 4-gram overlap") {
    val evalSet = docs(100L -> "alpha beta gamma delta epsilon")
    val train = docs(
      1L -> "zero alpha beta gamma delta nine", // shares 'alpha beta gamma delta'
      2L -> "beta gamma delta epsilon tail x", // shares the second 4-gram
      3L -> "unrelated words only here now")
    val out = Curation.contaminationScan(train, evalSet, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((1L, 1L, 1L)))
    assert(out(2L) == ((1L, 1L, 1L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("contaminationScan: short docs fall back to whole-text shingles") {
    // both sides shorter than k=4 → single whole-text shingle each
    val out = Curation.contaminationScan(
      docs(1L -> "tiny doc", 2L -> "other"), docs(9L -> "tiny doc"), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L))
  }

  test("contaminationScan: zero-token docs never match, but are still emitted") {
    // a whitespace-only eval doc must NOT mark whitespace-only train docs
    // (the whole-text shingle fallback would hash "" on both sides)
    val out = Curation.contaminationScan(
      docs(1L -> "   ", 2L -> "real alpha beta"), docs(9L -> " \t ", 10L -> "real alpha beta"),
      "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L))
  }

  test("contaminationScan is partition-invariant") {
    val corpus = docs((1L to 40L).map(i =>
      i -> s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2} end$i"): _*)
    val evalSet = docs(100L -> "w1 w2 w3 w4 w5")
    invariantUnderRepartition(
      d => Curation.contaminationScan(d, evalSet, "doc_id", "text", 4), corpus)
  }

  // ---- repetitionProfile ----

  test("repetitionProfile: exact e6 stats on planted docs") {
    val out = Curation.repetitionProfile(docs(
        1L -> "a a a a a", // pure repetition
        2L -> "b c d e f", // no repetition
        3L -> "   "), // zero tokens
      "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 1: 5 tokens all 'a' → top_tok 1e6; 4 bigrams all 'a a' → 1e6;
    // 3 trigrams, 1 distinct → dup = floor(2/3 * 1e6)
    assert(out(1L) == ((5L, 1000000L, 1000000L, 666666L, 1L)))
    // doc 2: every gram unique → top shares are 1/n, no dup trigrams
    assert(out(2L) == ((5L, 200000L, 250000L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("repetitionProfile: short docs are never flagged (MinRepToks gate)") {
    val out = Curation.repetitionProfile(docs(
        1L -> "x y z w", // 4 all-distinct tokens: share 250000 > threshold, but too short
        2L -> "x x", // genuinely repetitive but too short
        3L -> "x x x x x"), // 5 tokens, repetitive → flagged
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("repetitionProfile is partition-invariant") {
    val corpus = docs((1L to 50L).map(i =>
      i -> (s"tok${i % 9} " * (i % 6 + 1).toInt).trim): _*)
    invariantUnderRepartition(Curation.repetitionProfile(_, "doc_id", "text"), corpus)
  }

  // ---- packSequences ----

  test("packSequences: greedy per-shard packing invariants") {
    val corpus = docs((1L to 120L).map(i => i -> ("w " * (i % 17 + 1).toInt).trim): _*)
    val out = Curation.packSequences(corpus, "doc_id", "text", budget = 32L, shards = 3, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 120)
    // token mass is preserved and offsets stay inside the budget
    assert(out.map(_._3).sum == (1L to 120L).map(i => i % 17 + 1).sum)
    assert(out.forall(r => r._5 >= 0 && r._5 < 32))
    // within each shard, replaying the greedy packer over the emitted
    // (seq_id, seq_offset) order reproduces exactly the assignments
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._5, r._1))
      var cum = 0L
      ordered.foreach { r =>
        assert(r._4 == cum / 32 && r._5 == cum % 32)
        cum += r._3
      }
      // sequence ids are contiguous from 0
      val seqs = rows.map(_._4).distinct.sorted
      assert(seqs.toSeq == (0L until seqs.length.toLong))
    }
  }

  test("packSequencesSplit: exact full sequences, contiguous doc slices") {
    val corpus = docs((1L to 90L).map(i => i -> ("w " * (i % 23 + 1).toInt).trim): _*)
    val out = Curation.packSequencesSplit(corpus, "doc_id", "text", 32L, 3, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // slices per doc are contiguous half-open ranges summing to n_tok,
    // over consecutive sequence ids
    out.groupBy(_._1).foreach { case (id, segs) =>
      val n = id % 23 + 1
      assert(segs.map(s => s._5 - s._4).sum == n)
      val sorted = segs.sortBy(_._3).toList
      assert(sorted.head._4 == 0L && sorted.last._5 == n)
      sorted.sliding(2).foreach {
        case List(a, b) => assert(a._5 == b._4 && b._3 == a._3 + 1)
        case _ => ()
      }
    }
    // zero waste: every sequence except each shard's last holds exactly
    // the 32-token budget
    out.groupBy(_._2).foreach { case (_, rows) =>
      val bySeq = rows.groupBy(_._3).view.mapValues(_.map(s => s._5 - s._4).sum).toMap
      val last = bySeq.keys.max
      bySeq.foreach { case (sq, tot) =>
        if (sq != last) assert(tot == 32L, s"seq $sq holds $tot tokens")
        else assert(tot <= 32L)
      }
    }
  }

  test("packSequencesSplit is partition-invariant") {
    val corpus = docs((1L to 70L).map(i => i -> ("y " * (i % 19 + 1).toInt).trim): _*)
    invariantUnderRepartition(
      Curation.packSequencesSplit(_, "doc_id", "text", 16L, 3, "s"), corpus)
  }

  test("packSequences is partition-invariant") {
    val corpus = docs((1L to 80L).map(i => i -> ("x " * (i % 9 + 1).toInt).trim): _*)
    invariantUnderRepartition(
      Curation.packSequences(_, "doc_id", "text", 16L, 4, "s"), corpus)
  }

  // ---- stratifiedSample ----

  test("stratifiedSample: exact total, proportional within 1, lowest ranks") {
    val df = (1L to 200L).map(i =>
      i -> (if (i <= 120) "big" else if (i <= 180) "mid" else "small"))
      .toDF("id", "group")
    val out = Mixing.stratifiedSample(df, 50L, "s").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 50)
    val per = out.groupBy(_._2).view.mapValues(_.length).toMap
    // proportional shares: 120/200*50=30, 60/200*50=15, 20/200*50=5 (exact)
    assert(per == Map("big" -> 30, "mid" -> 15, "small" -> 5))
    // the picks are exactly ranks 1..alloc per stratum
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
  }

  test("stratifiedSample: largest remainder rounds and sums exactly") {
    // sizes 7/5/3 over total 10 → exact shares 4.66/3.33/2.0 →
    // floors 4/3/2 = 9, one remainder slot → highest remainder (a) gets it
    val df = ((1L to 7L).map(_ -> "a") ++ (8L to 12L).map(_ -> "b") ++
      (13L to 15L).map(_ -> "c")).toDF("id", "group")
    val per = Mixing.stratifiedSample(df, 10L, "s").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(per.values.sum == 10)
    assert(per == Map("a" -> 5, "b" -> 3, "c" -> 2))
  }

  test("stratifiedSample: total beyond corpus size caps at N, no under-delivery") {
    // 12 rows, total 40: capped largest remainder hands every stratum
    // exactly its size — the rank filter delivers the whole corpus
    val df = ((1L to 7L).map(_ -> "a") ++ (8L to 12L).map(_ -> "b")).toDF("id", "group")
    val out = Mixing.stratifiedSample(df, 40L, "s").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 12)
    assert(out.map(_._1).sorted.toSeq == (1L to 12L))
  }

  test("stratifiedSample is partition-invariant") {
    val df = (1L to 150L).map(i => i -> s"g${i % 4}").toDF("id", "group")
    invariantUnderRepartition(Mixing.stratifiedSample(_, 40L, "s"), df)
  }

  // ---- duplicateSpans / duplicateSpanProfile ----

  test("duplicateSpanProfile: exact coverage of a planted cross-doc run") {
    // docs 1 and 2 share a verbatim 20-token run; width 15 → 6 dup-span
    // starts per doc, union coverage exactly the 20 shared tokens
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val df = docs(
      1L -> (shared + " " + (1 to 10).map(i => s"u$i").mkString(" ")),
      2L -> ((1 to 5).map(i => s"v$i").mkString(" ") + " " + shared),
      3L -> (1 to 30).map(i => s"w$i").mkString(" "))
    val out = Curation.duplicateSpanProfile(df, "doc_id", "text", 15, 200000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((30L, 6L, 20L, 0L))) // 20M dup·e6 >= 0.2·30M → drop
    assert(out(2L) == ((25L, 6L, 20L, 0L)))
    assert(out(3L) == ((30L, 0L, 0L, 1L)))
  }

  test("duplicateSpanProfile: a span repeated INSIDE one doc is a duplicate") {
    // Lee et al. semantics: >= 2 occurrences anywhere, including the same
    // doc. r1..r15 twice → dup spans at pos 0 and 15, full 30-token cover.
    val run = (1 to 15).map(i => s"r$i").mkString(" ")
    val out = Curation.duplicateSpanProfile(
        docs(1L -> (run + " " + run), 2L -> (1 to 20).map(i => s"x$i").mkString(" ")),
        "doc_id", "text", 15, 200000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 30L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("duplicateSpanProfile: overlapping dup spans count coverage once") {
    // one doc carries a 16-token run shared with another doc → two
    // overlapping width-15 spans, union coverage 16 (not 30)
    val run = (1 to 16).map(i => s"o$i").mkString(" ")
    val out = Curation.duplicateSpanProfile(
        docs(1L -> (run + " tail1 tail2 tail3 tail4"),
          2L -> ("pre1 pre2 " + run)),
        "doc_id", "text", 15, 900000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 16L, 1L))) // 16/20 = 80% < 90% → keep
    assert(out(2L) == ((2L, 16L, 1L)))
  }

  test("incrementalSpanProfile: refresh equivalence — incremental ≡ full restricted to new") {
    // 30 docs, every 4th a verbatim copy of doc 1 (cross-shard dups in
    // both directions), plus a within-new repeat; split 1/3 "new"
    val base = (1 to 15).map(j => s"c$j").mkString(" ")
    val df = (1L to 30L).map(i =>
      i -> (if (i % 4 == 0) base + s" tail$i" else (1 to 18).map(j => s"d${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(3)) === 0
    val inc = Curation.incrementalSpanProfile(
      df.filter(isNew), df.filter(!isNew), "doc_id", "text", 15, 200000L)
    val full = Curation.duplicateSpanProfile(df, "doc_id", "text", 15, 200000L)
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    assert(sortedRows(inc) == sortedRows(full))
    // the law is not vacuous: some new doc actually carries dup spans
    assert(inc.filter(col("dup_spans") > 0).count() > 0)
  }

  test("incrementalSpanProfile is partition-invariant") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val df = (1L to 30L).map(i =>
      i -> (if (i % 6 == 0) shared else (1 to 20).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    invariantUnderRepartition(
      d => Curation.incrementalSpanProfile(
        d.filter(col("doc_id") <= 10), d.filter(col("doc_id") > 10),
        "doc_id", "text", 15, 200000L), df)
  }

  test("duplicateSpanProfile is partition-invariant") {
    val shared = (1 to 25).map(i => s"s$i").mkString(" ")
    val df = (1L to 40L).map(i =>
      i -> (if (i % 5 == 0) shared else (1 to 25).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    invariantUnderRepartition(
      Curation.duplicateSpanProfile(_, "doc_id", "text", 15, 200000L), df)
  }

  // ---- budgetSelection ----

  /** The global prefix rule stated directly (driver-side): kept iff the
    * inclusive running token sum over (quality desc, doc_id) order fits
    * floor(total · frac). */
  private def budgetOracle(rows: Seq[(Long, Long, Long)], fracE6: Long): Map[Long, Long] = {
    val budget = rows.map(_._3).sum * fracE6 / 1000000L
    var cum = 0L
    rows.sortBy(r => (-r._2, r._1)).map { case (id, _, n) =>
      cum += n; id -> (if (cum <= budget) 1L else 0L)
    }.toMap
  }

  test("budgetSelection matches the global prefix rule exactly (boundary band included)") {
    // varied digit/stopword mixes → spread of quality scores, several docs
    // per band so the boundary band genuinely splits
    val df = (1L to 120L).map { i =>
      val stops = Seq.fill((i % 7).toInt)("the of and").mkString(" ")
      val digits = Seq.fill((i % 5).toInt)("42 7").mkString(" ")
      val words = (1 to 10 + (i % 13).toInt).map(j => s"w${(i + j) % 31}").mkString(" ")
      i -> s"$stops $digits $words"
    }.toDF("doc_id", "text")
    val got = Curation.budgetSelection(df, "doc_id", "text", 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = budgetOracle(got.map(r => (r._1, r._2, r._3)).toSeq, 300000L)
    assert(got.length == 120)
    got.foreach { case (id, _, _, kept) =>
      assert(kept == expect(id), s"doc $id kept=$kept expected ${expect(id)}") }
    // the budget genuinely bites: some kept, some dropped
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L))
  }

  test("budgetSelection is partition-invariant") {
    val df = (1L to 80L).map(i =>
      i -> ((1 to 8 + (i % 9).toInt).map(j => s"z${(i * j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    invariantUnderRepartition(Curation.budgetSelection(_, "doc_id", "text", 500000L), df)
  }

  // ---- NgramLm ----

  test("NgramLm: exact hand-computed add-one bigram costs") {
    import graft.operators.NgramLm
    // model "a b a c": bg {(a,b):1,(b,a):1,(a,c):1}, ctx {a:2,b:1}, V=3
    val (bg, ctx, v) = NgramLm.train(docs(1L -> "a b a c"), "text")
    val out = NgramLm.score(
        docs(10L -> "a b", 11L -> "z z", 12L -> "solo", 13L -> "a c a b"),
        "doc_id", "text", bg, ctx, v)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // (a,b): ln((2+3)/(1+1)) = ln 2.5 → 916290
    assert(out(10L) == ((1L, 916290L, 916290L)))
    // (z,z): unseen ctx and pair → ln((0+3)/(0+1)) = ln 3 → 1098612
    assert(out(11L) == ((1L, 1098612L, 1098612L)))
    // single token: no bigrams, zero cost
    assert(out(12L) == ((0L, 0L, 0L)))
    // (a,c)=ln2.5, (c,a)=ln((0+3)/1)=ln3, (a,b)=ln2.5 → 916290·2+1098612
    assert(out(13L) == ((3L, 2931192L, 977064L)))
    // in-domain text scores strictly lower than out-of-domain
    assert(out(10L)._3 < out(11L)._3)
  }

  test("q111 pipeline funnel is monotone and every stage engages") {
    // the end-to-end pipeline (quality → lang → dedup → span → decon →
    // LM → selection) must only ever shrink, and the corpus-level funnel
    // must genuinely drop docs at the gates (values themselves are
    // hash-pinned by the q111 oracle; this is the structural law)
    val out = SparkEntry.queries("q111_pretraining_pipeline")(spark, "/root/testdata/sf0.001")
      .collect()
    val cols = Seq("n_docs", "n_quality", "n_lang", "n_dedup", "n_span",
      "n_decon", "n_lm", "n_selected")
    out.foreach { r =>
      val seq = cols.map(c => r.getAs[Long](c))
      assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
        s"funnel not monotone: $seq for ${r.getAs[String]("source")}")
    }
    val totals = cols.map(c => out.map(_.getAs[Long](c)).sum)
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
    assert(totals.last > 0 && totals.last < totals.head,
      s"selection did not engage: $totals")
  }

  test("NgramLm score is partition-invariant") {
    import graft.operators.NgramLm
    val model = (1L to 30L).map(i =>
      i -> ((1 to 12).map(j => s"m${(i + j) % 9}").mkString(" "))).toDF("doc_id", "text")
    val cands = (1L to 50L).map(i =>
      i -> ((1 to 10).map(j => s"m${(i * j) % 14}").mkString(" "))).toDF("doc_id", "text")
    val (bg, ctx, v) = NgramLm.train(model, "text")
    invariantUnderRepartition(NgramLm.score(_, "doc_id", "text", bg, ctx, v), cands)
  }

  test("boundedHarmonic: hand-computed path, cycle, dup/self edges, isolated node") {
    import graft.operators.LinkGraph
    // path a->b->c->d (+ a dup edge and a self-loop that must be ignored),
    // plus isolated node x
    val nodes = Seq("a", "b", "c", "d", "x").toDF("node")
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst")
    val got = LinkGraph.boundedHarmonic(nodes, edges, 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("a") == ((0L, 0L, 0L, 0L)))
    assert(got("b") == ((1L, 0L, 0L, 1000000L))) // from a at 1
    assert(got("c") == ((1L, 1L, 0L, 1500000L))) // b at 1, a at 2
    assert(got("d") == ((1L, 1L, 1L, 1833333L))) // c at 1, b at 2, a at 3
    assert(got("x") == ((0L, 0L, 0L, 0L)))
    // 3-cycle: every node sees the other two at distances 1 and 2 —
    // and the k-hop frontier must NOT relabel an already-reached pair
    // with a longer distance (a->a at 3 is excluded as self)
    val cyc = LinkGraph.boundedHarmonic(
      Seq("p", "q", "r").toDF("node"),
      Seq(("p", "q"), ("q", "r"), ("r", "p")).toDF("src", "dst"), 3).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(cyc == Map("p" -> 1500000L, "q" -> 1500000L, "r" -> 1500000L))
    // hop monotonicity: widening the bound never lowers h_e6
    val h2 = LinkGraph.boundedHarmonic(nodes, edges, 2).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val h3 = LinkGraph.boundedHarmonic(nodes, edges, 3).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(h2.forall { case (n, h) => h <= h3(n) })
  }
}
