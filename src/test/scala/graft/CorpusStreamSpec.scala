package graft

import graft.operators.{Bm25Index, Dedup}
import graft.streaming.CorpusStream
import graft.streaming.CorpusStream.IntakeConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws for the streaming corpus-intake composition: exact + near-dup
  * dedup against the standing stores, batch-keyed idempotent publishes,
  * and the BM25 delta-union refresh law — all through the real
  * foreachBatch stream as well as the pure per-batch transition. */
class CorpusStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val cfg = IntakeConfig(numPerms = 8, shingleSize = 3,
    numBands = 4, rowsPerBand = 2, minAgree = 6)

  // Engineered fixture. Near-dup pairs are 24-token texts differing only
  // in the final token (21 of 23 shingles shared, J = 21/23) so signature
  // agreement clears the 6/8 bar — asserted explicitly in the sanity
  // test, not assumed — while distinct docs share no shingle.
  //   batch 0: 1 (base A), 2 (exact dup of 1), 3 (near-dup of 1 —
  //            keep-min component drops it), 4 (distinct B), 5 (blank)
  //   batch 1: 10 (exact dup of 1 — standing hash wins),
  //            11 (near-dup of 1 — standing sig wins),
  //            12 (distinct C), 13 (blank — exact dup of 5)
  //   batch 2: 20/21 (near-dups of each other, both novel vs corpus —
  //            keep-min keeps 20), 22 (near-dup of standing 12)
  private def long24(ts: String*) = { require(ts.size == 24); ts.mkString(" ") }
  private val greek = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
    "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi")
  private val tA = long24(greek :+ "omega": _*)
  private val tA2 = long24(greek :+ "digamma": _*)
  private val nums = Seq("one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
    "fifteen", "sixteen", "seventeen", "eighteen", "nineteen", "twenty",
    "thirty", "forty", "fifty", "sixty")
  private val tB = long24(nums: _*)
  private val colors = Seq("red", "orange", "yellow", "green", "blue", "indigo",
    "violet", "umber", "sepia", "ochre", "teal", "cyan", "magenta", "maroon",
    "olive", "navy", "coral", "ivory", "beige", "plum", "mint", "rose", "jade")
  private val tC = long24(colors :+ "gold": _*)
  private val tC2 = long24(colors :+ "silver": _*)
  private val dirs = Seq("north", "south", "east", "west", "up", "down",
    "left", "right", "fore", "aft", "port", "starboard", "windward",
    "leeward", "inboard", "outboard", "ahead", "astern", "above", "below",
    "inside", "outside", "across")
  private val tD = long24(dirs :+ "beyond": _*)
  private val tD2 = long24(dirs :+ "between": _*)

  private def batches: Seq[Seq[(Long, String)]] = Seq(
    Seq(1L -> tA, 2L -> tA, 3L -> tA2, 4L -> tB, 5L -> ""),
    Seq(10L -> tA, 11L -> tA2, 12L -> tC, 13L -> ""),
    Seq(20L -> tD, 21L -> tD2, 22L -> tC2))

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // expected survivors (derived by hand from the rules above):
  //   b0: 1 (2 exact-dropped, 3 keep-min-dropped), 4, 5
  //   b1: 12 (10 exact vs standing, 11 near vs standing, 13 blank exact)
  //   b2: 20 (21 keep-min-dropped, 22 near vs standing 12)
  private val ExpectIds = Set(1L, 4L, 5L, 12L, 20L)

  private def runLoop(stateDir: String): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      CorpusStream.applyBatch(spark, df(rows), i.toLong, stateDir, cfg)
    }

  test("fixture sanity: engineered pairs VERIFY at the agreement bar") {
    val all = df(batches.flatten)
    val sigs = Dedup.minhashSignatures(all, "doc_id", "text",
      cfg.numPerms, cfg.shingleSize)
    val mh = (0 until cfg.numPerms).map(j => s"mh$j")
    val sa = col("doc_id").as("aid") +: mh.map(c => col(c).as(s"a_$c"))
    val sb = col("doc_id").as("bid") +: mh.map(c => col(c).as(s"b_$c"))
    val agree = mh.map(c =>
      when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L)).reduce(_ + _)
    val verified = Dedup.lshCandidatePairs(sigs, "doc_id", cfg.numBands, cfg.rowsPerBand)
      .join(sigs.select(sa: _*), col("a") === col("aid"))
      .join(sigs.select(sb: _*), col("b") === col("bid"))
      .filter(agree >= cfg.minAgree)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every engineered near-dup relation clears the bar (not merely
    // band-collides) — the expected-survivor derivation rests on these
    assert(verified.contains((1L, 3L)))
    assert(verified.contains((1L, 11L)) && verified.contains((3L, 11L)))
    assert(verified.contains((20L, 21L)))
    assert(verified.contains((12L, 22L)))
    // distinct families never pair
    assert(!verified.exists { case (a, b) =>
      Set(a, b) == Set(1L, 4L) || Set(a, b) == Set(4L, 12L) })
  }

  test("per-batch transition: survivors, hash uniqueness, no verified pair retained") {
    val stateDir = Files.createTempDirectory("graft_intake").toString
    runLoop(stateDir)
    val corpus = CorpusStream.corpus(spark, stateDir).get
    val got = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == ExpectIds)
    // retained content hashes are unique
    val hashes = corpus.select(graft.core.Determinism.portableHash(
      graft.functions.TextFunctions.normalizeWs(col("text"))).as("h"))
      .collect().map(_.getLong(0))
    assert(hashes.length == hashes.distinct.length)
    // no verified near-dup pair among retained docs (the invariant the
    // stream exists to maintain): recompute batch-mode over the corpus
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text",
      cfg.numPerms, cfg.shingleSize)
    val mh = (0 until cfg.numPerms).map(j => s"mh$j")
    val sa = col("doc_id").as("aid") +: mh.map(c => col(c).as(s"a_$c"))
    val sb = col("doc_id").as("bid") +: mh.map(c => col(c).as(s"b_$c"))
    val agree = mh.map(c =>
      when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L)).reduce(_ + _)
    val verified = Dedup.lshCandidatePairs(sigs, "doc_id", cfg.numBands, cfg.rowsPerBand)
      .join(sigs.select(sa: _*), col("a") === col("aid"))
      .join(sigs.select(sb: _*), col("b") === col("bid"))
      .filter(agree >= cfg.minAgree)
    assert(verified.count() == 0L)
  }

  test("BM25 store == build over the final corpus (refresh union law)") {
    val stateDir = Files.createTempDirectory("graft_intake_bm").toString
    runLoop(stateDir)
    val corpus = CorpusStream.corpus(spark, stateDir).get
    val idx = CorpusStream.index(spark, stateDir).get
    val full = Bm25Index.build(corpus, "doc_id", "text")
    def rows(d: DataFrame) = d.collect().map(_.toSeq).toSet
    assert(rows(idx.postings) == rows(full.postings))
    assert(rows(idx.docLens) == rows(full.docLens))
    assert(rows(idx.postings).nonEmpty)
  }

  test("replaying the last batch is a no-op (idempotent publish)") {
    val stateDir = Files.createTempDirectory("graft_intake_replay").toString
    runLoop(stateDir)
    def snapshot() = {
      val c = CorpusStream.corpus(spark, stateDir).get
        .collect().map(_.toSeq).toSet
      val p = CorpusStream.index(spark, stateDir).get.postings
        .collect().map(_.toSeq).toSet
      (c, p)
    }
    val before = snapshot()
    // crash-replay of the final micro-batch: same id, same rows
    CorpusStream.applyBatch(spark, df(batches(2)), 2L, stateDir, cfg)
    assert(snapshot() == before)
  }

  test("partial-crash replay heals a skipped store (own-batch stores are not standing state)") {
    val stateDir = Files.createTempDirectory("graft_intake_heal").toString
    runLoop(stateDir)
    val before = CorpusStream.index(spark, stateDir).get.postings
      .collect().map(_.toSeq).toSet
    // simulate a crash between the hashes/b2 publish and the bm25/b2
    // publish: the index delta is missing while the batch's hashes exist.
    // The replay must NOT see b2's own hashes as standing state (its
    // arrivals would all self-drop and the delta would stay lost).
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    rmTree(java.nio.file.Paths.get(s"$stateDir/bm25/b2"))
    CorpusStream.applyBatch(spark, df(batches(2)), 2L, stateDir, cfg)
    val after = CorpusStream.index(spark, stateDir).get.postings
      .collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("a re-sent doc_id with MUTATED text drops: records are immutable, the standing id wins") {
    val stateDir = Files.createTempDirectory("graft_intake_mut").toString
    runLoop(stateDir)
    val before = CorpusStream.corpus(spark, stateDir).get
      .collect().map(_.toSeq).toSet
    // doc 4 re-arrives with fresh-vocabulary content (no hash or
    // near-dup relation to anything standing — ONLY the id rule can
    // drop it); admitting it would duplicate the id in the store
    val mutated = (Seq("iron", "copper", "zinc", "tin", "lead", "nickel",
      "cobalt", "chrome", "silver", "gold", "platinum", "mercury",
      "sodium", "lithium", "cesium", "barium", "radium", "argon",
      "neon", "xenon", "krypton", "helium", "boron", "carbon")).mkString(" ")
    CorpusStream.applyBatch(spark, df(Seq(4L -> mutated)), 3L, stateDir, cfg)
    assert(CorpusStream.corpus(spark, stateDir).get
      .collect().map(_.toSeq).toSet == before)
  }

  test("single-batch intake == the batch dedup pipeline (q20 + keep-min components)") {
    val stateDir = Files.createTempDirectory("graft_intake_one").toString
    val all = df(batches.flatten)
    CorpusStream.applyBatch(spark, all, 0L, stateDir, cfg)
    val got = CorpusStream.corpus(spark, stateDir).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch twin: exact keep-min per hash, then CC keep-min over verified
    // pairs — derived with the standalone operators
    val hashed = all.withColumn("h", graft.core.Determinism.portableHash(
      graft.functions.TextFunctions.normalizeWs(col("text"))))
    val exact = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .join(all, Seq("doc_id"))
    val sigs = Dedup.minhashSignatures(exact, "doc_id", "text",
      cfg.numPerms, cfg.shingleSize)
    val mh = (0 until cfg.numPerms).map(j => s"mh$j")
    val sa = col("doc_id").as("aid") +: mh.map(c => col(c).as(s"a_$c"))
    val sb = col("doc_id").as("bid") +: mh.map(c => col(c).as(s"b_$c"))
    val agree = mh.map(c =>
      when(col(s"a_$c") === col(s"b_$c"), 1L).otherwise(0L)).reduce(_ + _)
    val verified = Dedup.lshCandidatePairs(sigs, "doc_id", cfg.numBands, cfg.rowsPerBand)
      .join(sigs.select(sa: _*), col("a") === col("aid"))
      .join(sigs.select(sb: _*), col("b") === col("bid"))
      .filter(agree >= cfg.minAgree).select(col("a"), col("b"))
    val comps = Dedup.connectedComponents(
      exact.select(col("doc_id").as("id")), verified)
    val expect = comps.filter(col("id") === col("cluster"))
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.contains(1L) && got.contains(4L))
  }

  test("partition invariance: a 7-way repartitioned arrival yields identical survivors") {
    val a = Files.createTempDirectory("graft_intake_p1").toString
    val b = Files.createTempDirectory("graft_intake_p7").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      CorpusStream.applyBatch(spark, df(rows), i.toLong, a, cfg)
      CorpusStream.applyBatch(spark, df(rows).repartition(7), i.toLong, b, cfg)
    }
    def rows(dir: String) = CorpusStream.corpus(spark, dir).get
      .collect().map(_.toSeq).toSet
    assert(rows(a) == rows(b))
    assert(rows(a).nonEmpty)
  }

  test("random batch sequences: intake == an independent union-find simulation") {
    import org.scalacheck.{Gen, Prop}
    // Independent oracle for the WHOLE intake state machine: signatures
    // and content hashes come from the engine's own operators (their
    // cross-engine correctness is q21/q20's business), but every dedup
    // DECISION — id rule, in-batch keep-min, standing-hash rule,
    // band-collision + agreement verification, drop-vs-retained,
    // keep-min components via union-find — is reimplemented here in
    // plain Scala over collected maps. Sharing the signatures makes the
    // comparison exact (no per-pair agreement coin flips to tolerate).
    val fams = (0 until 6).map(f => (0 until 24).map(j => s"f${f}t$j"))
    def textOf(fam: Int, variant: Int): String = variant match {
      case 0 => fams(fam).mkString(" ")
      case 3 => ""
      case m => (fams(fam).init :+ s"f${fam}mut$m").mkString(" ")
    }
    val genDocs: Gen[(Seq[(Long, String)], Seq[Int])] = for {
      n <- Gen.choose(8, 18)
      specs <- Gen.listOfN(n, for {
        fam <- Gen.choose(0, 5)
        variant <- Gen.frequency(3 -> 0, 2 -> 1, 2 -> 2, 1 -> 3)
        resend <- Gen.frequency(4 -> false, 1 -> true)
      } yield (fam, variant, resend))
      cut1 <- Gen.choose(1, n - 1)
      cut2 <- Gen.choose(1, n - 1)
    } yield {
      val rows = specs.zipWithIndex.map { case ((fam, variant, resend), i) =>
        // a "resend" reuses an earlier doc's id with THIS spec's text —
        // covering identical replays and mutated re-sends alike
        val id = if (resend && i > 0) (i / 2 + 1).toLong else (i + 1).toLong
        (id, textOf(fam, variant))
      }
      (rows, Seq(cut1 min cut2, cut1 max cut2).distinct)
    }
    val p = Prop.forAll(genDocs) { case (rows0, cuts) =>
      // partition into batches at the cut points, then enforce the feed
      // contract doc_id-unique-per-batch (first occurrence wins) — the
      // same rows drive engine and simulation
      val batchesSim: Seq[Seq[(Long, String)]] = {
        val sorted = cuts.filter(c => c > 0 && c < rows0.size).distinct.sorted
        val bounds = (0 +: sorted :+ rows0.size).distinct
        bounds.zip(bounds.tail).map { case (a, b) =>
          rows0.slice(a, b).distinctBy(_._1) }.filter(_.nonEmpty)
      }
      // engine-computed hash/signature per distinct TEXT (id-independent
      // values; decisions below are reimplemented, these inputs shared)
      val texts = rows0.map(_._2).distinct
      val tdf = df(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      val hashByText = tdf.select(col("doc_id"), graft.core.Determinism.portableHash(
          graft.functions.TextFunctions.normalizeWs(col("text"))).as("h"))
        .collect().map(r => texts(r.getLong(0).toInt) -> r.getLong(1)).toMap
      val sigByText = Dedup.minhashSignatures(tdf, "doc_id", "text",
          cfg.numPerms, cfg.shingleSize).collect()
        .map(r => texts(r.getLong(0).toInt) ->
          (0 until cfg.numPerms).map(j => r.getLong(1 + j)).toVector).toMap
      def bandsOf(s: Vector[Long]) = s.grouped(cfg.rowsPerBand).toVector
      def verified(a: Vector[Long], b: Vector[Long]) =
        bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y } &&
          a.zip(b).count { case (x, y) => x == y } >= cfg.minAgree

      // --- the plain-Scala simulation ---
      var retIds = Set.empty[Long]
      var retHashes = Set.empty[Long]
      var retSigs = Map.empty[Long, Vector[Long]]
      val simSurvivors = Set.newBuilder[Long]
      batchesSim.foreach { b =>
        val afterId = b.filterNot(r => retIds(r._1))
        val exact = afterId.groupBy(r => hashByText(r._2))
          .map { case (h, rs) => (rs.minBy(_._1), h) }.toSeq
          .filterNot { case (_, h) => retHashes(h) }
        val newSigs: Map[Long, Vector[Long]] = exact.flatMap { case ((id, t), _) =>
          sigByText.get(t).map(id -> _) }.toMap
        val dropVsOld = newSigs.collect {
          case (id, s) if retSigs.exists { case (_, os) => verified(s, os) } => id
        }.toSet
        val kept1 = exact.map(_._1).filterNot { case (id, _) => dropVsOld(id) }
        val kept1Sigs = newSigs.filter { case (id, _) => kept1.exists(_._1 == id) }
        // union-find (min-label) over verified new-new pairs
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        for {
          (a, sa) <- kept1Sigs; (b2, sb) <- kept1Sigs
          if a < b2 && verified(sa, sb)
        } { val (ra, rb) = (find(a), find(b2)); if (ra != rb) parent(ra max rb) = ra min rb }
        val survivors = kept1.filter { case (id, _) => find(id) == id }
        simSurvivors ++= survivors.map(_._1)
        retIds ++= survivors.map(_._1)
        retHashes ++= survivors.map { case (_, t) => hashByText(t) }
        retSigs ++= survivors.flatMap { case (id, t) => sigByText.get(t).map(id -> _) }
      }

      // --- the engine over the same batches ---
      val stateDir = Files.createTempDirectory("graft_intake_sim").toString
      batchesSim.zipWithIndex.foreach { case (b, i) =>
        CorpusStream.applyBatch(spark, df(b), i.toLong, stateDir, cfg)
      }
      val got = CorpusStream.corpus(spark, stateDir)
        .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long])
      got == simSurvivors.result()
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("streaming foreachBatch intake == the applyBatch loop") {
    val srcDir = Files.createTempDirectory("graft_intake_src").toString
    val stateDir = Files.createTempDirectory("graft_intake_stream").toString
    val loopDir = Files.createTempDirectory("graft_intake_loop").toString
    // one parquet FILE per batch so maxFilesPerTrigger=1 replays the
    // same grain (file order = lexicographic name order)
    batches.zipWithIndex.foreach { case (rows, i) =>
      df(rows).coalesce(1).write.mode("overwrite").parquet(s"/tmp/graft_cs_stage$i")
      val part = new java.io.File(s"/tmp/graft_cs_stage$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$srcDir/batch$i.parquet"))
    }
    val q = CorpusStream.intake(spark, srcDir, df(batches.head).schema, stateDir, cfg)
    q.awaitTermination()
    runLoop(loopDir)
    def ids(dir: String) = CorpusStream.corpus(spark, dir).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(stateDir) == ids(loopDir))
    assert(ids(stateDir) == ExpectIds)
    // and the streamed BM25 store obeys the same union law
    val idx = CorpusStream.index(spark, stateDir).get
    val full = Bm25Index.build(CorpusStream.corpus(spark, stateDir).get, "doc_id", "text")
    assert(idx.postings.collect().map(_.toSeq).toSet ==
      full.postings.collect().map(_.toSeq).toSet)
  }
}
