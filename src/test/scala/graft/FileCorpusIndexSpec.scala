package graft

import graft.core.IndexPermutation
import graft.sources.{FileCorpusIndex, FileCorpusIndexConfig, RecordCache, RollingRecordCache}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}

/** Persisted file-corpus index + permutation paging + grouped order +
  * bounded record cache — each pinned against a direct sequential
  * simulation of the reference's mutable loops
  * (src/source/indexing/file_corpus.rs, grouping.rs, src/ingestion.rs). */
class FileCorpusIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------------
  // IndexPermutation (reference src/source/mod.rs:316-368)
  // ------------------------------------------------------------------

  test("index permutation: one sweep visits every index exactly once") {
    for (total <- Seq(1L, 2L, 7L, 26L, 64L, 100L); seed <- Seq(0L, 7L, 0xdeadbeefL)) {
      val p = new IndexPermutation(total, seed, 0)
      val seen = Seq.fill(total.toInt)(p.next())
      assert(seen.sorted == (0L until total), s"total=$total seed=$seed")
    }
  }

  test("index permutation: restart from the stored cursor continues deterministically") {
    val p = new IndexPermutation(26, 99, 0)
    val first = Seq.fill(10)(p.next())
    val resumed = new IndexPermutation(26, 99, p.counter)
    val p2 = new IndexPermutation(26, 99, 0)
    Seq.fill(10)(p2.next())
    assert(Seq.fill(5)(resumed.next()) == Seq.fill(5)(p2.next()))
    assert(first.distinct.size == 10)
  }

  test("page indices replicate the 256-batched counter advance") {
    val dir = Files.createTempDirectory("fci_page").toString
    val root = mkCorpus(dir, (1 to 30).map(i => f"g/a$i%02d.txt"))
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "pg", 3L, indexDir = dir + "/idx"))
    fci.rebuild(spark)
    // limit 5 < total 30 < 256: the reference loop pushes ALL 30 candidates
    // before the final flush notices the limit — cursor = counter after a
    // full sweep, not after the 5th hit
    val (page, cur) = fci.pageIndices(30, 0, 5)
    assert(page.size == 5 && page.distinct.size == 5)
    val sweep = new IndexPermutation(30, fci.orderSeed(30), 0)
    Seq.fill(30)(sweep.next())
    assert(cur == sweep.cursor)
  }

  // ------------------------------------------------------------------
  // persisted index (file_corpus.rs:285-457)
  // ------------------------------------------------------------------

  private def mkCorpus(dir: String, rels: Seq[String]): String = {
    val root = Paths.get(dir, "corpus")
    rels.foreach { rel =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s"body $rel".getBytes("UTF-8"))
    }
    root.toString
  }

  test("persisted index: reload reuses, flag mismatch rebuilds, count is metadata-only") {
    val dir = Files.createTempDirectory("fci_meta").toString
    val root = mkCorpus(dir, Seq("a/x.txt", "a/y.txt", "b/z.txt", "b/n.bin"))
    val cfg = FileCorpusIndexConfig(root, "ms", 1L, indexDir = dir + "/idx")
    val fci = new FileCorpusIndex(cfg)
    assert(fci.loadOrBuild(spark).count == 4)
    // delete a file: the PERSISTED count must survive (no re-listing)
    Files.delete(Paths.get(root, "b/z.txt"))
    assert(fci.indexedRecordCount(spark) == 4, "metadata-only count re-listed the corpus")
    // a flag mismatch invalidates the meta and rebuilds (reference
    // read_index_meta → None, file_corpus.rs:373-396)
    val fciTxt = new FileCorpusIndex(cfg.copy(textFilesOnly = true))
    assert(fciTxt.loadOrBuild(spark).count == 2, "rebuild should drop .bin and the deleted file")
  }

  test("index order is the absolute-path sort with positions 0..n-1") {
    val dir = Files.createTempDirectory("fci_ord").toString
    val root = mkCorpus(dir, Seq("b/2.txt", "a/1.txt", "c/3.txt"))
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "so", 1L, indexDir = dir + "/idx"))
    fci.rebuild(spark)
    val rows = fci.indexDf(spark).orderBy("idx").collect()
    assert(rows.map(_.getAs[String]("rel")).toSeq == Seq("a/1.txt", "b/2.txt", "c/3.txt"))
    assert(rows.map(_.getAs[Long]("idx")).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[String]("group")).toSeq == Seq("a", "b", "c"))
  }

  // ------------------------------------------------------------------
  // grouped order vs a direct simulation of grouping.rs:46-139
  // ------------------------------------------------------------------

  /** Direct pop-loop port of deterministic_grouped_order (the mutable
    * reference shape) — the independent twin the distributed plan must
    * match. */
  private def simulateGroupedOrder(items: Seq[(String, String)], seed: Long,
      windowSize: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    if (windowSize == 1) return items
    val grouped = items.groupBy(_._2)
    val keys = grouped.keys.toSeq
      .sortBy(k => (graft.core.Determinism.jvmHash(s"fcig:$seed:$k"), k))
    val queues = mutable.LinkedHashMap(keys.map { k =>
      k -> mutable.Queue(grouped(k).sortBy { case (rel, g) =>
        (graft.core.Determinism.jvmHash(s"fcii:$seed:$g/$rel"), rel)
      }: _*)
    }: _*)
    val order = mutable.Buffer[(String, String)]()
    var remaining = items.size.toLong
    while (remaining > 0) {
      val windowLen = math.min(remaining, windowSize)
      val active = keys.filter(k => queues(k).nonEmpty)
      if (active.isEmpty) return order.toSeq
      val cap = (windowLen + active.size - 1) / active.size
      var produced = 0L
      for (k <- active if produced < windowLen) {
        var take = math.min(cap, windowLen - produced)
        while (take > 0 && queues(k).nonEmpty) {
          order += queues(k).dequeue()
          produced += 1; remaining -= 1; take -= 1
        }
      }
    }
    order.toSeq
  }

  test("grouped order: distributed plan == sequential pop-loop simulation, incl. underfill") {
    val dir = Files.createTempDirectory("fci_grp").toString
    // skewed: big 14, solo 1, duo 2, mid 5 → windows underfill once caps bind
    val rels = (1 to 14).map(i => f"big/b$i%02d.txt") ++ Seq("solo/s.txt") ++
      (1 to 2).map(i => s"duo/d$i.txt") ++ (1 to 5).map(i => f"mid/m$i.txt")
    val root = mkCorpus(dir, rels)
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "go", 5L,
      indexDir = dir + "/idx", groupWindowDivisor = 4))
    fci.rebuild(spark)
    val total = rels.size.toLong
    val got = fci.groupedOrder(spark).orderBy("pos").collect()
      .map(r => (r.getAs[String]("rel"), r.getAs[String]("group"))).toSeq
    val items = rels.sorted.map(r => (r, r.split('/').dropRight(1).mkString("/")))
    val want = simulateGroupedOrder(items, fci.orderSeed(total), total / 4)
    assert(got == want)
    // partition invariance
    val got13 = fci.groupedOrder(spark).repartition(13).orderBy("pos").collect()
      .map(r => (r.getAs[String]("rel"), r.getAs[String]("group"))).toSeq
    assert(got13 == want)
  }

  test("grouped order: windowSize 1 degenerates to the plain permutation order") {
    val dir = Files.createTempDirectory("fci_w1").toString
    val rels = Seq("a/1.txt", "a/2.txt", "b/3.txt", "b/4.txt", "c/5.txt")
    val root = mkCorpus(dir, rels)
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "w1", 2L,
      indexDir = dir + "/idx", groupWindowDivisor = 5)) // 5/5 = windowSize 1
    fci.rebuild(spark)
    val got = fci.groupedOrder(spark).orderBy("pos").collect().map(_.getAs[Long]("idx")).toSeq
    val perm = new IndexPermutation(5, fci.orderSeed(5), 0)
    assert(got == Seq.fill(5)(perm.next()))
  }

  // ------------------------------------------------------------------
  // capped grouped refresh vs file_corpus.rs:509-601's walk
  // ------------------------------------------------------------------

  test("grouped refresh: capped walk == sequential simulation, wraparound + steps cursor") {
    val dir = Files.createTempDirectory("fci_ref").toString
    val rels = (1 to 9).map(i => s"x/a$i.txt") ++ (1 to 3).map(i => s"y/b$i.txt") ++
      Seq("z/c1.txt")
    val root = mkCorpus(dir, rels)
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "gr", 11L,
      indexDir = dir + "/idx", groupWindowDivisor = 3))
    fci.rebuild(spark)
    val order = fci.groupedOrder(spark).orderBy("pos").collect()
      .map(r => (r.getAs[String]("rel"), r.getAs[String]("group"))).toSeq
    for ((start, limit) <- Seq((0L, 5), (10L, 6), (12L, 4), (99L, 3))) {
      val (rows, next) = fci.refreshGrouped(spark, start, limit)
      val got = rows.orderBy("sel").collect().map(_.getAs[String]("rel")).toSeq
      // sequential walk (the reference loop, verbatim semantics)
      val l = order.size
      val s0 = if (start >= l) 0L else start
      val nGroups = order.map(_._2).distinct.size
      val cap = math.max((limit + nGroups - 1) / nGroups, 1)
      val perGroup = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      val taken = scala.collection.mutable.Buffer[String]()
      var steps = 0L
      var i = 0
      while (i < l && taken.size < limit) {
        val (rel, g) = order(((s0 + i) % l).toInt)
        steps += 1
        if (perGroup(g) < cap) { taken += rel; perGroup(g) += 1 }
        i += 1
      }
      if (taken.size < limit) steps = l
      assert(got == taken.toSeq, s"start=$start limit=$limit")
      assert(next == (s0 + steps) % l, s"cursor start=$start limit=$limit")
    }
  }

  test("page records: a served page reads ONLY its paths and builds FileSource-identical records") {
    val dir = Files.createTempDirectory("fci_rec").toString
    val rels = Seq("src/2025-01-01/alpha_doc.txt", "src/2025-01-02/beta_doc.txt",
      "src/2025-01-03/gamma_doc.txt", "src/2025-01-04/delta_doc.txt")
    val root = mkCorpus(dir, rels)
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, "pr", 9L, indexDir = dir + "/idx"))
    fci.rebuild(spark)
    val (page, _) = fci.refreshIndexable(spark, 0L, 2)
    val recs = fci.pageRecords(spark, page).collect().sortBy(_.id)
    assert(recs.length == 2)
    // identical semantics to the full FileSource scan, restricted to the page
    val pageRels = page.collect().map(_.getAs[String]("rel")).toSet
    val full = graft.sources.FileSource.read(spark,
        graft.sources.FileSourceConfig("pr", root))
      .collect().filter(r => pageRels.contains(r.id.stripPrefix("pr::"))).sortBy(_.id)
    assert(recs.toSeq == full.toSeq)
    // stem → anchor and folder date both came through
    assert(recs.forall(_.taxonomy.exists(_.startsWith("date=2025-01-"))))
  }

  // ------------------------------------------------------------------
  // RecordCache vs a direct simulation of ingestion.rs:137-187
  // ------------------------------------------------------------------

  /** IndexMap+VecDeque twin of ingest_batch/enforce_limit. */
  private def simulateCache(stream: Seq[(Long, Long)], cap: Int): Seq[(Long, Long)] = {
    import scala.collection.mutable
    val records = mutable.LinkedHashMap[Long, Long]() // insertion-ordered like IndexMap
    val order = mutable.ArrayDeque[Long]()
    for ((id, v) <- stream) {
      if (records.contains(id)) {
        records(id) = v
        order.remove(order.indexOf(id))
        order.append(id)
      } else {
        order.append(id)
        records(id) = v
      }
      if (cap == 0) { records.clear(); order.clear() }
      else while (records.size > cap) { records.remove(order.removeHead()) }
    }
    records.toSeq
  }

  test("record cache: closed form == FIFO-with-replace simulation on random streams") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (cap <- Seq(1, 5, 17); trial <- 1 to 3) {
      val stream = (1L to 120L).map(v => (rng.nextInt(30).toLong, v))
      val want = simulateCache(stream, cap).sortBy(_._2)
      val got = RecordCache.finalSnapshot(
          stream.toDF("id", "version"), "id", "version", cap)
        .orderBy("version").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"cap=$cap trial=$trial")
    }
  }

  test("record cache: cap 0 clears everything (reference enforce_limit)") {
    import spark.implicits._
    val got = RecordCache.finalSnapshot(
      Seq((1L, 1L), (2L, 2L)).toDF("id", "version"), "id", "version", 0)
    assert(got.count() == 0)
  }

  test("rolling cache: incremental folds == one-shot closed form; counters + wait") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val stream = (1L to 90L).map(v => (rng.nextInt(20).toLong, v))
    val cache = new RollingRecordCache(spark, 8, "id", "seq")
    assert(cache.isEmpty && cache.ingestCount == 0)
    stream.grouped(25).foreach { batch =>
      cache.ingest(batch.map { case (id, v) => (id, v) }.toDF("id", "seq"))
    }
    assert(cache.ingestCount == 4)
    assert(cache.waitForIngest(3, 50) == 4) // already past: returns without blocking
    assert(cache.waitForIngest(4, 50) == 4) // times out at the current count
    val got = cache.snapshot().orderBy("version").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("version"))).toSeq
    val want = simulateCache(stream, 8).map { case (id, v) => (id, v) }.sortBy(_._2)
    // versions are 1-based ingest positions — identical numbering
    assert(got == want)
    assert(cache.len() == 8)
    cache.clear()
    assert(cache.isEmpty)
  }
}
