package graft

import graft.operators.SamplerState
import org.scalatest.funsuite.AnyFunSuite

/** End-user demo wiring (the example-apps twin): batches draw, state
  * round-trips, capacity report formats. */
class DemoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val cfg = Demo.DemoConfig(batch = 6, batches = 2)

  test("demo run: two triplet batches advance the persisted counters; resume continues") {
    val end = Demo.run(spark, cfg, SamplerState("demospec", 0L, Map.empty))
    assert(end.counter("draw") == 12L)
    // resume from the returned state: next batch draws 12..17
    val end2 = Demo.run(spark, cfg.copy(batches = 1), end)
    assert(end2.counter("draw") == 18L)
    // JSON round-trip is what main persists between invocations
    val path = java.nio.file.Files.createTempFile("demo_state", ".json").toString
    SamplerState.save(end2, path)
    assert(SamplerState.load(path).contains(end2))
  }

  test("capacity report: formatted rows for every (source, split), commas + replay") {
    val lines = Demo.capacityReport(spark, cfg)
    assert(lines.head.contains("raw_pairs"))
    assert(lines.length > 10)
    assert(lines.tail.forall(_.matches(".*\\d.*(\\d+\\.\\d\\dx|n/a)\\s*$")))
    assert(Demo.withCommas(1234567L) == "1,234,567")
    assert(Demo.withCommas(42L) == "42")
    assert(Demo.replayFactor(100, 40) == "2.50x" && Demo.replayFactor(0, 5) == "n/a")
  }

  test("curate report: header + per-source rows + TOTAL footer, funnel visible") {
    val lines = Demo.curateReport(spark, cfg)
    assert(lines.head.contains("selected") && lines.head.contains("quality"))
    assert(lines.last.startsWith("TOTAL"))
    assert(lines.length > 10)
    // the footer's funnel columns are monotone left to right
    val totals = lines.last.split("\\s+").tail.take(8)
      .map(_.replace(",", "").toLong)
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
  }

  test("stats report: per-source mass + hll vocab, cms top-token estimates one-sided") {
    val lines = Demo.statsReport(spark, cfg)
    assert(lines.head.contains("vocab(hll)"))
    val split = lines.indexWhere(_.startsWith("top tokens"))
    assert(split > 1, "no top-tokens section")
    val srcRows = lines.slice(1, split)
    assert(srcRows.nonEmpty && srcRows.forall(_.matches("^src.*\\d.*$")))
    val tok = lines.drop(split + 1).map(_.trim.split("\\s+"))
    assert(tok.nonEmpty)
    // cms estimates are one-sided: est >= exact on every reported token
    tok.foreach { parts =>
      val exact = parts(1).replace(",", "").toLong
      val est = parts(2).replace(",", "").toLong
      assert(est >= exact, s"cms under-estimated ${parts(0)}: $est < $exact")
    }
  }

  test("tokenize report: trio rows, pieces >= words, sample segmentations") {
    val lines = Demo.tokenizeReport(spark, cfg)
    assert(lines.head.contains("scheme"))
    def pieces(name: String): Long = lines.find(_.startsWith(name)).get
      .trim.split("\\s+")(1).replace(",", "").toLong
    val words = pieces("words")
    for (scheme <- Seq("bpe", "wordpiece", "unigram"))
      assert(pieces(scheme) >= words, s"$scheme produced fewer pieces than words")
    val split = lines.indexWhere(_.startsWith("sample segmentations"))
    assert(split > 0)
    val samples = lines.drop(split + 1)
    assert(samples.nonEmpty && samples.forall(l =>
      l.contains("bpe[") && l.contains("wp[") && l.contains("ug[")))
  }

  test("ann report: header + one recall line per query, recall within [0, k]") {
    val lines = Demo.annReport(spark, cfg)
    assert(lines.head.contains("residual IVF-PQ") && lines.head.contains("nprobe"))
    val qLines = lines.tail
    assert(qLines.size == 5)
    val rec = """recall@5 = (\d)/5""".r
    qLines.foreach { l =>
      val m = rec.findFirstMatchIn(l)
      assert(m.isDefined, s"no recall field in: $l")
      val h = m.get.group(1).toInt
      assert(h >= 0 && h <= 5)
      assert(l.contains("top-5:"))
    }
  }

  test("intake report: arrivals exceed survivors (planted duplicates dropped), index grown") {
    val lines = Demo.intakeReport(spark, cfg)
    assert(lines.exists(_.contains("streaming intake")))
    val arrivals = """(\d+) arrivals""".r.findFirstMatchIn(lines.head).get.group(1).toLong
    val survivors = """survivors: (\d+) docs""".r
      .findFirstMatchIn(lines(1)).get.group(1).toLong
    assert(survivors > 0 && survivors < arrivals,
      s"planted re-sends must drop: $survivors of $arrivals")
    assert(lines(2).contains("postings"))
  }

  test("crawl report: strictly shrinking funnel, blocklist and dup planting visible") {
    val lines = Demo.crawlReport(spark, cfg)
    def n(i: Int) = """(\d+)$""".r.findFirstIn(lines(i).trim).get.toLong
    val Seq(n0, n1, n2, n3, n4) = (0 to 4).map(n)
    assert(n0 == 180L) // 3 segments x 60 responses
    // every stage drops something (the fixture plants spam domain,
    // over-cap domains, short pages, and duplicate bodies)
    assert(n0 > n1 && n1 > n2 && n2 > n3 && n3 > n4 && n4 > 0,
      s"funnel $n0 -> $n1 -> $n2 -> $n3 -> $n4")
    assert(lines(5).contains("top kept domains"))
    assert(lines.size > 6 && lines(6).trim.startsWith("site"))
  }
}
