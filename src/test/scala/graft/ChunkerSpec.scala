package graft

import graft.core.ChunkView
import graft.operators.{Chunker, ChunkingStrategy}
import org.scalatest.funsuite.AnyFunSuite

/** Window/summary layout semantics pinned against the reference chunker
  * (reference: src/chunking/sliding_window.rs:154-226). */
class ChunkerSpec extends AnyFunSuite {

  private val st = ChunkingStrategy(
    maxWindowTokens = 4, overlapTokens = Seq(1),
    summaryFallbackWeight = 0.3f, summaryFallbackTokens = 2, chunkWeightFloor = 0f)

  private def chunk(text: String, s: ChunkingStrategy = st) =
    Chunker.chunkSection(s, "r1", "unit", 1.0f, 0, "context", text)

  test("multi-window section emits windows plus summary fallback") {
    val chunks = chunk("one two three four five six seven")
    val windows = chunks.filter(_.view_kind == ChunkView.Window)
    val summaries = chunks.filter(_.view_kind == ChunkView.SummaryFallback)
    assert(windows.size == 2)
    assert(summaries.size == 1)
    // span=4, stride=3: [0,4) then [3,7)
    assert(windows(0).text == "one two three four")
    assert(windows(0).window_index == 0 && windows(0).span == 4 && windows(0).overlap == 1)
    assert(windows(1).text == "four five six seven")
    assert(windows(1).window_index == 1 && windows(1).tokens_estimate == 4)
    assert(summaries.head.text == "one two")
    assert(summaries.head.tokens_estimate == 2)
    assert(math.abs(summaries.head.fallback_weight - 0.3f) < 1e-6)
    assert(summaries.head.window_index == -1)
  }

  test("last window may be shorter than span") {
    // 6 tokens, span 4, stride 3: [0,4), [3,6) -> second window 3 tokens
    val windows = chunk("a b c d e f").filter(_.view_kind == ChunkView.Window)
    assert(windows.map(_.text) == Seq("a b c d", "d e f"))
    assert(windows(1).tokens_estimate == 3)
  }

  test("section that fits in one window emits original text, overlap 0") {
    val chunks = chunk("just three tokens")
    assert(chunks.size == 1)
    val c = chunks.head
    assert(c.view_kind == ChunkView.Window && c.window_index == 0)
    assert(c.overlap == 0 && c.span == 3 && c.text == "just three tokens")
  }

  test("empty and whitespace-only sections emit nothing") {
    assert(chunk("").isEmpty)
    assert(chunk("   \n\t ").isEmpty)
  }

  test("preprocessor dropping the section emits nothing") {
    val s = st.copy(preprocessors = Seq(_ => None))
    assert(chunk("one two three four five six seven", s).isEmpty)
  }

  test("summary fallback cap respects maxWindowTokens and floor of 1") {
    val s = st.copy(summaryFallbackTokens = 100) // capped at maxWindowTokens=4
    val summaries = chunk("t1 t2 t3 t4 t5 t6 t7 t8 t9", s)
      .filter(_.view_kind == ChunkView.SummaryFallback)
    assert(summaries.head.tokens_estimate == 4)
  }

  test("summaryFallbackTokens=0 disables fallback") {
    val s = st.copy(summaryFallbackTokens = 0)
    assert(!chunk("a b c d e f g", s).exists(_.view_kind == ChunkView.SummaryFallback))
  }

  test("chunk weight: rank decay for windows, fallback weight for summaries") {
    val chunks = chunk("one two three four five six seven")
    val w1 = chunks.filter(_.view_kind == ChunkView.Window)(1)
    assert(math.abs(Chunker.chunkWeight(w1, 0.1f) - 0.5f) < 1e-6)
    val fb = chunks.find(_.view_kind == ChunkView.SummaryFallback).get
    assert(math.abs(Chunker.chunkWeight(fb, 0.1f) - 0.3f) < 1e-6)
    assert(Chunker.chunkWeight(w1.copy(window_index = 99), 0.1f) == 0.1f)
  }

  test("distributed chunking matches local semantics and is partition-invariant") {
    import graft.core.{DataRecord, RecordSection}
    implicit val spark = TestSpark.spark
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    val recs = (1 to 20).map(i => DataRecord(s"r$i", "src", ts, ts, 1.0f, Seq("src"),
      Seq(RecordSection("anchor", None, s"title $i", Seq(s"title $i")),
        RecordSection("context", None, (1 to 7).map(j => s"w${i}_$j").mkString(" "), Nil)), None))
    val a = Chunker.chunkRecords(recs.toDS.repartition(1), st).collect().sortBy(c => (c.record_id, c.section_idx, c.window_index))
    val b = Chunker.chunkRecords(recs.toDS.repartition(7), st).collect().sortBy(c => (c.record_id, c.section_idx, c.window_index))
    assert(a.toSeq == b.toSeq)
    assert(a.count(_.view_kind == ChunkView.SummaryFallback) == 20)
  }
}
