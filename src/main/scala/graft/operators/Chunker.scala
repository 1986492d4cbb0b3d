package graft.operators

import graft.core.{ChunkView, DataRecord, RecordChunk}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Sliding-window token chunking with summary fallback.
  *
  * Semantics match the reference chunker
  * (reference: src/chunking/sliding_window.rs:10-117, defaults
  * src/config.rs:60-71):
  *   - whitespace tokens; an empty/blank (or preprocessor-dropped) section
  *     yields no chunks;
  *   - `span = min(maxWindowTokens, n)`; a section that fits in one window
  *     emits exactly one chunk whose text is the (preprocessed) section text;
  *   - otherwise, per configured overlap, windows start at multiples of
  *     `stride = max(span - overlap, 1)`; the final window ends exactly at
  *     the last token (it may be shorter than `span`);
  *   - a section longer than the window additionally emits a head
  *     summary-fallback chunk of `min(n, max(min(summaryFallbackTokens,
  *     maxWindowTokens), 1))` tokens carrying `summaryFallbackWeight`.
  *
  * The per-section function is pure, so the distributed form is a plain
  * `flatMap` over `Dataset[DataRecord]` — embarrassingly parallel, no
  * shuffle, and partition-count-invariant. At 100 TB this runs as a narrow
  * stage fused with the scan.
  */
case class ChunkingStrategy(
    maxWindowTokens: Int = 1024,
    overlapTokens: Seq[Int] = Seq(64),
    summaryFallbackWeight: Float = 0.35f,
    summaryFallbackTokens: Int = 512,
    chunkWeightFloor: Float = 0.1f,
    preprocessors: Seq[String => Option[String]] = Nil) {
  require(maxWindowTokens > 0, "maxWindowTokens must be > 0")
}

object Chunker {

  /** Chunk one section; pure. */
  def chunkSection(
      st: ChunkingStrategy,
      recordId: String,
      source: String,
      trust: Float,
      sectionIdx: Int,
      role: String,
      rawText: String): Seq[RecordChunk] = {
    val preprocessed = st.preprocessors.foldLeft(Option(rawText))((acc, p) => acc.flatMap(p))
    preprocessed match {
      case None => Nil
      case Some(text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) return Nil
        val span = math.min(st.maxWindowTokens, n)
        if (span == n) {
          return Seq(RecordChunk(recordId, source, sectionIdx, role,
            ChunkView.Window, 0, 0, span, 0f, text, span, trust))
        }
        val out = Seq.newBuilder[RecordChunk]
        for (overlap <- st.overlapTokens) {
          val stride = math.max(span - overlap, 1)
          var start = 0
          var index = 0
          var done = false
          while (!done && start < n) {
            val end = math.min(start + span, n)
            out += RecordChunk(recordId, source, sectionIdx, role,
              ChunkView.Window, index, overlap, span, 0f,
              toks.slice(start, end).mkString(" "), end - start, trust)
            if (end == n) done = true
            else { start += stride; index += 1 }
          }
        }
        if (n > st.maxWindowTokens && st.summaryFallbackTokens > 0) {
          val cap = math.max(math.min(st.summaryFallbackTokens, st.maxWindowTokens), 1)
          val len = math.min(n, cap)
          out += RecordChunk(recordId, source, sectionIdx, role,
            ChunkView.SummaryFallback, -1, 0, span, st.summaryFallbackWeight,
            toks.take(len).mkString(" "), len, trust)
        }
        out.result()
    }
  }

  /** Chunk every section of every record. Narrow transformation. */
  def chunkRecords(records: Dataset[DataRecord], st: ChunkingStrategy)(
      implicit spark: SparkSession): Dataset[RecordChunk] = {
    import spark.implicits._
    records.flatMap { r =>
      r.sections.zipWithIndex.flatMap { case (sec, idx) =>
        chunkSection(st, r.id, r.source, r.trust, idx, sec.role, sec.text)
      }
    }
  }

  /** Rank-decay chunk weight `max(floor, trust / (windowIndex + 1))` for
    * window chunks, `max(floor, fallbackWeight * trust)` for summary chunks
    * (reference: src/sampler/mod.rs:106-122, src/metrics.rs:131-133). */
  def chunkWeight(c: RecordChunk, floor: Float): Float = c.view_kind match {
    case ChunkView.Window => math.max(floor, c.trust / (c.window_index + 1).toFloat)
    case _ => math.max(floor, c.fallback_weight * c.trust)
  }
}
