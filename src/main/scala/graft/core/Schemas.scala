package graft.core

import java.sql.Timestamp

/** Core typed schemas, mirroring the reference's data model
  * (reference: src/data.rs:27-274) re-expressed as Spark-encodable case
  * classes. Nested `QualityScore` is flattened to a `trust` column and the
  * `ChunkView` tagged union becomes a `view_kind` discriminator — Spark has
  * no native sum types and a flat struct keeps the columns prunable.
  */
object SectionRole {
  val Anchor = "anchor"
  val Context = "context"
}

/** One titled span of a record (reference: src/data.rs:108-118). */
case class RecordSection(
    role: String,
    heading: Option[String],
    text: String,
    sentences: Seq[String])

/** Canonical corpus row (reference: src/data.rs:27-45). */
case class DataRecord(
    id: String,
    source: String,
    created_at: Timestamp,
    updated_at: Timestamp,
    trust: Float,
    taxonomy: Seq[String],
    sections: Seq[RecordSection],
    meta_prefix: Option[String])

object ChunkView {
  val Window = "window"
  val SummaryFallback = "summary_fallback"
}

/** Windowed view over a section (reference: src/data.rs:130-174).
  * `view_kind` ∈ {window, summary_fallback}; for fallback chunks
  * `window_index` = -1 and `fallback_weight` carries the configured weight.
  */
case class RecordChunk(
    record_id: String,
    source: String,
    section_idx: Int,
    role: String,
    view_kind: String,
    window_index: Int,
    overlap: Int,
    span: Int,
    fallback_weight: Float,
    text: String,
    tokens_estimate: Int,
    trust: Float)

/** Output rows (reference: src/data.rs:177-260). */
case class SampleTriplet(
    recipe: String,
    anchor: RecordChunk,
    positive: RecordChunk,
    negative: RecordChunk,
    weight: Float,
    instruction: Option[String])

case class SamplePair(
    recipe: String,
    left: RecordChunk,
    right: RecordChunk,
    label: String,
    reason: String,
    weight: Float)

case class TextSample(
    recipe: String,
    chunk: RecordChunk,
    weight: Float)
