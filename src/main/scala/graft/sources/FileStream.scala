package graft.sources

import graft.core.DataRecord
import graft.operators.SamplerState
import org.apache.spark.sql.{Dataset, SparkSession}
import java.nio.file.{Files, Path, Paths}

/** One served page: `paths` in serve order, the page's records (FileSource
  * id/taxonomy/section semantics), and the advanced cursor state. */
case class FilePage(paths: Seq[Path], records: Dataset[DataRecord], state: SamplerState)

/** Incremental pager over a STATIC file corpus in stable hash-pseudo-random
  * order with wraparound re-serve (reference: src/source/indexing/
  * file_stream.rs:15-99) — the lane the Structured Streaming twin
  * ([[FileSource.stream]]) does not cover, because arrival-driven streams
  * never re-serve a file.
  *
  * Contract (replicated exactly):
  *   - candidates = every `.txt` under the root, sorted by
  *     (portable hash of relative path, path) — a stable pseudo-random
  *     order that breaks lexicographic biases like date-prefixed dirs;
  *   - the cursor (`fs_cursor:<sourceId>` in [[SamplerState]]) is a
  *     position in that order; out-of-range (corpus shrank) resets to 0;
  *   - a page serves up to `limit` convertible files starting at the
  *     cursor, wrapping mod total — after the last file the stream
  *     re-serves the corpus from position 0 in the SAME order;
  *   - the cursor advances by files SERVED (reference
  *     `next_start = start + records.len()`): skipped files do not
  *     advance it and are re-visited on the next page.
  *
  * The walk + sort is driver-side (paths only — the same metadata a Spark
  * file index holds); page contents are read by the distributed wholetext
  * scan restricted to the page's paths, so record construction scales with
  * the page, not the corpus.
  */
object FileStream {

  private def cursorKey(cfg: FileSourceConfig) = s"fs_cursor:${cfg.sourceId}"

  /** The stable serve order (seeded by each file's relative path). */
  def orderedFiles(cfg: FileSourceConfig): Seq[Path] = {
    val root = Paths.get(cfg.rootPath)
    if (!Files.isDirectory(root)) return Nil
    val s = Files.walk(root)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".txt"))
          .toList
      } finally s.close()
    files.sortBy { p =>
      val rel = root.relativize(p).toString
      (graft.plans.PortableHash32.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(rel)), p.toString)
    }
  }

  /** Serve the next page and advance the cursor. `convertible` mirrors the
    * reference's build_record-returns-None lane (e.g. a binary sniff);
    * default accepts everything the glob matched. */
  def nextPage(spark: SparkSession, cfg: FileSourceConfig, st: SamplerState,
      limit: Int, convertible: Path => Boolean = _ => true): FilePage = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    require(limit > 0, "limit must be > 0")
    val files = orderedFiles(cfg)
    val total = files.size
    val start0 = st.counter(cursorKey(cfg))
    val start = if (total > 0 && start0 >= total) 0L else start0
    val page = (0 until total).iterator
      .map(i => files(((start + i) % total).toInt))
      .filter(convertible).take(limit).toSeq
    val next = if (total == 0) 0L else (start + page.size) % total
    val records =
      if (page.isEmpty) {
        import spark.implicits._
        spark.emptyDataset[DataRecord]
      } else FileSource.mapRecords(spark, spark.read
        .option("wholetext", "true")
        .text(page.map(_.toString): _*)
        .select(input_file_name().as("path"), col("value")), cfg)
    FilePage(page, records,
      st.copy(counters = st.counters.updated(cursorKey(cfg), next)))
  }
}
