package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) reader:
  * the ingest format of every web-scale training corpus. A WARC file
  * is a sequence of records — `WARC/1.x` version line, CRLF header
  * block (Content-Length mandatory), raw content block, blank-line
  * separator — where `response` records carry an HTTP response
  * (status line + headers + body) for a `WARC-Target-URI`.
  *
  * Parser doctrine (the [[graft.operators.MediaCodecs]] contract): a
  * 100 TB crawl scan must never die on one corrupt record — any
  * malformation (bad version line, missing/invalid Content-Length, a
  * block running past the file) SKIPS that record and RESYNCS to the
  * next `WARC/` marker, counting what it dropped; gzip members are
  * inflated with the stdlib (multi-member streams — Common Crawl
  * gzips per record and concatenates — read transparently).
  *
  * Spark surface: a `binaryFile` scan (one row per `*.warc` /
  * `*.warc.gz`) into a narrow mapPartitions parse — crawl bytes never
  * shuffle; downstream curation (the q133 URL layer, quality gates,
  * dedup) composes on the emitted columns. Per-file size is bounded
  * by the scan's whole-file read (the JsonlSource wholetext bound);
  * crawl archives are conventionally segmented (~1 GB) for exactly
  * this reason.
  */
object WarcSource {

  /** One parsed record. `httpStatus`/`httpContentType` are filled for
    * `response` records whose block is an HTTP response (status 0 and
    * empty mime otherwise); `body` is the content AFTER the HTTP
    * headers for responses, the whole block otherwise. */
  final case class WarcRecord(warcType: String, targetUri: String,
      date: String, recordId: String, httpStatus: Int,
      httpContentType: String, body: String)

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Inflate a (possibly multi-member) gzip stream; non-gzip input
    * returns unchanged. Corruption mid-stream keeps the prefix that
    * DID inflate (the record walk then skips the torn tail) — the
    * never-throw contract extends through the compression layer. */
  def gunzipAll(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case scala.util.control.NonFatal(_) => () }
    out.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i + 1 < end && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 < end) i else -1
  }

  private def findNext(b: Array[Byte], from: Int, end: Int): Int = {
    val pat = "WARC/".getBytes(Ascii)
    var i = from
    while (i + pat.length <= end) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i += 1
    }
    -1
  }

  /** Parse one WARC file's bytes (gzipped or plain). Returns the
    * records in file order plus the count of malformed records that
    * were skipped over. */
  def parse(bytesRaw: Array[Byte]): (Seq[WarcRecord], Int) = {
    val b = gunzipAll(bytesRaw)
    val out = Seq.newBuilder[WarcRecord]
    var skipped = 0
    var pos = findNext(b, 0, b.length)
    if (pos < 0 && b.length > 0) skipped += 1
    while (pos >= 0) {
      parseOne(b, pos, b.length) match {
        case Some((rec, next)) =>
          out += rec
          val n2 = findNext(b, next, b.length)
          // content between records must be separators only; anything
          // else means a malformed/truncated record got skipped over
          pos = n2
        case None =>
          skipped += 1
          pos = findNext(b, pos + 1, b.length)
      }
    }
    (out.result(), skipped)
  }

  /** Streaming record walk over a (possibly multi-member-gzip) stream:
    * inflate chunk by chunk, emit each record as soon as its block is
    * fully buffered, and COMPACT the consumed prefix — peak memory is
    * the largest single record plus one read chunk, never the file.
    * This retires [[gunzipAll]]'s whole-file inflate from the ingest
    * path (the last input-sized allocation): a 1 GB crawl segment
    * streams through a fixed-size window. Same never-throw/resync
    * doctrine as [[parse]]: a malformed record (or one larger than
    * `maxRecord`, the declared-size bomb guard) is skipped and the walk
    * resyncs at the next `WARC/` marker. `chunk` is the inflater read
    * size (tunable down in specs to force boundary-crossing records). */
  def parseStreaming(raw: java.io.InputStream, maxRecord: Int = 64 << 20,
      chunk: Int = 64 * 1024): Iterator[WarcRecord] = {
    val in: java.io.InputStream = {
      val pb = new java.io.PushbackInputStream(raw, 2)
      val b0 = pb.read(); val b1 = if (b0 >= 0) pb.read() else -1
      if (b1 >= 0) pb.unread(b1)
      if (b0 >= 0) pb.unread(b0)
      if (b0 == 0x1f && b1 == 0x8b)
        try new java.util.zip.GZIPInputStream(pb, chunk)
        catch { case scala.util.control.NonFatal(_) => pb }
      else pb
    }
    new Iterator[WarcRecord] {
      private var buf = new Array[Byte](chunk)
      private var len = 0
      private var eof = false
      private var pending: WarcRecord = null

      private def fill(): Unit = {
        if (eof) return
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        val n = try in.read(buf, len, buf.length - len)
          catch { case scala.util.control.NonFatal(_) => -1 } // torn gzip tail
        if (n < 0) {
          eof = true
          // release the fd + inflater native memory as soon as the stream
          // is drained — a 100 TB scan holds thousands of archives per
          // task lifetime and must not wait for GC to close them (early
          // termination is the caller's duty: close the raw stream, e.g.
          // via a task-completion listener as readResponsesStreaming does)
          try in.close() catch { case scala.util.control.NonFatal(_) => () }
        } else len += n
      }

      private def compact(from: Int): Unit = {
        if (from > 0) {
          System.arraycopy(buf, from, buf, 0, len - from)
          len -= from
        }
      }

      @annotation.tailrec
      private def advance(): Unit = {
        val idx = findNext(buf, 0, len)
        if (idx < 0) {
          if (eof) return
          // no record start in the window: keep only the last 4 bytes (a
          // potential marker prefix) and read on
          compact(math.max(0, len - 4))
          fill()
          advance()
        } else {
          compact(idx)
          parseOne(buf, 0, len) match {
            case Some((rec, next)) =>
              compact(next)
              pending = rec
            case None if !eof && len <= maxRecord =>
              fill() // likely just not fully buffered yet
              advance()
            case None =>
              // malformed (or over-cap) at eof/cap: skip this marker,
              // resync at the next one
              compact(1)
              advance()
          }
        }
      }

      def hasNext: Boolean = {
        if (pending == null) { fill(); advance() }
        pending != null
      }
      def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
  }

  /** One record at `pos` (which points at "WARC/"); None on any
    * malformation. Returns the record and the offset after its block. */
  private def parseOne(b: Array[Byte], pos: Int, end: Int): Option[(WarcRecord, Int)] = {
    val ve = lineEnd(b, pos, end)
    if (ve < 0) return None
    val version = new String(b, pos, ve - pos, Ascii)
    if (!version.startsWith("WARC/1.")) return None
    var p = ve + 2
    var warcType = ""; var uri = ""; var date = ""; var rid = ""
    var clen = -1L
    var done = false
    while (!done) {
      val le = lineEnd(b, p, end)
      if (le < 0) return None
      if (le == p) { done = true; p += 2 } // blank line ends headers
      else {
        val line = new String(b, p, le - p, Utf8)
        val ci = line.indexOf(':')
        if (ci <= 0) return None
        val k = line.substring(0, ci).trim.toLowerCase
        val v = line.substring(ci + 1).trim
        k match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v
          case "warc-date" => date = v
          case "warc-record-id" => rid = v
          case "content-length" => clen = v.toLongOption.getOrElse(-1L)
          case _ => ()
        }
        p = le + 2
      }
    }
    if (clen < 0 || p.toLong + clen > end) return None
    val blockEnd = (p + clen).toInt
    val (status, mime, body) =
      if (warcType == "response" && clen >= 5 &&
          new String(b, p, 5, Ascii) == "HTTP/") {
        val se = lineEnd(b, p, end)
        if (se < 0 || se >= blockEnd) (0, "", new String(b, p, blockEnd - p, Utf8))
        else {
          val parts = new String(b, p, se - p, Ascii).split(" ")
          val st = if (parts.length >= 2) parts(1).toIntOption.getOrElse(0) else 0
          var hp = se + 2
          var mm = ""
          var hdone = false
          while (!hdone && hp < blockEnd) {
            val he = lineEnd(b, hp, end)
            if (he < 0 || he > blockEnd) { hdone = true }
            else if (he == hp) { hp += 2; hdone = true }
            else {
              val line = new String(b, hp, he - hp, Utf8)
              val ci = line.indexOf(':')
              if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("content-type"))
                mm = line.substring(ci + 1).trim
              hp = he + 2
            }
          }
          (st, mm, new String(b, hp, math.max(0, blockEnd - hp), Utf8))
        }
      } else (0, "", new String(b, p, blockEnd - p, Utf8))
    Some((WarcRecord(warcType, uri, date, rid, status, mime, body), blockEnd))
  }

  /** All `response` records under `path` (`*.warc` + `*.warc.gz`), one
    * row each: (path, rec_idx within file, url, date, status, mime,
    * body, skipped — the file's malformed-record count riding along
    * for telemetry). Narrow plan: binaryFile scan → mapPartitions. */
  def readResponses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .option("recursiveFileLookup", "true").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (p, bytes) =>
          val (recs, skipped) = parse(bytes)
          recs.zipWithIndex.collect {
            case (r, i) if r.warcType == "response" =>
              (p, i.toLong, r.targetUri, r.date, r.httpStatus.toLong,
                r.httpContentType, r.body, skipped.toLong)
          }
        }
      }
      .toDF("path", "rec_idx", "url", "date", "status", "mime", "body", "skipped")
  }

  /** [[readResponses]]'s bounded-memory sibling: file STREAMS
    * (`sc.binaryFiles`' PortableDataStream), not whole-file byte
    * arrays — each task inflates and parses its files through the
    * [[parseStreaming]] window, so executor memory is bounded by the
    * largest RECORD, not the largest archive (a 1 GB crawl segment no
    * longer allocates 1 GB inflated + 1 GB raw). Emits the same rows as
    * [[readResponses]] minus the per-file `skipped` total — a streaming
    * walk only knows it at file end; skip counters belong on the ingest
    * telemetry ledger. Non-recursive over `path` (crawl segments
    * conventionally sit flat in a segment directory). */
  def readResponsesStreaming(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .filter(_._1.matches(".*\\.warc(\\.gz)?$"))
      .flatMap { case (p, pds) =>
        // parseStreaming closes the stream at EOF; the completion listener
        // covers EARLY termination (limit/take abandons the iterator
        // mid-file) so no fd/inflater outlives its task
        val in = pds.open()
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case scala.util.control.NonFatal(_) => () })
        parseStreaming(in).zipWithIndex.collect {
          case (r, i) if r.warcType == "response" =>
            (p, i.toLong, r.targetUri, r.date, r.httpStatus.toLong,
              r.httpContentType, r.body)
        }
      }.toDF("path", "rec_idx", "url", "date", "status", "mime", "body")
  }

  /** Fixture/spec lane: render records into valid WARC bytes. */
  def encode(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val block: Array[Byte] =
        if (r.warcType == "response" && r.httpStatus > 0)
          (s"HTTP/1.1 ${r.httpStatus} X\r\nContent-Type: ${r.httpContentType}\r\n\r\n" +
            r.body).getBytes(Utf8)
        else r.body.getBytes(Utf8)
      val hdr = new StringBuilder()
      hdr ++= "WARC/1.0\r\n"
      hdr ++= s"WARC-Type: ${r.warcType}\r\n"
      if (r.targetUri.nonEmpty) hdr ++= s"WARC-Target-URI: ${r.targetUri}\r\n"
      if (r.date.nonEmpty) hdr ++= s"WARC-Date: ${r.date}\r\n"
      if (r.recordId.nonEmpty) hdr ++= s"WARC-Record-ID: ${r.recordId}\r\n"
      hdr ++= s"Content-Length: ${block.length}\r\n\r\n"
      out.write(hdr.toString.getBytes(Utf8))
      out.write(block)
      out.write("\r\n\r\n".getBytes(Ascii))
    }
    out.toByteArray
  }

  /** Fixture lane: gzip bytes as ONE member (concatenate calls for the
    * multi-member case). */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }
}
