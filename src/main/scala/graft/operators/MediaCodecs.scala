package graft.operators

/** Real decoders for the uncompressed media containers — pure stdlib byte
  * parsing, no codec library required. This closes the "codec layer"
  * seam of [[Multimodal]] for the formats that don't need one:
  *
  *   - WAV  (RIFF little-endian, PCM 8/16-bit — the canonical raw-audio
  *     container; reference treats audio as opaque bytes + metadata)
  *   - PPM  (P6 binary, maxval < 256 — raw RGB)
  *   - BMP  (BITMAPINFOHEADER, 24-bit uncompressed, bottom-up or
  *     top-down — raw BGR with 4-byte row padding)
  *
  * Compressed formats (JPEG/PNG/MP3/...) still route to the opaque
  * byte-stat fallback — decoding those genuinely needs a codec library
  * that is not in this container. The dispatcher sniffs magic bytes, and
  * ANY structural violation (truncation, wrong bpp, non-PCM, overflow)
  * degrades to the fallback instead of throwing: a 100 TB media scan must
  * never die on one corrupt payload.
  *
  * All features are integer-exact (means are floor-divided sums; RMS is
  * floor(1e3·sqrt(meanSquare)/fullScale) — the only double is the final
  * sqrt, deterministic on the JVM) so spec pins are byte-stable.
  */
object MediaCodecs {

  /** Decoded feature row; `kind` ∈ wav | ppm | bmp. Audio fills
    * channels/sampleRate/nSamples/durationMs/rmsE3; images fill
    * width/height/channels/meanR/meanG/meanB. */
  final case class Decoded(
      kind: String,
      width: Int = 0, height: Int = 0, channels: Int = 0,
      sampleRate: Int = 0, nSamples: Long = 0L, durationMs: Long = 0L,
      meanR: Int = 0, meanG: Int = 0, meanB: Int = 0, rmsE3: Long = 0L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** Magic-byte sniff: wav | ppm | bmp | opaque. */
  def sniff(b: Array[Byte]): String =
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) "wav"
    else if (ascii(b, 0, "P6")) "ppm"
    else if (ascii(b, 0, "BM")) "bmp"
    else "opaque"

  /** Decode if the payload is one of the supported containers; None means
    * opaque/unsupported/corrupt — callers take the byte-stat fallback. */
  def decode(b: Array[Byte]): Option[Decoded] = sniff(b) match {
    case "wav" => decodeWav(b)
    case "ppm" => decodePpm(b)
    case "bmp" => decodeBmp(b)
    case _ => None
  }

  /** Canonical-layout PCM WAV encoder (16-bit signed LE, single `fmt ` +
    * `data` chunk pair) — the inverse of [[decodeWav]], for round-trip
    * fixtures and synthetic media lanes. */
  def encodeWavPcm16(channels: Int, sampleRate: Int, samples: Seq[Int]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0)
    def w16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def w32(v: Int): Seq[Byte] =
      Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
    val data = samples.flatMap(w16)
    val fmt = w16(1) ++ w16(channels) ++ w32(sampleRate) ++
      w32(sampleRate * channels * 2) ++ w16(channels * 2) ++ w16(16)
    val body = "fmt ".getBytes("US-ASCII").toSeq ++ w32(16) ++ fmt ++
      "data".getBytes("US-ASCII").toSeq ++ w32(data.length) ++ data
    ("RIFF".getBytes("US-ASCII").toSeq ++ w32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII").toSeq ++ body).toArray
  }

  /** RIFF/WAVE PCM: walk the chunk list for `fmt ` and `data`. Supports
    * audioFormat 1 (integer PCM), 8-bit unsigned or 16-bit signed LE. */
  def decodeWav(b: Array[Byte]): Option[Decoded] = {
    if (!(ascii(b, 0, "RIFF") && b.length >= 44 && ascii(b, 8, "WAVE"))) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return None
      if (ascii(b, pos, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(b, pos + 8)
        if (audioFormat != 1) return None // only integer PCM
        fmt = Some((le16(b, pos + 10), le32(b, pos + 12), le16(b, pos + 22)))
      } else if (ascii(b, pos, "data")) {
        data = Some((pos + 8, size))
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len))) =>
        if (ch <= 0 || rate <= 0 || (bits != 8 && bits != 16)) return None
        val bytesPerFrame = ch * (bits / 8)
        val n = len / bytesPerFrame
        if (n == 0) return Some(Decoded("wav", channels = ch, sampleRate = rate))
        // RMS over all samples (channel-interleaved), integer-accumulated
        var sumSq = 0L
        var i = 0
        val total = n * ch
        while (i < total) {
          val s =
            if (bits == 8) u8(b, off + i) - 128 // 8-bit WAV is unsigned
            else le16(b, off + 2 * i).toShort.toInt
          sumSq += s.toLong * s
          i += 1
        }
        val fullScale = if (bits == 8) 127.0 else 32767.0
        val rmsE3 = math.floor(1000.0 * math.sqrt(sumSq.toDouble / total) / fullScale).toLong
        Some(Decoded("wav", channels = ch, sampleRate = rate, nSamples = n,
          durationMs = n * 1000L / rate, rmsE3 = rmsE3))
      case _ => None
    }
  }

  /** PPM P6 (binary): `P6 <ws> width <ws> height <ws> maxval <single ws>`
    * then width×height RGB triplets; `#` comments allowed in the header.
    * Only maxval < 256 (1 byte/channel). */
  def decodePpm(b: Array[Byte]): Option[Decoded] = {
    if (!ascii(b, 0, "P6")) return None
    var pos = 2
    def skipWs(): Boolean = {
      var progressed = false
      var going = true
      while (going && pos < b.length) {
        val c = b(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { pos += 1; progressed = true }
        else if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1; progressed = true }
        else going = false
      }
      progressed
    }
    def int(): Option[Int] = {
      if (!skipWs()) return None
      val start = pos
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- int(); h <- int(); maxval <- int()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      // exactly ONE whitespace byte separates header from pixel data
      if pos < b.length && (b(pos) == '\n' || b(pos) == ' ' || b(pos) == '\t' || b(pos) == '\r')
      npx = w.toLong * h
      if npx <= Int.MaxValue / 3 && { pos += 1; pos + 3 * npx <= b.length }
    } yield {
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < npx) {
        sr += u8(b, pos + 3 * i); sg += u8(b, pos + 3 * i + 1); sb += u8(b, pos + 3 * i + 2)
        i += 1
      }
      Decoded("ppm", width = w, height = h, channels = 3,
        meanR = (sr / npx).toInt, meanG = (sg / npx).toInt, meanB = (sb / npx).toInt)
    }
  }

  /** BMP with a 40-byte BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed).
    * Pixel rows are BGR, padded to 4 bytes; positive height = bottom-up
    * (row order doesn't matter for means, but bounds do). */
  def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (!(ascii(b, 0, "BM") && b.length >= 54)) return None
    val pixOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val npx = w.toLong * h
    if (npx > Int.MaxValue / 3) return None
    if (pixOff < 54 || pixOff.toLong + rowBytes.toLong * h > b.length) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var row = 0
    while (row < h) {
      val base = pixOff + row * rowBytes
      var x = 0
      while (x < w) {
        sb += u8(b, base + 3 * x); sg += u8(b, base + 3 * x + 1); sr += u8(b, base + 3 * x + 2)
        x += 1
      }
      row += 1
    }
    Some(Decoded("bmp", width = w, height = h, channels = 3,
      meanR = (sr / npx).toInt, meanG = (sg / npx).toInt, meanB = (sb / npx).toInt))
  }
}
