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
  *   - PNG  (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced) — the
  *     one COMPRESSED container the JDK can decode without a codec
  *     library: the zlib IDAT stream inflates via `java.util.zip.Inflater`
  *     and the five scanline filters (None/Sub/Up/Average/Paeth) are
  *     reversed here
  *
  *   - JPEG — via the JDK's own ImageIO baseline codec
  *     (`javax.imageio`, stdlib in every JDK). JPEG is LOSSY, so oracle
  *     queries pin tolerance BUCKETS of solid-color payloads instead of
  *     exact means (see [[encodeJpegSolid]]).
  *
  *   - GIF  (87a/89a) — palette + a from-scratch variable-width LZW
  *     decoder (clear/end codes, table growth, KwKwK, early-change width
  *     bumps, 12-bit cap); extension blocks skipped, first frame decoded
  *   - MP3  — frame-HEADER walk (MPEG-1 Layer III): ID3v2 skip, per-frame
  *     sync/bitrate/rate validation, exact length hops → duration,
  *     sample count, channels, mean kbps. PCM samples are NOT decoded
  *     (that needs a Huffman+IMDCT codec); this is the metadata plane a
  *     training pipeline filters on, parsed from the real container.
  *
  *   - Y4M  (YUV4MPEG2, the mjpegtools raw-video interchange format) —
  *     REAL video sample decode: uncompressed planar YUV frames, header
  *     + FRAME walk, per-frame exact plane means — the frame-sampling
  *     lane a training pipeline strides over (q132).
  *   - FLAC — REAL full-PCM decode of a COMPRESSED audio container
  *     (see [[Flac]]): bit-level framing, CRC-8/16 verification,
  *     Rice-coded residuals, fixed + LPC predictors, stereo
  *     decorrelation — all algorithmic, no spec constant tables.
  *
  * COMPRESSED video sample data (MP4 payloads) and MP3 PCM still route
  * to the opaque byte-stat fallback — decoding those genuinely needs
  * codec tables/libraries that are not in this container (MP4
  * *metadata* is a real box walk; lossless-compressed audio PCM is
  * real via FLAC). The dispatcher sniffs magic bytes, and
  * ANY structural violation (truncation, wrong bpp, non-PCM, overflow)
  * degrades to the fallback instead of throwing: a 100 TB media scan must
  * never die on one corrupt payload.
  *
  * All features are integer-exact (means are floor-divided sums; RMS is
  * floor(1e3·sqrt(meanSquare)/fullScale) — the only double is the final
  * sqrt, deterministic on the JVM) so spec pins are byte-stable.
  */
object MediaCodecs {

  /** Decoded feature row; `kind` ∈ wav | ppm | bmp | png | jpeg | gif |
    * mp3. Audio fills channels/sampleRate/nSamples/durationMs/rmsE3
    * (for mp3 the rmsE3 slot carries mean kbps — no PCM is decoded);
    * images fill width/height/channels/meanR/meanG/meanB. */
  final case class Decoded(
      kind: String,
      width: Int = 0, height: Int = 0, channels: Int = 0,
      sampleRate: Int = 0, nSamples: Long = 0L, durationMs: Long = 0L,
      meanR: Int = 0, meanG: Int = 0, meanB: Int = 0, rmsE3: Long = 0L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Fold a decoded FLAC stream into the shared feature row — the
    * [[decodeWav]] audio semantics: RMS over all samples (channel-
    * interleaved), full scale 2^(bps−1)−1. */
  def flacToDecoded(a: Flac.FlacAudio): Decoded = {
    val total = a.nSamples * a.channels
    if (total == 0L)
      Decoded("flac", channels = a.channels, sampleRate = a.sampleRate)
    else {
      var sumSq = 0L
      a.samples.foreach { ch =>
        var i = 0
        while (i < ch.length) { sumSq += ch(i).toLong * ch(i); i += 1 }
      }
      val fullScale = ((1L << (a.bps - 1)) - 1).toDouble
      val rmsE3 =
        math.floor(1000.0 * math.sqrt(sumSq.toDouble / total) / fullScale).toLong
      Decoded("flac", channels = a.channels, sampleRate = a.sampleRate,
        nSamples = a.nSamples, durationMs = a.nSamples * 1000L / a.sampleRate,
        rmsE3 = rmsE3)
    }
  }

  /** Magic-byte sniff: wav | ppm | bmp | png | jpeg | gif | mp3 | mp4 |
    * y4m | flac | ogg | opaque. */
  def sniff(b: Array[Byte]): String =
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) "wav"
    else if (ascii(b, 0, "P6")) "ppm"
    else if (ascii(b, 0, "BM")) "bmp"
    else if (b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))) "png"
    else if (b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) "jpeg"
    else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) "gif"
    else if (ascii(b, 0, "ID3") ||
      (b.length >= 4 && u8(b, 0) == 0xff && (u8(b, 1) & 0xfe) == 0xfa)) "mp3"
    else if (ascii(b, 4, "ftyp")) "mp4"
    else if (ascii(b, 0, "YUV4MPEG2")) "y4m"
    else if (ascii(b, 0, "fLaC")) "flac"
    else if (ascii(b, 0, "OggS")) "ogg"
    else "opaque"

  /** Decode if the payload is one of the supported containers; None means
    * opaque/unsupported/corrupt — callers take the byte-stat fallback. The
    * catch-all is a second line of defense behind the parsers' own bounds
    * checks: the never-throw contract must hold for any byte pattern, and
    * a 100 TB media scan can't die on one adversarial payload. */
  def decode(b: Array[Byte]): Option[Decoded] =
    try sniff(b) match {
      case "wav" => decodeWav(b)
      case "ppm" => decodePpm(b)
      case "bmp" => decodeBmp(b)
      case "png" => decodePng(b)
      case "jpeg" => decodeJpeg(b)
      case "gif" => decodeGif(b)
      case "mp3" => decodeMp3Meta(b)
      case "mp4" => decodeMp4Meta(b).map(_.toDecoded)
      case "y4m" => decodeY4m(b).map(_.toDecoded)
      case "flac" => Flac.decode(b).map(flacToDecoded)
      case "ogg" => decodeOggOpus(b).map(_.toDecoded)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Solid-color JPEG encoder via the JDK's ImageIO plugin — for
    * round-trip fixtures and the oracle lane. JPEG is lossy: decoded
    * means drift a few units from the source color (DC quantization +
    * YCbCr rounding), so oracle queries use colors ≡ 4 (mod 8) and pin
    * `mean / 8` buckets, which absorb ±3 drift deterministically. */
  def encodeJpegSolid(w: Int, h: Int, r: Int, g: Int, b0: Int,
      quality: Float = 0.92f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b0
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wtr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wtr.setOutput(ios)
    wtr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wtr.dispose(); ios.close()
    bos.toByteArray
  }

  /** JPEG via `javax.imageio` (the JDK's built-in baseline codec — no
    * external library). Deterministic within one JVM; ImageIO failures
    * (corrupt/truncated streams) return None directly or throw into
    * [[decode]]'s catch-all — the never-throw contract holds. */
  def decodeJpeg(b: Array[Byte]): Option[Decoded] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some(Decoded("jpeg", width = w, height = h, channels = 3,
      meanR = (sr / n).toInt, meanG = (sg / n).toInt, meanB = (sb / n).toInt))
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
      // Long arithmetic: a declared size near Int.MaxValue must not wrap
      // the bounds check negative and admit an out-of-range read
      if (size < 0 || pos.toLong + 8 + size > b.length) return None
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

  /** Decode a PCM WAV and return the per-window energy profile: the
    * sample stream (channel-interleaved, all channels pooled) splits into
    * `k` equal windows and each window accumulates its exact integer sum
    * of squares. Comparisons between equal-sized windows are mean-energy
    * comparisons without a division, so downstream acoustic fingerprints
    * stay integer-exact (the audio twin of [[decodePngGrayGrid]]).
    * Refuses (None) on non-PCM/corrupt containers or when the total
    * sample count doesn't divide into `k` windows — fixture lanes
    * synthesize divisible lengths; a production fingerprinter would pad. */
  def decodeWavEnergyWindows(b: Array[Byte], k: Int): Option[Array[Long]] = {
    if (!(ascii(b, 0, "RIFF") && b.length >= 44 && ascii(b, 8, "WAVE"))) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos.toLong + 8 + size > b.length) return None
      if (ascii(b, pos, "fmt ")) {
        if (size < 16) return None
        if (le16(b, pos + 8) != 1) return None
        fmt = Some((le16(b, pos + 10), le32(b, pos + 12), le16(b, pos + 22)))
      } else if (ascii(b, pos, "data")) data = Some((pos + 8, size))
      pos += 8 + size + (size & 1)
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len))) =>
        if (ch <= 0 || rate <= 0 || (bits != 8 && bits != 16)) return None
        val total = (len / (ch * (bits / 8))) * ch
        if (total == 0 || total % k != 0) return None
        val per = total / k
        val out = new Array[Long](k)
        var i = 0
        while (i < total) {
          val s =
            if (bits == 8) u8(b, off + i) - 128
            else le16(b, off + 2 * i).toShort.toInt
          out(i / per) += s.toLong * s
          i += 1
        }
        Some(out)
      case _ => None
    }
  }

  /** Energy-difference fingerprint over a window profile, split into two
    * 32-bit halves (no sign-bit hazard): bit j is set when
    * `win[j] > win[j+1]` — with k=65 windows this is a 64-bit acoustic
    * fingerprint, the audio analogue of [[dHashHalves]]. */
  def energyHashHalves(win: Array[Long]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var j = 0
    while (j < win.length - 1) {
      if (win(j) > win(j + 1)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
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

  /** PNG: 8-bit depth, color types 0 (gray) / 2 (RGB) / 4 (gray+alpha) /
    * 6 (RGBA), non-interlaced. Chunk walk collects IHDR + concatenated
    * IDAT, `java.util.zip.Inflater` decompresses the zlib stream, and the
    * five scanline filters are reversed row by row. Channel means ignore
    * alpha; grayscale reports the same mean on all three channels. Any
    * structural violation (bad CRC length, interlace, 16-bit, palette,
    * short inflate) refuses rather than throws. */
  def decodePng(b: Array[Byte]): Option[Decoded] = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    pngSweep(b) { (_, _, _) =>
      Some((_, _, r, g, bl) => { sr += r; sg += g; sb += bl })
    }.map { case (w, h, bpp) =>
      val npx = w.toLong * h
      Decoded("png", width = w, height = h, channels = bpp,
        meanR = (sr / npx).toInt, meanG = (sg / npx).toInt, meanB = (sb / npx).toInt)
    }
  }

  /** Decode + grayscale block-downsample in ONE sweep (thumbnailing
    * without materializing the raster): block (gx, gy) accumulates the
    * SUM of per-pixel `r+g+b` over its w/gw × h/gh pixels — comparisons
    * between equal-sized blocks are mean comparisons without a division,
    * so downstream perceptual hashes stay integer-exact. Refuses (None)
    * when the dimensions don't divide evenly — the fixture lanes
    * synthesize divisible sizes; a production thumbnailer would pad. */
  def decodePngGrayGrid(b: Array[Byte], gw: Int, gh: Int): Option[Array[Long]] = {
    val grid = new Array[Long](gw * gh)
    pngSweep(b) { (w, h, _) =>
      if (w % gw != 0 || h % gh != 0) None
      else {
        val bw = w / gw; val bh = h / gh
        Some((row, px, r, g, bl) =>
          grid((row / bh) * gw + (px / bw)) += (r + g + bl).toLong)
      }
    }.map(_ => grid)
  }

  /** Shared PNG decode core: chunk walk, Inflater, filter reversal — the
    * pixel visitor (built once dims are known; returning None refuses)
    * receives `(row, col, r, g, b)` with gray/alpha mapped to equal
    * channels, alpha ignored. Returns `(w, h, bpp)` on success. */
  private def pngSweep(b: Array[Byte])(
      mk: (Int, Int, Int) => Option[(Int, Int, Int, Int, Int) => Unit]): Option[(Int, Int, Int)] = {
    if (b.length < 8 + 25 || !PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
    var sawIhdr = false; var ended = false
    val idat = new java.io.ByteArrayOutputStream
    while (!ended && pos + 8 <= b.length) {
      val len = be32(b, pos)
      // len + type + crc must fit; Long math so a near-MaxValue len can't wrap
      if (len < 0 || pos.toLong + 12 + len > b.length) return None
      if (ascii(b, pos + 4, "IHDR")) {
        if (len != 13) return None
        w = be32(b, pos + 8); h = be32(b, pos + 12)
        val bitDepth = u8(b, pos + 16); colorType = u8(b, pos + 17)
        val interlace = u8(b, pos + 20)
        if (bitDepth != 8 || interlace != 0) return None
        sawIhdr = true
      } else if (ascii(b, pos + 4, "IDAT")) {
        if (!sawIhdr) return None
        idat.write(b, pos + 8, len)
      } else if (ascii(b, pos + 4, "IEND")) {
        ended = true
      }
      pos += 12 + len
    }
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None
    }
    if (!sawIhdr || w <= 0 || h <= 0 || idat.size == 0) return None
    val onPixel = mk(w, h, bpp).getOrElse(return None)
    val stride = w.toLong * bpp
    val rawLen = (stride + 1) * h
    if (stride > Int.MaxValue / h - 1 || rawLen > Int.MaxValue - 8) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // 0 with output space left: truncated input, preset-dictionary
        // stream, or just-finished — only the last is not a refusal
        if (n == 0 && !inf.finished()) return None
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // reverse scanline filters in place (prior = de-filtered previous row)
    val st = stride.toInt
    val cur = new Array[Int](st)
    val prior = new Array[Int](st)
    var row = 0
    while (row < h) {
      val base = row * (st + 1)
      val filter = u8(raw, base)
      if (filter > 4) return None
      var i = 0
      while (i < st) {
        val x = u8(raw, base + 1 + i)
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = if (row > 0) prior(i) else 0
        val c = if (i >= bpp && row > 0) prior(i - bpp) else 0
        cur(i) = (filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 => // Paeth predictor
            val p = a + up - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - up), math.abs(p - c))
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }) & 0xff
        i += 1
      }
      var px = 0
      while (px < w) {
        val o = px * bpp
        colorType match {
          case 0 | 4 => val v = cur(o); onPixel(row, px, v, v, v)
          case _ => onPixel(row, px, cur(o), cur(o + 1), cur(o + 2))
        }
        px += 1
      }
      System.arraycopy(cur, 0, prior, 0, st)
      row += 1
    }
    Some((w, h, bpp))
  }

  /** Difference hash (dHash) over a `gw×gh` gray grid, split into two
    * 32-bit halves so neither engine's arithmetic ever touches a sign
    * bit: bit k (row-major over rows × (gw-1) comparisons) is set when
    * `grid[r][c] > grid[r][c+1]`. With gw=9, gh=8 this is the classic
    * 64-bit dHash as `(hi, lo)`. */
  def dHashHalves(grid: Array[Long], gw: Int, gh: Int): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var k = 0
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        if (grid(r * gw + c) > grid(r * gw + c + 1)) {
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        k += 1
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** Minimal PNG encoder (the inverse of [[decodePng]] for fixtures and
    * synthetic media lanes): 8-bit, any supported color type (0 gray,
    * 2 RGB, 4 gray+alpha, 6 RGBA — `px` is the interleaved channel
    * stream), filter `filterType` on every scanline (the encoder APPLIES
    * the filter so the decoder must reverse it), one zlib-deflated IDAT. */
  def encodePng(w: Int, h: Int, px: Seq[Int], colorType: Int = 2,
      filterType: Int = 0): Array[Byte] = {
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => throw new IllegalArgumentException(s"colorType $colorType")
    }
    require(w > 0 && h > 0 && px.length == w * h * bpp && filterType >= 0 && filterType <= 4)
    val st = w * bpp
    val raw = new Array[Byte]((st + 1) * h)
    val prior = new Array[Int](st)
    var row = 0
    while (row < h) {
      val base = row * (st + 1)
      raw(base) = filterType.toByte
      var i = 0
      while (i < st) {
        val x = px(row * st + i) & 0xff
        val a = if (i >= bpp) px(row * st + i - bpp) & 0xff else 0
        val up = if (row > 0) prior(i) else 0
        val c = if (i >= bpp && row > 0) prior(i - bpp) else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - up), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(base + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      i = 0
      while (i < st) { prior(i) = px(row * st + i) & 0xff; i += 1 }
      row += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def chunk(typ: String, data: Array[Byte]): Seq[Byte] = {
      def w32(v: Int): Seq[Byte] =
        Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).map(_.toByte)
      val body = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      w32(data.length) ++ body.toSeq ++ w32(crc.getValue.toInt)
    }
    def b32(v: Int): Array[Byte] =
      Array((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).map(_.toByte)
    val ihdr = b32(w) ++ b32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    (PngSig.toSeq ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.empty)).toArray
  }

  // ------------------------------------------------------------------
  // GIF (87a/89a): palette + LZW — the OTHER compressed image container
  // decodable with pure stdlib arithmetic (the LZW variable-width code
  // stream is ~60 lines; no external codec). First frame only.
  // ------------------------------------------------------------------

  /** GIF LZW + palette decode: header, logical screen descriptor,
    * global/local color table, extension-block skip, first image
    * descriptor (incl. the 4-pass interlace layout), then the full
    * variable-width LZW stream — clear/end codes, table growth, the
    * "early change" width bump at every 2^width entries, 12-bit cap.
    * Any structural violation returns None (the never-throw contract);
    * channel means come from palette lookups, integer-exact. */
  def decodeGif(b: Array[Byte]): Option[Decoded] = {
    if (!(ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) || b.length < 13) return None
    val sw = le16(b, 6); val sh = le16(b, 8)
    val packed = u8(b, 10)
    var pos = 13
    var gct: Array[Int] = null // packed 0xRRGGBB
    def readColorTable(n: Int): Option[Array[Int]] = {
      if (pos.toLong + 3L * n > b.length) return None
      val t = new Array[Int](n)
      var i = 0
      while (i < n) {
        t(i) = (u8(b, pos) << 16) | (u8(b, pos + 1) << 8) | u8(b, pos + 2)
        pos += 3; i += 1
      }
      Some(t)
    }
    if ((packed & 0x80) != 0) {
      gct = readColorTable(2 << (packed & 7)).getOrElse(return None)
    }
    // block walk to the first image descriptor
    while (pos < b.length && u8(b, pos) == 0x21) { // extension: skip sub-blocks
      pos += 2 // introducer + label
      var sz = if (pos < b.length) u8(b, pos) else return None
      while (sz != 0) {
        pos += 1 + sz
        if (pos >= b.length) return None
        sz = u8(b, pos)
      }
      pos += 1 // terminator
    }
    if (pos >= b.length || u8(b, pos) != 0x2c) return None
    if (pos + 10 > b.length) return None
    val w = le16(b, pos + 5); val h = le16(b, pos + 7)
    val ipacked = u8(b, pos + 9)
    pos += 10
    val interlaced = (ipacked & 0x40) != 0
    val palette =
      if ((ipacked & 0x80) != 0) readColorTable(2 << (ipacked & 7)).getOrElse(return None)
      else gct
    val _ = (sw, sh) // frame dims are authoritative for a feature scan
    if (palette == null || w <= 0 || h <= 0) return None
    val npx = w.toLong * h
    if (npx > (1L << 26)) return None // 64M-pixel sanity bound for a feature scan
    // LZW data: min code size byte + concatenated sub-blocks
    if (pos >= b.length) return None
    val minCode = u8(b, pos); pos += 1
    if (minCode < 2 || minCode > 11) return None
    val data = new java.io.ByteArrayOutputStream
    var sz = if (pos < b.length) u8(b, pos) else return None
    while (sz != 0) {
      if (pos.toLong + 1 + sz > b.length) return None
      data.write(b, pos + 1, sz)
      pos += 1 + sz
      if (pos >= b.length) return None
      sz = u8(b, pos)
    }
    val codes = data.toByteArray
    // allocation bound: a compressed byte carries >= 8/12 of a code and a
    // code expands to at most 4096 pixels, so any DECODABLE raster obeys
    // npx <= bytes * ceil(8/3 * 4096). A crafted header declaring 8192x8192
    // over a 40-byte stream would otherwise force a 256 MB allocation per
    // payload BEFORE the stream could prove itself short — the cheap
    // arithmetic check keeps the never-throw lane also never-OOM
    if (npx > codes.length.toLong * 10923L) return None
    // LZW decode (prefix/suffix table form — O(1) per code, no string
    // concat; outputs reversed tails into the pixel buffer)
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = end + 1
    var codeSize = minCode + 1
    val px = new Array[Int](npx.toInt)
    var out = 0
    var bitPos = 0L
    val totalBits = codes.length.toLong * 8
    var prev = -1
    val tail = new Array[Int](4096)
    def readCode(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0; var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        if ((codes((bp >> 3).toInt) & (1 << (bp & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def emit(code: Int): Boolean = { // expand code into px; true on success
      var c = code; var n = 0
      while (c >= clear + 2) { tail(n) = suffix(c); n += 1; c = prefix(c) }
      if (c >= clear) return false
      tail(n) = c; n += 1
      if (out + n > px.length) return false
      var i = n - 1
      while (i >= 0) { px(out) = tail(i); out += 1; i -= 1 }
      true
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    var done = false
    while (!done && out < px.length) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) { next = end + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == end) done = true
      else if (prev == -1) {
        if (code >= clear || !emit(code)) return None
        prev = code
      } else {
        if (code > next) return None
        if (code == next) { // the KwKwK case: output = prev + firstChar(prev)
          if (next >= 4096) return None
          val fc = firstChar(prev)
          if (!emit(prev)) return None
          if (out >= px.length) return None
          px(out) = fc; out += 1
          prefix(next) = prev; suffix(next) = fc
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = next - 1
        } else {
          if (!emit(code)) return None
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstChar(code)
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    if (out < px.length) return None
    // interlaced frames deliver rows in 4 passes (0,8.. / 4,8.. / 2,4.. /
    // 1,2..) — a pure row PERMUTATION, so channel means (the only outputs)
    // are identical with or without the reorder; `interlaced` is accepted
    // and needs no layout pass here
    val _ = interlaced
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val idx = px(i)
      if (idx >= palette.length) return None
      val c = palette(idx)
      sr += (c >> 16) & 0xff; sg += (c >> 8) & 0xff; sb += c & 0xff
      i += 1
    }
    Some(Decoded("gif", width = w, height = h, channels = 3,
      meanR = (sr / npx).toInt, meanG = (sg / npx).toInt, meanB = (sb / npx).toInt))
  }

  /** Minimal valid GIF89a encoder for fixtures: global palette (padded to
    * a power of two), one non-interlaced frame, literal LZW codes with a
    * periodic Clear so the code width never grows — spec-valid output
    * every decoder (incl. [[decodeGif]] and ImageIO) reads losslessly.
    * The DECODER is the real artifact; real compressed streams (table
    * growth, KwKwK) are exercised against ImageIO-written GIFs in specs. */
  def encodeGif(w: Int, h: Int, palette: Seq[(Int, Int, Int)], indices: Seq[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h, "encodeGif: bad dims")
    require(palette.nonEmpty && palette.length <= 256, "encodeGif: bad palette")
    val bits = math.max(2, 32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val tableSize = 1 << bits
    val out = new java.io.ByteArrayOutputStream
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    w8(0x80 | 0x70 | (bits - 1)); w8(0); w8(0) // GCT flag + size, bg, aspect
    for (i <- 0 until tableSize) {
      val (r, g, bl) = if (i < palette.length) palette(i) else (0, 0, 0)
      w8(r); w8(g); w8(bl)
    }
    w8(0x2c); w16(0); w16(0); w16(w); w16(h); w8(0) // image descriptor
    val minCode = bits
    w8(minCode)
    val clear = 1 << minCode
    val end = clear + 1
    val codeSize = minCode + 1
    val bitBuf = new java.io.ByteArrayOutputStream
    var acc = 0L; var nbits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { bitBuf.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    putCode(clear)
    var sinceClear = 0
    val resetEvery = (1 << minCode) - 2 // decoder table never reaches a width bump
    for (ix <- indices) {
      require(ix >= 0 && ix < palette.length, "encodeGif: index out of palette")
      if (sinceClear >= resetEvery) { putCode(clear); sinceClear = 0 }
      putCode(ix); sinceClear += 1
    }
    putCode(end)
    if (nbits > 0) bitBuf.write((acc & 0xff).toInt)
    val payload = bitBuf.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      w8(n); out.write(payload, off, n); off += n
    }
    w8(0) // block terminator
    w8(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // MP3: frame-HEADER walk (MPEG-1 Layer III). Full PCM decode needs a
  // Huffman+IMDCT codec; the header lattice alone yields the metadata a
  // training pipeline filters on (duration, rate, channels) — a real
  // parse of the real container, not a byte-stat guess.
  // ------------------------------------------------------------------

  private val Mp3Bitrates = // kbps, MPEG-1 Layer III, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Walk MPEG-1 Layer III frames: optional ID3v2 tag skip (syncsafe
    * length), then per-frame sync/bitrate/rate validation and the exact
    * `144*bitrate/rate + pad` length hop. Tolerates a sub-header tail
    * (< 4 bytes) and the ubiquitous 128-byte ID3v1 `TAG` trailer; a
    * malformed frame mid-stream or a truncated final frame returns None.
    * nSamples = 1152 per frame; duration is integer-exact floor math. */
  def decodeMp3Meta(b: Array[Byte]): Option[Decoded] = {
    var pos = 0
    if (ascii(b, 0, "ID3")) {
      if (b.length < 10) return None
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      pos = 10 + size
      if (pos < 0 || pos > b.length) return None
    }
    var frames = 0L
    var rate = 0
    var channels = 0
    var brSum = 0L
    var done = false
    while (!done && pos + 4 <= b.length) {
      if (ascii(b, pos, "TAG") && b.length - pos == 128) done = true // ID3v1 trailer
      else {
      if (u8(b, pos) != 0xff || (u8(b, pos + 1) & 0xfe) != 0xfa) return None // MPEG-1 L3
      val brIdx = (u8(b, pos + 2) >> 4) & 0xf
      val srIdx = (u8(b, pos + 2) >> 2) & 0x3
      val pad = (u8(b, pos + 2) >> 1) & 0x1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val r = Mp3Rates(srIdx)
      if (rate == 0) rate = r else if (r != rate) return None
      val mode = (u8(b, pos + 3) >> 6) & 0x3
      val ch = if (mode == 3) 1 else 2
      if (channels == 0) channels = ch else if (ch != channels) return None
      val br = Mp3Bitrates(brIdx)
      brSum += br
      val frameLen = 144 * br * 1000 / r + pad
      if (frameLen <= 4) return None
      frames += 1
      pos += frameLen
      }
    }
    // a frame running past the end = truncated = corrupt; otherwise a
    // sub-header tail (< 4 bytes) or the ID3v1 trailer is tolerated
    if (frames == 0 || pos > b.length) return None
    val nSamples = frames * 1152L
    Some(Decoded("mp3", channels = channels, sampleRate = rate,
      nSamples = nSamples, durationMs = nSamples * 1000L / rate,
      rmsE3 = brSum / frames)) // rmsE3 slot carries the mean kbps for audio meta
  }

  /** Synthesize a structurally-valid MPEG-1 Layer III frame sequence
    * (headers + deterministic filler payload; no PCM) — the fixture lane
    * for [[decodeMp3Meta]]. */
  def encodeMp3Frames(nFrames: Int, bitrateKbps: Int, sampleRate: Int,
      stereo: Boolean, fill: Byte = 0x55): Array[Byte] = {
    val brIdx = Mp3Bitrates.indexOf(bitrateKbps)
    val srIdx = Mp3Rates.indexOf(sampleRate)
    require(brIdx >= 1 && srIdx >= 0, s"unsupported mp3 params $bitrateKbps/$sampleRate")
    val frameLen = 144 * bitrateKbps * 1000 / sampleRate
    val frame = new Array[Byte](frameLen)
    java.util.Arrays.fill(frame, fill)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
    frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
    frame(3) = (if (stereo) 0x00 else 0xc0).toByte
    val out = new Array[Byte](frameLen * nFrames)
    var i = 0
    while (i < nFrames) { System.arraycopy(frame, 0, out, i * frameLen, frameLen); i += 1 }
    out
  }

  // ------------------------------------------------------------------
  // MP4 / ISO BMFF (ISO/IEC 14496-12, public spec) — VIDEO metadata via
  // a real box walk: ftyp sniff, moov → mvhd (timescale/duration, v0+v1)
  // and trak → tkhd (track id, 16.16 width/height) + mdia → hdlr
  // (handler 4cc). No sample data is decoded (frame decode needs a codec
  // library not in this container); the box framing, version dispatch,
  // and fixed-point dims are the real container format. Defensive
  // doctrine as the other parsers: every offset bounds-checked, child
  // walks clamped to the parent's extent, declared sizes never drive an
  // allocation, None on any malformation.
  // ------------------------------------------------------------------

  /** One parsed trak: `handler` is the hdlr 4cc ("vide"/"soun"/…, "" when
    * absent); width/height are the integer part of tkhd's 16.16 fields. */
  final case class Mp4Track(trackId: Long, handler: String, width: Int, height: Int)

  /** Parsed movie metadata. [[toDecoded]] folds into the shared feature
    * row: kind=mp4, width/height = the FIRST video track's dims,
    * channels = track count, sampleRate = mvhd timescale, nSamples =
    * mvhd duration (timescale units), durationMs exact floor math. */
  final case class Mp4Meta(timescale: Long, duration: Long, tracks: Seq[Mp4Track]) {
    def durationMs: Long = if (timescale <= 0) 0L else duration * 1000L / timescale
    def toDecoded: Decoded = {
      val v = tracks.find(_.handler == "vide")
      Decoded("mp4",
        width = v.map(_.width).getOrElse(0), height = v.map(_.height).getOrElse(0),
        channels = tracks.size, sampleRate = timescale.toInt,
        nSamples = duration, durationMs = durationMs)
    }
  }

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate the child boxes of [start, end): calls `f(type, payloadStart,
    * payloadEnd)`; returns false on malformed framing. size==1 →
    * 64-bit largesize; size==0 → box extends to `end`. */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
      (f: (String, Int, Int) => Boolean): Boolean = {
    var pos = start
    while (pos < end) {
      if (pos + 8 > end) return false
      val sz32 = be32(b, pos) & 0xffffffffL
      val typ = fourcc(b, pos + 8 - 4)
      var payload = pos + 8
      val boxEnd: Long =
        if (sz32 == 0L) end.toLong
        else if (sz32 == 1L) {
          if (pos + 16 > end) return false
          payload = pos + 16
          pos + be64(b, pos + 8)
        } else pos + sz32
      if (boxEnd < payload || boxEnd > end) return false
      if (!f(typ, payload, boxEnd.toInt)) return false
      pos = boxEnd.toInt
    }
    true
  }

  /** Real MP4 metadata walk; None on any malformed framing, missing
    * moov/mvhd, or unsupported version fields. */
  def decodeMp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (!ascii(b, 4, "ftyp")) return None
    var timescale = -1L
    var duration = -1L
    val tracks = Seq.newBuilder[Mp4Track]
    var sawMoov = false
    val ok = walkBoxes(b, 0, b.length) { (typ, ps, pe) =>
      if (typ != "moov") true
      else {
        sawMoov = true
        walkBoxes(b, ps, pe) { (t2, p2, e2) =>
          t2 match {
            case "mvhd" =>
              if (p2 + 4 > e2) false
              else u8(b, p2) match {
                case 0 => // ver/flags 4, times 4+4, timescale 4, duration 4
                  if (p2 + 20 > e2) false
                  else {
                    timescale = be32(b, p2 + 12) & 0xffffffffL
                    duration = be32(b, p2 + 16) & 0xffffffffL
                    true
                  }
                case 1 => // times 8+8, timescale 4, duration 8
                  if (p2 + 32 > e2) false
                  else {
                    timescale = be32(b, p2 + 20) & 0xffffffffL
                    duration = be64(b, p2 + 24)
                    true
                  }
                case _ => false
              }
            case "trak" =>
              var tid = -1L
              var w = 0; var h = 0
              var handler = ""
              val tok = walkBoxes(b, p2, e2) { (t3, p3, e3) =>
                t3 match {
                  case "tkhd" =>
                    if (p3 + 4 > e3) false
                    else {
                      val ver = u8(b, p3)
                      // v0: ver/flags 4, times 4+4, id 4, resv 4, dur 4 → tail at +24
                      // v1: ver/flags 4, times 8+8, id 4, resv 4, dur 8 → tail at +36
                      val (idOff, tailOff) =
                        if (ver == 0) (p3 + 12, p3 + 24) else (p3 + 20, p3 + 36)
                      // tail: resv 8, layer 2, alt 2, vol 2, resv 2,
                      // matrix 36, width 4, height 4
                      val wOff = tailOff + 8 + 2 + 2 + 2 + 2 + 36
                      if (ver > 1 || wOff + 8 > e3) false
                      else {
                        tid = be32(b, idOff) & 0xffffffffL
                        w = be32(b, wOff) >>> 16 // 16.16 integer part
                        h = be32(b, wOff + 4) >>> 16
                        true
                      }
                    }
                  case "mdia" =>
                    walkBoxes(b, p3, e3) { (t4, p4, e4) =>
                      if (t4 == "hdlr" && p4 + 12 <= e4)
                        handler = fourcc(b, p4 + 8)
                      true
                    }
                  case _ => true
                }
              }
              if (!tok || tid < 0) false
              else { tracks += Mp4Track(tid, handler, w, h); true }
            case _ => true
          }
        }
      }
    }
    if (!ok || !sawMoov || timescale < 0) None
    else Some(Mp4Meta(timescale, duration, tracks.result()))
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val sz = out.length
    out(0) = (sz >>> 24).toByte; out(1) = (sz >>> 16).toByte
    out(2) = (sz >>> 8).toByte; out(3) = sz.toByte
    typ.indices.foreach(i => out(4 + i) = typ.charAt(i).toByte)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }
  private def be32b(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Synthesize a structurally-valid MP4 (ftyp + moov/mvhd v0 + one
    * trak/tkhd/mdia/hdlr per track) — the fixture lane for
    * [[decodeMp4Meta]], the q105 idiom. No media samples. */
  def encodeMp4Meta(timescale: Long, duration: Long, tracks: Seq[Mp4Track]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32b(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd", new Array[Byte](12) ++ be32b(timescale) ++ be32b(duration) ++
      be32b(0x00010000L) ++ Array(0x01.toByte, 0x00.toByte) ++ new Array[Byte](10) ++
      mat ++ new Array[Byte](24) ++ be32b(tracks.size + 1L))
    val trakBoxes = tracks.map { t =>
      val tkhd = box("tkhd", new Array[Byte](4) ++ be32b(0) ++ be32b(0) ++
        be32b(t.trackId) ++ be32b(0) ++ be32b(duration) ++ new Array[Byte](8) ++
        new Array[Byte](8) ++ mat ++
        be32b(t.width.toLong << 16) ++ be32b(t.height.toLong << 16))
      val hdlr = box("hdlr", new Array[Byte](8) ++
        t.handler.getBytes("US-ASCII") ++ new Array[Byte](12) ++ Array(0.toByte))
      val mdia = box("mdia", hdlr)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ trakBoxes.flatten)
    ftyp ++ moov
  }

  /** The identity 3×3 fixed-point matrix every sane MP4 carries. */
  private val mat: Array[Byte] =
    be32b(0x00010000L) ++ be32b(0) ++ be32b(0) ++
    be32b(0) ++ be32b(0x00010000L) ++ be32b(0) ++
    be32b(0) ++ be32b(0) ++ be32b(0x40000000L)

  // ------------------------------------------------------------------
  // MP4 sample tables (ISO 14496-12 §8.6.1 stts, §8.7.3 stsz, §8.7.4
  // stsc, §8.7.5 stco/co64) — the box arithmetic that turns the
  // compressed container into frame-accurate (offset, size, dts)
  // triples WITHOUT any codec: the capability a training pipeline
  // needs to slice/sample frames out of 100 TB of video without
  // decoding it. Same defensive doctrine as the metadata walk: every
  // entry table bounds-checked against its box extent BEFORE any
  // allocation, declared counts capped, None on any malformation
  // (including stts/stsz count disagreement and samples left over
  // after the last chunk).
  // ------------------------------------------------------------------

  /** One resolved sample: `dts` in track-timescale units (stts running
    * sum), `chunkIdx` 0-based, `offset` the ABSOLUTE file offset
    * (stco chunk base + within-chunk size prefix-sum). */
  final case class Mp4Sample(trackId: Long, sampleIdx: Long, dts: Long,
      size: Long, chunkIdx: Long, offset: Long)

  private val Mp4SampleCap = 1 << 20 // declared counts never drive allocation

  /** Per-track sample-table walk over the full file: moov → trak →
    * (tkhd id) + mdia → minf → stbl → stts/stsz/stsc/stco|co64, then
    * the chunk-run expansion. None on malformed framing anywhere. */
  def decodeMp4Samples(b: Array[Byte]): Option[Seq[Mp4Sample]] = {
    if (!ascii(b, 4, "ftyp")) return None
    val out = Seq.newBuilder[Mp4Sample]
    var sawTrack = false

    def parseTrak(ps: Int, pe: Int): Boolean = {
      var tid = -1L
      var stts: Vector[(Long, Long)] = Vector.empty
      var stscRuns: Vector[(Long, Long)] = Vector.empty
      var uniform = -1L
      var sizeTbl: Vector[Long] = Vector.empty
      var nSamples = -1L
      var chunkOffs: Vector[Long] = Vector.empty
      var sawStbl = false

      def parseStbl(p0: Int, e0: Int): Boolean = walkBoxes(b, p0, e0) { (t, p, e) =>
        t match {
          case "stts" =>
            if (p + 8 > e || u8(b, p) != 0) false
            else {
              val n = be32(b, p + 4) & 0xffffffffL
              if (n > Mp4SampleCap || p + 8 + 8 * n > e) false
              else {
                stts = (0L until n).map(i =>
                  (be32(b, p + 8 + 8 * i.toInt) & 0xffffffffL,
                    be32(b, p + 12 + 8 * i.toInt) & 0xffffffffL)).toVector
                true
              }
            }
          case "stsz" =>
            if (p + 12 > e || u8(b, p) != 0) false
            else {
              uniform = be32(b, p + 4) & 0xffffffffL
              nSamples = be32(b, p + 8) & 0xffffffffL
              if (nSamples > Mp4SampleCap) false
              else if (uniform != 0L) true
              else if (p + 12 + 4 * nSamples > e) false
              else {
                sizeTbl = (0L until nSamples).map(i =>
                  be32(b, p + 12 + 4 * i.toInt) & 0xffffffffL).toVector
                true
              }
            }
          case "stsc" =>
            if (p + 8 > e || u8(b, p) != 0) false
            else {
              val n = be32(b, p + 4) & 0xffffffffL
              if (n > Mp4SampleCap || p + 8 + 12 * n > e) false
              else {
                stscRuns = (0L until n).map(i =>
                  (be32(b, p + 8 + 12 * i.toInt) & 0xffffffffL,
                    be32(b, p + 12 + 12 * i.toInt) & 0xffffffffL)).toVector
                stscRuns.nonEmpty && stscRuns.head._1 == 1L &&
                  stscRuns.forall(_._2 >= 1L) &&
                  stscRuns.map(_._1).sliding(2).forall(w => w.size < 2 || w(0) < w(1))
              }
            }
          case "stco" =>
            if (p + 8 > e || u8(b, p) != 0) false
            else {
              val n = be32(b, p + 4) & 0xffffffffL
              if (n > Mp4SampleCap || p + 8 + 4 * n > e) false
              else {
                chunkOffs = (0L until n).map(i =>
                  be32(b, p + 8 + 4 * i.toInt) & 0xffffffffL).toVector
                true
              }
            }
          case "co64" =>
            if (p + 8 > e || u8(b, p) != 0) false
            else {
              val n = be32(b, p + 4) & 0xffffffffL
              if (n > Mp4SampleCap || p + 8 + 8 * n > e) false
              else {
                chunkOffs = (0L until n).map(i => be64(b, p + 8 + 8 * i.toInt)).toVector
                true
              }
            }
          case _ => true
        }
      }

      val ok = walkBoxes(b, ps, pe) { (t, p, e) =>
        t match {
          case "tkhd" =>
            if (p + 4 > e) false
            else {
              val ver = u8(b, p)
              val idOff = if (ver == 0) p + 12 else p + 20
              if (ver > 1 || idOff + 4 > e) false
              else { tid = be32(b, idOff) & 0xffffffffL; true }
            }
          case "mdia" =>
            walkBoxes(b, p, e) { (t2, p2, e2) =>
              if (t2 != "minf") true
              else walkBoxes(b, p2, e2) { (t3, p3, e3) =>
                if (t3 != "stbl") true
                else { sawStbl = true; parseStbl(p3, e3) }
              }
            }
          case _ => true
        }
      }
      if (!ok || tid < 0) return false
      if (!sawStbl) return true // a metadata-only trak (q130 fixtures)
      if (stts.isEmpty || nSamples < 0 || stscRuns.isEmpty || chunkOffs.isEmpty)
        return false
      // cross-check: stts total must equal the stsz sample count, and
      // zero-count runs are degenerate (they would mis-assign deltas)
      if (stts.map(_._1).sum != nSamples || stts.exists(_._1 < 1L)) return false
      def sizeOf(i: Long): Long =
        if (uniform != 0L) uniform else sizeTbl(i.toInt)
      // chunk-run expansion: samples fill chunks in order; the run with
      // the greatest first_chunk <= chunk governs; last chunk may be
      // partial; samples left after the last chunk → malformed
      var si = 0L
      var dts = 0L
      var run = 0 // stts run cursor
      var inRun = 0L
      var ci = 0
      while (ci < chunkOffs.length && si < nSamples) {
        val spc = stscRuns.takeWhile(_._1 <= ci + 1L).last._2
        var within = 0L
        var k = 0L
        while (k < spc && si < nSamples) {
          out += Mp4Sample(tid, si, dts, sizeOf(si), ci.toLong, chunkOffs(ci) + within)
          within += sizeOf(si)
          // advance dts through the stts runs
          inRun += 1
          dts += stts(run)._2
          if (inRun >= stts(run)._1 && run < stts.length - 1) { run += 1; inRun = 0 }
          si += 1
          k += 1
        }
        ci += 1
      }
      if (si < nSamples) return false
      sawTrack = true
      true
    }

    val ok = walkBoxes(b, 0, b.length) { (typ, ps, pe) =>
      if (typ != "moov") true
      else walkBoxes(b, ps, pe) { (t2, p2, e2) =>
        if (t2 != "trak") true else parseTrak(p2, e2)
      }
    }
    if (!ok || !sawTrack) None else Some(out.result())
  }

  /** Synthesize a COMPLETE one-track MP4 — ftyp + moov with real sample
    * tables (stts run-length, per-sample stsz, single-entry stsc, stco
    * with true absolute offsets) + an mdat holding the sample bytes —
    * the fixture lane for [[decodeMp4Samples]] (the q105 idiom). stco
    * depends on moov's own size, so the moov is built twice: once with
    * zero offsets to measure, once with the real ones (same length —
    * offsets are fixed-width). */
  def encodeMp4Samples(timescale: Long, trackId: Long,
      sttsRuns: Seq[(Int, Int)], sizes: Seq[Int], spc: Int): Array[Byte] = {
    require(spc >= 1 && sizes.nonEmpty && sttsRuns.map(_._1).sum == sizes.size)
    val nChunks = (sizes.size + spc - 1) / spc
    val duration = sttsRuns.map { case (c, d) => c.toLong * d }.sum
    def full(typ: String, payload: Array[Byte]) = box(typ, new Array[Byte](4) ++ payload)
    val stts = full("stts", be32b(sttsRuns.size.toLong) ++
      sttsRuns.flatMap { case (c, d) => be32b(c.toLong) ++ be32b(d.toLong) })
    val stsz = full("stsz", be32b(0) ++ be32b(sizes.size.toLong) ++
      sizes.flatMap(s => be32b(s.toLong)))
    val stsc = full("stsc", be32b(1) ++ be32b(1) ++ be32b(spc.toLong) ++ be32b(1))
    def moovWith(offs: Seq[Long]): Array[Byte] = {
      val stco = full("stco", be32b(offs.size.toLong) ++ offs.flatMap(be32b))
      val stbl = box("stbl", stts ++ stsz ++ stsc ++ stco)
      val minf = box("minf", stbl)
      val hdlr = box("hdlr", new Array[Byte](8) ++
        "vide".getBytes("US-ASCII") ++ new Array[Byte](12) ++ Array(0.toByte))
      val mdia = box("mdia", hdlr ++ minf)
      val tkhd = box("tkhd", new Array[Byte](4) ++ be32b(0) ++ be32b(0) ++
        be32b(trackId) ++ be32b(0) ++ be32b(duration & 0xffffffffL) ++
        new Array[Byte](8) ++ new Array[Byte](8) ++ mat ++
        be32b(640L << 16) ++ be32b(480L << 16))
      val mvhd = box("mvhd", new Array[Byte](12) ++ be32b(timescale) ++
        be32b(duration & 0xffffffffL) ++ be32b(0x00010000L) ++
        Array(0x01.toByte, 0x00.toByte) ++ new Array[Byte](10) ++
        mat ++ new Array[Byte](24) ++ be32b(trackId + 1))
      box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32b(0x200) ++
      "isomiso2".getBytes("US-ASCII"))
    val probe = moovWith(Seq.fill(nChunks)(0L))
    val mdatPayload = ftyp.length.toLong + probe.length + 8L
    val chunkOffs = sizes.grouped(spc).scanLeft(mdatPayload) {
      (acc, chunk) => acc + chunk.map(_.toLong).sum
    }.take(nChunks).toSeq
    val moov = moovWith(chunkOffs)
    require(moov.length == probe.length, "stco width drift")
    val total = sizes.map(_.toLong).sum.toInt
    val media = Array.tabulate(total)(i => (i % 251).toByte)
    ftyp ++ moov ++ box("mdat", media)
  }

  // ------------------------------------------------------------------
  // Ogg / Opus (RFC 3533 page framing + RFC 7845 identification
  // header) — the voice-corpus container: real page walk with the
  // Ogg CRC-32 VERIFIED (poly 0x04C11DB7, init 0, non-reflected,
  // computed with the checksum field zeroed), OpusHead parse
  // (channels, pre-skip, input rate), duration from the last page's
  // granule position on the 48 kHz Opus clock. Opus PCM itself needs
  // the CELT/SILK codec (spec tables not in this container) — this is
  // the metadata plane, parsed from the real framing like MP3/MP4.
  // ------------------------------------------------------------------

  /** Parsed Ogg-Opus metadata. `nSamples48k` = last granule − pre-skip
    * on the 48 kHz granule clock (the Opus duration contract);
    * `inputRate` is informational (OpusHead's original input rate). */
  final case class OggOpusMeta(channels: Int, preSkip: Int, inputRate: Long,
      lastGranule: Long, pages: Int) {
    def nSamples48k: Long = math.max(0L, lastGranule - preSkip)
    def durationMs: Long = nSamples48k * 1000L / 48000L
    def toDecoded: Decoded = Decoded("ogg", channels = channels,
      sampleRate = inputRate.toInt, nSamples = nSamples48k,
      durationMs = durationMs, rmsE3 = preSkip.toLong)
  }

  private def le64(b: Array[Byte], i: Int): Long =
    (le32(b, i) & 0xffffffffL) | ((le32(b, i + 4) & 0xffffffffL) << 32)

  /** Ogg page CRC-32 over [from, until) with the 4 bytes at `crcPos`
    * treated as zero. */
  private[operators] def oggCrc(b: Array[Byte], from: Int, until: Int,
      crcPos: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val v = if (i >= crcPos && i < crcPos + 4) 0 else u8(b, i)
      crc ^= v << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7 else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Real Ogg-Opus metadata walk; None on bad framing, failed page
    * CRC, or a missing/invalid OpusHead on the BOS page. */
  def decodeOggOpus(b: Array[Byte]): Option[OggOpusMeta] = {
    var pos = 0
    var pages = 0
    var lastGranule = 0L
    var head: Option[(Int, Int, Long)] = None
    while (pos < b.length) {
      if (pos + 27 > b.length || !ascii(b, pos, "OggS")) return None
      if (u8(b, pos + 4) != 0) return None // stream structure version
      val htype = u8(b, pos + 5)
      val granule = le64(b, pos + 6)
      val crcGot = le32(b, pos + 22)
      val nseg = u8(b, pos + 26)
      if (pos + 27 + nseg > b.length) return None
      var payLen = 0
      var i = 0
      while (i < nseg) { payLen += u8(b, pos + 27 + i); i += 1 }
      val payStart = pos + 27 + nseg
      val pageEnd = payStart + payLen
      if (pageEnd > b.length) return None
      if (oggCrc(b, pos, pageEnd, pos + 22) != crcGot) return None
      if ((htype & 0x02) != 0 && head.isEmpty) {
        // BOS page: first packet must be OpusHead (RFC 7845 §5.1)
        if (payLen < 19 || !ascii(b, payStart, "OpusHead")) return None
        if (u8(b, payStart + 8) != 1) return None // version
        head = Some((u8(b, payStart + 9), le16(b, payStart + 10),
          le32(b, payStart + 12) & 0xffffffffL))
      }
      if (granule != -1L) lastGranule = granule
      pages += 1
      pos = pageEnd
    }
    head.collect { case (ch, ps, rate) if pages > 0 =>
      OggOpusMeta(ch, ps, rate, lastGranule, pages)
    }
  }

  /** Synthesize a structurally-valid Ogg-Opus stream (BOS/OpusHead +
    * OpusTags + one audio page per granule, EOS on the last; correct
    * page CRCs) — the fixture lane for [[decodeOggOpus]]. */
  def encodeOggOpus(channels: Int, preSkip: Int, inputRate: Long,
      granules: Seq[Long]): Array[Byte] = {
    require(granules.nonEmpty, "need at least one audio page")
    def le16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Long) = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le64b(v: Long) = le32b(v & 0xffffffffL) ++ le32b((v >>> 32) & 0xffffffffL)
    def page(htype: Int, granule: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255 * 255, "fixture pages stay small")
      val lacing = Array.fill(payload.length / 255)(255.toByte) ++
        Array((payload.length % 255).toByte)
      val p = "OggS".getBytes("US-ASCII") ++ Array(0.toByte, htype.toByte) ++
        le64b(granule) ++ le32b(0x5eed) ++ le32b(seq.toLong) ++ le32b(0L) ++
        Array(lacing.length.toByte) ++ lacing ++ payload
      val crc = oggCrc(p, 0, p.length, 22)
      System.arraycopy(le32b(crc.toLong & 0xffffffffL), 0, p, 22, 4)
      p
    }
    val opusHead = "OpusHead".getBytes("US-ASCII") ++ Array(1.toByte,
      channels.toByte) ++ le16b(preSkip) ++ le32b(inputRate) ++
      le16b(0) ++ Array(0.toByte)
    val opusTags = "OpusTags".getBytes("US-ASCII") ++ le32b(0L) ++ le32b(0L)
    val audio = granules.zipWithIndex.map { case (g, i) =>
      val body = Array.tabulate(40)(j => ((g + j) % 251).toByte)
      page(if (i == granules.size - 1) 0x04 else 0x00, g, 2 + i, body)
    }
    (page(0x02, 0L, 0, opusHead) +: page(0x00, 0L, 1, opusTags) +: audio)
      .reduce(_ ++ _)
  }

  // ------------------------------------------------------------------
  // Y4M / YUV4MPEG2 (the mjpegtools raw-video interchange format,
  // public spec) — REAL video SAMPLE decode: uncompressed planar YUV,
  // so the actual pixel planes decode with pure stdlib byte walking.
  // Stream header `YUV4MPEG2` + space-separated parameter tokens
  // (W width, H height, F fps num:den, C chroma mode; I/A/X tolerated
  // and ignored) terminated by 0x0A; each frame is `FRAME` + optional
  // space-prefixed parameters + 0x0A followed by the raw Y plane
  // (W·H bytes) and, per chroma mode, the Cb and Cr planes
  // (420*: (W/2)·(H/2) each; 422: (W/2)·H; 444: W·H; mono: none).
  // Defensive doctrine as the other parsers: plane sizes computed in
  // Long, declared dims never drive an allocation (stats accumulate
  // in place over the payload), any structural violation — bad magic,
  // unterminated header, odd dims for a subsampled mode, a frame
  // running past the end, zero frames — returns None.
  // ------------------------------------------------------------------

  /** One decoded frame's exact stats: floor-divided integer means of
    * the Y / Cb / Cr planes (mono streams report 0 chroma). */
  final case class Y4mFrame(index: Long, meanY: Long, meanCb: Long, meanCr: Long)

  /** Parsed Y4M stream. [[toDecoded]] folds into the shared feature
    * row: kind=y4m, width/height, channels = plane count (1 for mono,
    * 3 otherwise), sampleRate slot carries the fps NUMERATOR,
    * nSamples = frame count, durationMs = exact nFrames·1000·den/num,
    * meanR/meanG/meanB = the FIRST frame's Y/Cb/Cr means (the GIF
    * first-frame precedent). */
  final case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      chroma: String, frames: Seq[Y4mFrame]) {
    def durationMs: Long =
      if (fpsNum <= 0) 0L else frames.size.toLong * 1000L * fpsDen / fpsNum
    def toDecoded: Decoded = {
      val f0 = frames.head
      Decoded("y4m", width = width, height = height,
        channels = if (chroma == "mono") 1 else 3, sampleRate = fpsNum,
        nSamples = frames.size.toLong, durationMs = durationMs,
        meanR = f0.meanY.toInt, meanG = f0.meanCb.toInt, meanB = f0.meanCr.toInt)
    }
  }

  private val Y4mChromaModes =
    Set("420jpeg", "420mpeg2", "420paldv", "420", "422", "444", "mono")

  /** Real Y4M decode — header walk + per-frame plane stats; None on any
    * malformation. Chroma mode defaults to 420jpeg when C is absent
    * (the spec default). */
  def decodeY4m(b: Array[Byte]): Option[Y4mVideo] = {
    if (!ascii(b, 0, "YUV4MPEG2")) return None
    var hEnd = 9
    while (hEnd < b.length && b(hEnd) != 0x0a) hEnd += 1
    if (hEnd >= b.length) return None // unterminated header
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var chroma = "420jpeg"
    var i = 9
    while (i < hEnd) {
      if (b(i) != 0x20) return None // tokens are space-separated
      var j = i + 1
      while (j < hEnd && b(j) != 0x20) j += 1
      if (j > i + 1) {
        val v = new String(b, i + 2, j - i - 2, java.nio.charset.StandardCharsets.US_ASCII)
        b(i + 1).toChar match {
          case 'W' => w = v.toIntOption.getOrElse(return None)
          case 'H' => h = v.toIntOption.getOrElse(return None)
          case 'F' => v.split(":", -1) match {
            case Array(n, d) =>
              fn = n.toIntOption.getOrElse(return None)
              fd = d.toIntOption.getOrElse(return None)
            case _ => return None
          }
          case 'C' =>
            if (!Y4mChromaModes.contains(v)) return None
            chroma = v
          case 'I' | 'A' | 'X' => () // interlace/aspect/metadata: ignored
          case _ => return None
        }
      }
      i = j
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val ySize = w.toLong * h
    val cSize: Long = chroma match {
      case "mono" => 0L
      case "444" => ySize
      case "422" => if (w % 2 != 0) return None else (w / 2).toLong * h
      case _ => // 420 family
        if (w % 2 != 0 || h % 2 != 0) return None
        else (w / 2).toLong * (h / 2)
    }
    val frameBytes = ySize + 2L * cSize
    def planeSum(start: Long, n: Long): Long = {
      var s = 0L; var k = 0L
      while (k < n) { s += u8(b, (start + k).toInt); k += 1 }
      s
    }
    val frames = Seq.newBuilder[Y4mFrame]
    var idx = 0L
    var pos = hEnd + 1
    while (pos < b.length) {
      if (!ascii(b, pos, "FRAME")) return None
      var fe = pos + 5
      while (fe < b.length && b(fe) != 0x0a) fe += 1
      if (fe >= b.length) return None // unterminated FRAME line
      if (fe > pos + 5 && b(pos + 5) != 0x20) return None // params need a space
      val p = fe + 1
      if (p.toLong + frameBytes > b.length) return None // truncated frame
      val sy = planeSum(p, ySize)
      val (mcb, mcr) =
        if (cSize == 0L) (0L, 0L)
        else (planeSum(p + ySize, cSize) / cSize,
          planeSum(p + ySize + cSize, cSize) / cSize)
      frames += Y4mFrame(idx, sy / ySize, mcb, mcr)
      idx += 1
      pos = (p.toLong + frameBytes).toInt
    }
    if (idx == 0L) None
    else Some(Y4mVideo(w, h, fn, fd, chroma, frames.result()))
  }

  /** Synthesize a Y4M stream (the fixture/oracle lane for
    * [[decodeY4m]], the q79/q105 idiom): each frame is (y, cb, cr)
    * plane byte values; chroma plane sizes must match the mode. */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int, chroma: String,
      frames: Seq[(Seq[Int], Seq[Int], Seq[Int])]): Array[Byte] = {
    require(Y4mChromaModes.contains(chroma), s"unsupported chroma $chroma")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C$chroma\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    frames.foreach { case (y, cb, cr) =>
      out.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      y.foreach(v => out.write(v & 0xff))
      cb.foreach(v => out.write(v & 0xff))
      cr.foreach(v => out.write(v & 0xff))
    }
    out.toByteArray
  }
}
