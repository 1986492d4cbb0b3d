package graft.operators

/** From-scratch FLAC codec (the free lossless audio format, public spec
  * — RFC 9639 / xiph.org). FLAC is the one COMPRESSED audio container
  * whose full PCM decode needs no spec constant tables: everything is
  * algorithmic — bit-level big-endian framing, UTF-8-style frame
  * numbers, CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) integrity,
  * Rice/Golomb residual coding with zigzag folding, polynomial FIXED
  * predictors (orders 0–4, binomial coefficients), in-stream-quantized
  * LPC predictors, and the exact mid/side / left-side / right-side
  * stereo decorrelation. (MP3 PCM, by contrast, needs the ISO Huffman
  * + scalefactor-band + synthesis-window tables and stays behind the
  * metadata seam.)
  *
  * Decoder surface: STREAMINFO + any metadata blocks, then frames —
  * all block-size/sample-rate/sample-size codes incl. the
  * follows-in-stream forms, all channel assignments, CONSTANT /
  * VERBATIM / FIXED / LPC subframes, wasted bits, both Rice methods
  * (4- and 5-bit parameters) with escape partitions, partition orders
  * 0–15, and BOTH header CRC-8 and frame CRC-16 VERIFIED (a tampered
  * byte fails the checksum, not the process). Defensive doctrine as
  * every [[MediaCodecs]] parser: reads are bounds-checked, declared
  * counts never drive an allocation beyond the payload's own length,
  * any malformation returns None.
  *
  * Encoder surface (the fixture/oracle lane, valid FLAC a standard
  * player decodes): fixed-blocksize streams, FIXED predictors of any
  * order 0–4 (or verbatim), Rice method 0 with a deterministic
  * parameter rule, configurable partition order, independent or
  * mid/side stereo, 8/16-bit depths.
  *
  * Exactness: FLAC is lossless, so decoded samples equal the source
  * integers bit-for-bit — oracle queries re-derive features from the
  * same hash-derived samples with no tolerance band (the q79 WAV
  * idiom, through a genuinely compressed container).
  */
object Flac {

  /** Decoded stream: per-channel sample arrays (equal length). */
  final case class FlacAudio(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Array[Int]]) {
    def nSamples: Long = if (samples.isEmpty) 0L else samples(0).length.toLong
  }

  // ---- CRCs (FLAC spec: CRC-8 poly x^8+x^2+x+1 = 0x07 init 0;
  // CRC-16 poly x^16+x^15+x^2+1 = 0x8005 init 0; both MSB-first) ----
  private[operators] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }
  private[operators] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit reader over a byte array; any read past the end
    * throws (callers catch → None, the never-throw contract's seam). */
  private final class BitReader(b: Array[Byte], startByte: Int) {
    var pos: Int = startByte // current byte
    var bit: Int = 0 // bits consumed in current byte (0..7)
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      val v = ((b(pos) >> (7 - bit)) & 1)
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      if (n == 0) 0L
      else {
        val u = readBits(n)
        if ((u & (1L << (n - 1))) != 0) u - (1L << n) else u
      }
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** MSB-first bit writer. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { writeBit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var k = 0
      while (k < q) { writeBit(0); k += 1 }
      writeBit(1)
    }
    def align(): Unit = while (nb != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(nb == 0, "unaligned"); out.toByteArray }
  }

  private def zigzagDecode(u: Long): Long = (u >>> 1) ^ -(u & 1L)
  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  // FIXED predictor application: s[i] = resid[i] + prediction(order)
  private def fixedRestore(order: Int, s: Array[Long], n: Int): Unit = {
    var i = order
    while (i < n) {
      val p = order match {
        case 0 => 0L
        case 1 => s(i - 1)
        case 2 => 2 * s(i - 1) - s(i - 2)
        case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      s(i) += p
      i += 1
    }
  }
  private def fixedResidual(order: Int, s: Array[Long], i: Int): Long = {
    val p = order match {
      case 0 => 0L
      case 1 => s(i - 1)
      case 2 => 2 * s(i - 1) - s(i - 2)
      case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
      case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    }
    s(i) - p
  }

  /** Decode a full FLAC stream; None on any malformation, failed CRC,
    * or unsupported reserved code. */
  def decode(b: Array[Byte]): Option[FlacAudio] =
    try decodeImpl(b) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(b: Array[Byte]): Option[FlacAudio] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return None
    // metadata blocks; STREAMINFO (type 0, 34 bytes) must come first
    var pos = 4
    var last = false
    var sawInfo = false
    var rate = 0; var nch = 0; var bps = 0; var total = 0L
    var first = true
    while (!last) {
      if (pos + 4 > b.length) return None
      last = (b(pos) & 0x80) != 0
      val typ = b(pos) & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      pos += 4
      if (pos + len > b.length) return None
      if (first) {
        if (typ != 0 || len != 34) return None
        val r = new BitReader(b, pos)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        rate = r.readBits(20).toInt
        nch = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
        sawInfo = true
      }
      pos += len
      first = false
    }
    if (!sawInfo || rate <= 0 || total < 0) return None
    val chans = Array.fill(nch)(new scala.collection.mutable.ArrayBuffer[Int]())
    // frames until the declared sample count is reached (total == 0
    // means unknown: read frames to EOF)
    while ((total > 0 && chans(0).length < total) || (total == 0 && pos < b.length)) {
      val frameStart = pos
      val r = new BitReader(b, pos)
      if (r.readBits(14) != 0x3ffe) return None
      if (r.readBit() != 0) return None // reserved
      r.readBit() // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chAsgn = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      if (r.readBit() != 0) return None // reserved
      // UTF-8-style coded frame/sample number
      val b0 = r.readBits(8).toInt
      var cont = 0
      var x = b0
      while ((x & 0x80) != 0) { cont += 1; x <<= 1 }
      if (cont == 1 || cont > 6) return None
      var k = 0
      while (k < (if (cont == 0) 0 else cont - 1)) {
        if ((r.readBits(8).toInt & 0xc0) != 0x80) return None
        k += 1
      }
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value only needed when it FOLLOWS in-stream
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => return None
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => return None
      }
      // header CRC-8 (header is byte-aligned here by construction)
      if (!r.aligned) return None
      val crcGot = r.readBits(8).toInt
      if (crc8(b, frameStart, r.bytePos - 1) != crcGot) return None
      val frameCh = if (chAsgn <= 7) chAsgn + 1 else 2
      if (frameCh != nch || chAsgn == 11 || chAsgn > 10) return None
      // Long arithmetic: Int b.length * 8 wraps negative past 268 MB
      // and would refuse valid large files (the MediaCodecs Long-bounds
      // doctrine)
      if (blockSize <= 0 || blockSize.toLong > b.length.toLong * 8) return None
      // subframes
      val sub = Array.ofDim[Array[Long]](frameCh)
      var ci = 0
      while (ci < frameCh) {
        // side channel carries one extra bit
        val extra = chAsgn match {
          case 8 => if (ci == 1) 1 else 0 // left/side
          case 9 => if (ci == 0) 1 else 0 // right/side
          case 10 => if (ci == 1) 1 else 0 // mid/side
          case _ => 0
        }
        sub(ci) = decodeSubframe(r, blockSize, frameBps + extra)
          .getOrElse(return None)
        ci += 1
      }
      r.align()
      val crc16Got = r.readBits(16).toInt
      if (crc16(b, frameStart, r.bytePos - 2) != crc16Got) return None
      pos = r.bytePos
      // stereo reconstruction
      val out: Array[Array[Long]] = chAsgn match {
        case 8 => // left/side: right = left - side
          val l = sub(0); val s = sub(1)
          Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 9 => // right/side: left = right + side
          val rch = sub(1); val s = sub(0)
          Array(Array.tabulate(blockSize)(i => rch(i) + s(i)), rch)
        case 10 => // mid/side
          val m = sub(0); val s = sub(1)
          val l = Array.tabulate(blockSize) { i =>
            val mm = (m(i) << 1) | (s(i) & 1L)
            (mm + s(i)) >> 1
          }
          val rr = Array.tabulate(blockSize) { i =>
            val mm = (m(i) << 1) | (s(i) & 1L)
            (mm - s(i)) >> 1
          }
          Array(l, rr)
        case _ => sub.map(identity)
      }
      var c2 = 0
      while (c2 < nch) {
        val arr = out(c2)
        var i = 0
        val take =
          if (total == 0) blockSize
          else math.min(blockSize.toLong, total - chans(c2).length).toInt
        while (i < take) { chans(c2) += arr(i).toInt; i += 1 }
        c2 += 1
      }
    }
    if (total > 0 && chans(0).length != total) return None
    Some(FlacAudio(rate, nch, bps, chans.map(_.toArray)))
  }

  /** One subframe; effective bit depth `ebps` already includes the
    * side channel's extra bit. */
  private def decodeSubframe(r: BitReader, blockSize: Int, ebps: Int)
      : Option[Array[Long]] = {
    if (r.readBit() != 0) return None // padding
    val typ = r.readBits(6).toInt
    val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eff = ebps - wasted
    if (eff <= 0) return None
    val s = new Array[Long](blockSize)
    typ match {
      case 0 => // CONSTANT
        val v = r.readSigned(eff)
        java.util.Arrays.fill(s, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { s(i) = r.readSigned(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order t-8
        val order = t - 8
        if (order > blockSize) return None
        var i = 0
        while (i < order) { s(i) = r.readSigned(eff); i += 1 }
        if (!decodeResidual(r, order, blockSize, s)) return None
        fixedRestore(order, s, blockSize)
      case t if t >= 32 => // LPC order t-31
        val order = t - 31
        if (order > blockSize) return None
        var i = 0
        while (i < order) { s(i) = r.readSigned(eff); i += 1 }
        val precCode = r.readBits(4).toInt
        if (precCode == 15) return None
        val prec = precCode + 1
        val shift = r.readSigned(5).toInt
        if (shift < 0) return None
        val coef = new Array[Long](order)
        var j = 0
        while (j < order) { coef(j) = r.readSigned(prec); j += 1 }
        if (!decodeResidual(r, order, blockSize, s)) return None
        i = order
        while (i < blockSize) {
          var acc = 0L
          j = 0
          while (j < order) { acc += coef(j) * s(i - 1 - j); j += 1 }
          s(i) += (acc >> shift)
          i += 1
        }
      case _ => return None // reserved types
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    Some(s)
  }

  /** Rice-coded residual into s(order until blockSize); true on success. */
  private def decodeResidual(r: BitReader, order: Int, blockSize: Int,
      s: Array[Long]): Boolean = {
    val method = r.readBits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) return false
    var idx = order
    var p = 0
    while (p < parts) {
      val n = (blockSize >> po) - (if (p == 0) order else 0)
      if (n < 0) return false
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < n) { s(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param)
          s(idx) = zigzagDecode(u)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    idx == blockSize
  }

  // -------------------------------------------------------------------
  // Encoder — the fixture lane: fixed-blocksize stream, FIXED or
  // VERBATIM subframes, Rice method 0, deterministic parameter rule.
  // -------------------------------------------------------------------

  /** Deterministic Rice parameter for a residual slice: smallest p with
    * mean zigzag < 2^p (clamped to the non-escape range). */
  private def riceParamFor(resid: Seq[Long]): Int = {
    if (resid.isEmpty) return 0
    val mean = resid.map(v => zigzagEncode(v)).sum / resid.size
    var p = 0
    while (p < 14 && (1L << p) <= mean) p += 1
    p
  }

  /** Encode per-channel PCM to a valid FLAC stream. `order` = FIXED
    * predictor order 0–4 (−1 = VERBATIM subframes); `partOrder` = Rice
    * partition order (blockSize must divide evenly and each partition
    * must hold ≥ the predictor's warmup in its first slot);
    * `midSide` = mid/side decorrelation (2 channels only). */
  def encode(sampleRate: Int, bps: Int, channels: Seq[Seq[Int]],
      blockSize: Int = 192, order: Int = 2, partOrder: Int = 0,
      midSide: Boolean = false): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.size == channels.head.size),
      "channels must be non-empty and equal-length")
    require(order >= -1 && order <= 4, s"order must be -1..4, got $order")
    require(!midSide || channels.size == 2, "midSide needs exactly 2 channels")
    require(blockSize >= 16 && blockSize <= 65536, s"bad blockSize $blockSize")
    require(blockSize % (1 << partOrder) == 0, "partOrder must divide blockSize")
    val nch = channels.size
    val total = channels.head.size.toLong
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val info = new BitWriter
    info.writeBits(blockSize.toLong, 16); info.writeBits(blockSize.toLong, 16)
    info.writeBits(0L, 24); info.writeBits(0L, 24) // frame sizes unknown
    info.writeBits(sampleRate.toLong, 20)
    info.writeBits((nch - 1).toLong, 3)
    info.writeBits((bps - 1).toLong, 5)
    info.writeBits(total, 36)
    (0 until 16).foreach(_ => info.writeBits(0L, 8)) // md5 unknown
    val infoB = info.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(infoB.length) // last|type0
    out.write(infoB)
    var off = 0L
    var frameIdx = 0L
    while (off < total) {
      val n = math.min(blockSize.toLong, total - off).toInt
      val w = new BitWriter
      w.writeBits(0x3ffeL, 14); w.writeBit(0); w.writeBit(0) // sync, res, fixed-bs
      w.writeBits(7L, 4) // block size: 16-bit value follows
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      val chAsgn = if (midSide) 10 else nch - 1
      w.writeBits(chAsgn.toLong, 4)
      val ssCode = bps match {
        case 8 => 1L; case 12 => 2L; case 16 => 4L; case 20 => 5L; case 24 => 6L
        case _ => 0L
      }
      w.writeBits(ssCode, 3); w.writeBit(0)
      // UTF-8-coded frame index (our streams stay in the 1-byte range
      // for < 128 frames, 2-byte up to 2047 — general enough here)
      if (frameIdx < 0x80) w.writeBits(frameIdx, 8)
      else {
        require(frameIdx < 0x800, "encoder caps at 2047 frames")
        w.writeBits(0xc0L | (frameIdx >> 6), 8)
        w.writeBits(0x80L | (frameIdx & 0x3f), 8)
      }
      w.writeBits((n - 1).toLong, 16)
      val headNoCrc = w.toBytes // aligned by construction
      val wf = new BitWriter
      val subChans: Seq[(Array[Long], Int)] =
        if (!midSide) channels.map { ch =>
          (ch.slice(off.toInt, off.toInt + n).map(_.toLong).toArray, bps)
        }
        else {
          val l = channels(0).slice(off.toInt, off.toInt + n).map(_.toLong)
          val rr = channels(1).slice(off.toInt, off.toInt + n).map(_.toLong)
          Seq((l.indices.map(i => (l(i) + rr(i)) >> 1).toArray, bps),
            (l.indices.map(i => l(i) - rr(i)).toArray, bps + 1))
        }
      subChans.foreach { case (s, ebps) =>
        wf.writeBit(0) // padding
        val o = if (order < 0) -1 else math.min(order, n - 1)
        if (o < 0) { // VERBATIM
          wf.writeBits(1L, 6); wf.writeBit(0)
          s.foreach(v => wf.writeBits(v & ((1L << ebps) - 1), ebps))
        } else { // FIXED order o
          wf.writeBits((8 + o).toLong, 6); wf.writeBit(0)
          var i = 0
          while (i < o) { wf.writeBits(s(i) & ((1L << ebps) - 1), ebps); i += 1 }
          val resid = (o until n).map(i => fixedResidual(o, s, i))
          wf.writeBits(0L, 2) // Rice method 0
          wf.writeBits(partOrder.toLong, 4)
          val parts = 1 << partOrder
          var p = 0
          var ri = 0
          while (p < parts) {
            val pn = (n >> partOrder) - (if (p == 0) o else 0)
            require(pn >= 0, "first partition smaller than predictor order")
            val slice = resid.slice(ri, ri + pn)
            val param = riceParamFor(slice)
            wf.writeBits(param.toLong, 4)
            slice.foreach { v =>
              val u = zigzagEncode(v)
              wf.writeUnary((u >>> param).toInt)
              wf.writeBits(u & ((1L << param) - 1), param)
            }
            ri += pn
            p += 1
          }
        }
      }
      wf.align()
      val body = wf.toBytes
      val frame = new Array[Byte](headNoCrc.length + 1 + body.length)
      System.arraycopy(headNoCrc, 0, frame, 0, headNoCrc.length)
      frame(headNoCrc.length) = crc8(headNoCrc, 0, headNoCrc.length).toByte
      System.arraycopy(body, 0, frame, headNoCrc.length + 1, body.length)
      out.write(frame)
      val c16 = crc16(frame, 0, frame.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }
}
