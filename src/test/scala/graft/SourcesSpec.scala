package graft

import graft.functions.{Kvp, KvpField, KvpPrefixSampler, Sentences}
import graft.core.RecordChunk
import graft.operators.{Decoration, Multimodal}
import graft.sources.{DateHelpers, HfSourceList}
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {

  // ---- sentence splitter (reference: src/utils.rs:37-121) ----

  test("sentences: basic boundaries on .!? with trailing text") {
    assert(Sentences.sentences("One. Two! Three? Four") ==
      Seq("One.", "Two!", "Three?", "Four"))
  }

  test("sentences: decimal, ticker, and ellipsis guards") {
    assert(Sentences.sentences("Pi is 3.14 exactly.") == Seq("Pi is 3.14 exactly."))
    assert(Sentences.sentences("Buy BRK.A now.") == Seq("Buy BRK.A now."))
    // ellipsis guard prevents breaks inside the run; the final dot still
    // terminates (reference: is_dot_boundary, src/utils.rs:96-103)
    assert(Sentences.sentences("Wait... done.") == Seq("Wait...", "done."))
  }

  test("sentences: paragraph blocks split on blank lines, whitespace normalized") {
    assert(Sentences.sentences("First   para\n\nSecond  para") ==
      Seq("First para", "Second para"))
  }

  // ---- date helpers (reference: date_helpers.rs:6-95) ----

  test("folder dates: MM-DD-YYYY, YYYY-MM-DD, underscores") {
    assert(DateHelpers.parseFolderDate("02-14-2026").get.toString == "2026-02-14")
    assert(DateHelpers.parseFolderDate("2026-02-14").get.toString == "2026-02-14")
    assert(DateHelpers.parseFolderDate("02_14_2026").get.toString == "2026-02-14")
    assert(DateHelpers.parseFolderDate("nonsense").isEmpty)
  }

  test("year folder + MM-DD with --SUFFIX stripping") {
    assert(DateHelpers.parseYearFolderDate("2026", "02-14").get.toString == "2026-02-14")
    assert(DateHelpers.parseYearFolderDate("2026", "04-14-2025--INCOMPLETE").get.toString == "2025-04-14")
    assert(DateHelpers.parseYearFolderDate("notyear", "02-14").isEmpty)
  }

  test("date meta values: six US renderings, sorted, deduped") {
    val vals = DateHelpers.dateMetaValues(java.time.LocalDate.of(2024, 10, 15))
    assert(vals.contains("2024-10-15"))
    assert(vals.contains("Oct. 15, 2024"))
    assert(vals.contains("October 15, 2024"))
    assert(vals.contains("15.10.2024"))
    assert(vals.contains("10/15/2024"))
    assert(vals.contains("Oct 15, 2024"))
    assert(vals == vals.sorted && vals.size == 6)
  }

  test("month-range folder uses last month token, day 1") {
    assert(DateHelpers.parseMonthRangeFolder("2026", "Jan + Feb 2026").get.toString == "2026-02-01")
    assert(DateHelpers.parseMonthRangeFolder("2026", "Dec 2025 + Jan 2026").get.toString == "2026-01-01")
  }

  // ---- HF source-list parser (reference: huggingface_source.rs:231-417) ----

  test("hf line: full form parses") {
    val e = HfSourceList.parseLine(
      "hf://zeitgeist-ai/financial-rag-nvidia-sec/default/train anchor=question positive=answer context=context")
      .toOption.flatten.get
    assert(e.dataset == "zeitgeist-ai/financial-rag-nvidia-sec")
    assert(e.config == "default" && e.split == "train")
    assert(e.anchorColumns == Seq("question") && e.contextColumns == Seq("context"))
  }

  test("hf line: defaults, multi-column text, trust, source_id") {
    val e = HfSourceList.parseLine(
      "hf://labofsahil/hackernews-vector-search-dataset/default text=title,text trust=0.7 source_id=hn")
      .toOption.flatten.get
    assert(e.split == "train" && e.textColumns == Seq("title", "text"))
    assert(e.trust.contains(0.7f) && e.resolvedSourceId == "hn")
  }

  test("hf line: comments/blank skipped; unknown keys, bad trust, no mapping are hard errors") {
    assert(HfSourceList.parseLine("# comment") == Right(None))
    assert(HfSourceList.parseLine("   ") == Right(None))
    assert(HfSourceList.parseLine("hf://a/b anchor=x bogus=1").isLeft)
    assert(HfSourceList.parseLine("hf://a/b anchor=x trust=1.5").isLeft)
    assert(HfSourceList.parseLine("hf://a/b").isLeft)
    assert(HfSourceList.parseLine("s3://a/b anchor=x").isLeft)
  }

  test("hf ClassLabel codes resolve to names, unknown codes pass through") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, 0), (1L, 1), (2L, 7)).toDF("id", "label")
    val out = HfSourceList.resolveClassLabels(df, "label", Seq("negative", "positive"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "negative", 1L -> "positive", 2L -> "7"))
  }

  // ---- KVP prefix sampler (reference: src/kvp.rs) ----

  private val sampler = KvpPrefixSampler(1.0f, Seq(
    Seq(KvpField("source", Seq("alpha", "beta")), KvpField("year", Seq("2025"))),
    Seq(KvpField("topic", Seq("ml")))))

  test("kvp: deterministic per stream key, varies across keys") {
    val a = sampler.sample("rec1:0")
    assert(a == sampler.sample("rec1:0"))
    val distinct = (0 until 50).map(d => sampler.sample(s"rec1:$d")).distinct
    assert(distinct.size > 1)
  }

  test("kvp: format is 'meta: k=v | k2=v2'; zero dropout yields None") {
    val s = sampler.sample("rec9:3").get
    assert(s.startsWith("meta: "))
    assert(s.split('|').forall(_.contains("=")))
    assert(KvpPrefixSampler(0f, sampler.variants).sample("x:0").isEmpty)
    assert(KvpPrefixSampler(1f, Nil).sample("x:0").isEmpty)
  }

  test("kvp: dropout rate approximately honored") {
    val half = KvpPrefixSampler(0.5f, sampler.variants)
    val hits = (0 until 1000).count(d => half.sample(s"r:$d").nonEmpty)
    assert(hits > 380 && hits < 620, s"got $hits/1000")
  }

  test("kvp: allMetadata collects everything without rolls") {
    val meta = sampler.allMetadata
    assert(meta("source") == Seq("alpha", "beta"))
    assert(meta("topic") == Seq("ml"))
  }

  test("kvp: blank/duplicate values dropped; empty fields removed") {
    val f = KvpField("k", Seq("", "a", "a", "b")).normalized
    assert(f.values == Seq("a", "b"))
    assert(KvpPrefixSampler(1f, Seq(Seq(KvpField("k", Nil)))).normalized.variants.isEmpty)
  }

  // ---- decoration (reference: src/sampler/mod.rs:1470-1508) ----

  private def chunk(text: String) = RecordChunk("r1", "src", 0, "context",
    "window", 0, 0, 32, 0f, text, text.split(" ").length, 1f)

  test("decoration: prefix prepended with newline; budget trims body, prefix wins") {
    val always = KvpPrefixSampler(1f, Seq(Seq(KvpField("k", Seq("v")))))
    val d = Decoration.decorate(chunk("a b c d e f"), Some(always), 0, maxWindowTokens = 4)
    // prefix "meta: k=v" = 2 tokens -> body budget 2
    assert(d.text == "meta: k=v\na b")
    assert(d.tokens_estimate == 4)
    val none = Decoration.decorate(chunk("a b c"), None, 0, 4)
    assert(none.text == "a b c")
  }

  test("decoration column twin matches the driver-pure roll sequence") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val half = KvpPrefixSampler(0.5f, Seq(
      Seq(KvpField("lang", Seq("en", "de", "fr")), KvpField("src", Seq("web", "book"))),
      Seq(KvpField("year", Seq("2023", "2024")))))
    val maxTok = 12
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho",
      "one two three", "solo", "a b c d e f g h i j k l m n")
    val rows = for (t <- texts; d <- 0L until 8L) yield (t, d)
    val df = rows.toDF("text", "draw")
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
    val dec = Decoration.decorateColumn(half,
      concat(col("text"), lit(":"), col("draw").cast("string")), col("toks"), maxTok)
    val got = df.select(col("text"), col("draw"), dec("text").as("dtext"), dec("est"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    for ((t, d) <- rows) {
      val c = chunk(t)
      val exp = Decoration.decorate(c.copy(record_id = t), Some(half), d, maxTok)
      assert(got((t, d)) == (exp.text, exp.tokens_estimate.toLong),
        s"mismatch for ($t, $d)")
    }
  }

  test("date meta values column twin matches the pure renderings (300 random dates)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dates = (Seq("2024-10-15", "2024-01-01", "2024-12-31", "2024-02-09") ++
      Seq.fill(300)(java.time.LocalDate.ofEpochDay(rnd.between(-25000L, 50000L)).toString)).distinct
    val got = dates.toDF("ds")
      .select(col("ds"), DateHelpers.dateMetaValuesColumn(to_date(col("ds"))).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (ds <- dates)
      assert(got(ds) == DateHelpers.dateMetaValues(java.time.LocalDate.parse(ds)), ds)
  }

  test("decoration column twin: dropout=1 branch (no dropout roll, counter base shifts)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val always = KvpPrefixSampler(1.0f, Seq(
      Seq(KvpField("k", Seq("v1", "v2", "v3"))),
      Seq(KvpField("a", Seq("x")), KvpField("b", Seq("y", "z")))))
    val rows = for (d <- 0L until 32L) yield ("w1 w2 w3 w4 w5 w6 w7 w8", d)
    val df = rows.toDF("text", "draw")
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
    val dec = Decoration.decorateColumn(always,
      concat(lit("r:"), col("draw").cast("string")), col("toks"), 6)
    val got = df.select(col("draw"), dec("text").as("t"), dec("est").as("e"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    for (d <- 0L until 32L) {
      val exp = Decoration.decorate(chunk("w1 w2 w3 w4 w5 w6 w7 w8").copy(record_id = "r"),
        Some(always), d, 6)
      assert(got(d) == (exp.text, exp.tokens_estimate.toLong), s"draw $d")
    }
  }

  test("sentence splitter column form matches the pure scanner") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      "Plain one. Plain two! Three?",
      "pi is 3.14 here. A.B ticker.  Spaced",
      "ellipsis wow.. more.. end.",
      "block one.\n\nblock two! with more.\n\n\nthird",
      "?! leading",
      "no terminator at all",
      "A. B. 1.2.3 X.Y.Z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Sentences.sentenceRows(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val exp = Sentences.sentences(t)
      val gotSeq = (0 until exp.size).map(j => got.get((i.toLong, j.toLong)))
      assert(gotSeq.flatten == exp, s"doc $i: $t")
      assert(!got.contains((i.toLong, exp.size.toLong)), s"doc $i extra sentences")
    }
  }

  test("sentence splitter column form matches the pure scanner on 150 fuzzed texts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val alphabet = "abXY Z019.?!. \n\t.".toCharArray
    val texts = Seq.tabulate(150) { _ =>
      val n = rnd.between(0, 60)
      String.valueOf(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
    }.filter(t => Sentences.sentences(t).nonEmpty).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Sentences.sentenceRows(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    for ((t, i) <- texts.zipWithIndex)
      assert(got.getOrElse(i.toLong, Nil) == Sentences.sentences(t), s"doc $i: ${t.replace("\n", "\\n")}")
  }

  // ---- multimodal stubs ----

  test("multimodal: fake decoder computes byte stats deterministically") {
    val row = Multimodal.MediaRow(7L, "application/octet-stream", "abc".getBytes, 320, 240)
    val f = Multimodal.fakeDecode(Iterator(row)).next()
    assert(f.n_bytes == 3 && f.byte_sum == 'a' + 'b' + 'c' && f.head_byte == 'a')
    assert(f.aspect_e3 == 1333L)
    assert(Multimodal.frameOffsets(1, 100, 4) == Seq(0L, 25L, 50L, 75L))
    assert(Multimodal.frameOffsets(1, 0, 4).isEmpty)
  }

  // ---- real codecs for uncompressed containers ----

  /** 16-byte-per-sample synthesizers for the three containers
    * [[graft.operators.MediaCodecs]] actually parses. */
  private object Synth {
    def le16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Seq[Byte] =
      Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)

    /** Canonical 44-byte-header PCM WAV. */
    def wav(channels: Int, rate: Int, bits: Int, samples: Seq[Int]): Array[Byte] = {
      val bytesPer = bits / 8
      val data = samples.flatMap(s => if (bits == 8) Seq(s.toByte) else le16(s))
      val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
        le32(rate * channels * bytesPer) ++ le16(channels * bytesPer) ++ le16(bits)
      val body = "fmt ".getBytes.toSeq ++ le32(16) ++ fmt ++
        "data".getBytes.toSeq ++ le32(data.length) ++ data
      ("RIFF".getBytes.toSeq ++ le32(4 + body.length) ++ "WAVE".getBytes.toSeq ++ body).toArray
    }

    def ppm(w: Int, h: Int, px: Seq[(Int, Int, Int)], comment: Boolean = false): Array[Byte] = {
      val hdr = s"P6${if (comment) "\n# synthetic fixture" else ""}\n$w $h\n255\n"
      (hdr.getBytes.toSeq ++ px.flatMap { case (r, g, b) =>
        Seq(r.toByte, g.toByte, b.toByte) }).toArray
    }

    /** 24-bit BI_RGB BMP; rows bottom-up, padded to 4 bytes. */
    def bmp(w: Int, h: Int, px: Seq[(Int, Int, Int)], topDown: Boolean = false): Array[Byte] = {
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val rows = px.grouped(w).toSeq
      val ordered = if (topDown) rows else rows.reverse // file stores bottom row first
      val pix = ordered.flatMap { row =>
        row.flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) } ++
          Seq.fill(rowBytes - 3 * w)(0.toByte)
      }
      ("BM".getBytes.toSeq ++ le32(54 + pix.length) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(pix.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
        pix).toArray
    }
  }

  test("wav decoder: PCM 16-bit and 8-bit, chunk walk, duration and exact RMS") {
    import graft.operators.MediaCodecs
    // 16-bit mono square wave at full ±1000: RMS = 1000 exactly
    val w16 = Synth.wav(1, 8000, 16, Seq.fill(8)(Seq(1000, -1000)).flatten)
    val d16 = MediaCodecs.decode(w16).get
    assert(d16.kind == "wav" && d16.channels == 1 && d16.sampleRate == 8000)
    assert(d16.nSamples == 16 && d16.durationMs == 2L)
    assert(d16.rmsE3 == math.floor(1000.0 * 1000.0 / 32767.0).toLong)
    // 8-bit stereo: unsigned samples, centered at 128; ±100 square → RMS 100
    val w8 = Synth.wav(2, 11025, 8, Seq.fill(6)(Seq(228, 28)).flatten)
    val d8 = MediaCodecs.decode(w8).get
    assert(d8.kind == "wav" && d8.channels == 2 && d8.sampleRate == 11025)
    assert(d8.nSamples == 6 && d8.durationMs == 0L)
    assert(d8.rmsE3 == math.floor(1000.0 * 100.0 / 127.0).toLong)
    // non-PCM (format 3 = float) and truncated data refuse, not throw
    val nonPcm = w16.clone(); nonPcm(20) = 3
    assert(MediaCodecs.decode(nonPcm).isEmpty)
    assert(MediaCodecs.decode(w16.take(50)).isEmpty)
  }

  test("ppm decoder: header comments, exact channel means, truncation refused") {
    import graft.operators.MediaCodecs
    val px = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30))
    val d = MediaCodecs.decode(Synth.ppm(2, 2, px, comment = true)).get
    assert(d.kind == "ppm" && d.width == 2 && d.height == 2 && d.channels == 3)
    // floor((255+0+0+10)/4), floor((0+255+0+20)/4), floor((0+0+255+30)/4)
    assert((d.meanR, d.meanG, d.meanB) == (66, 68, 71))
    assert(MediaCodecs.decode(Synth.ppm(2, 2, px).dropRight(1)).isEmpty)
    assert(MediaCodecs.decode("P6\n0 2\n255\n".getBytes).isEmpty)
  }

  test("bmp decoder: bottom-up and top-down, row padding, wrong-bpp refused") {
    import graft.operators.MediaCodecs
    // 3×2: padding = 3 bytes per row; means must ignore the pad bytes
    val px = Seq((9, 18, 27), (36, 45, 54), (63, 72, 81),
      (90, 99, 108), (117, 126, 135), (144, 153, 162))
    for (topDown <- Seq(false, true)) {
      val d = MediaCodecs.decode(Synth.bmp(3, 2, px, topDown)).get
      assert(d.kind == "bmp" && d.width == 3 && d.height == 2 && d.channels == 3)
      assert((d.meanR, d.meanG, d.meanB) == (76, 85, 94), s"topDown=$topDown")
    }
    val wrongBpp = Synth.bmp(3, 2, px).clone(); wrongBpp(28) = 32
    assert(graft.operators.MediaCodecs.decode(wrongBpp).isEmpty)
    assert(MediaCodecs.decode(Synth.bmp(3, 2, px).take(53)).isEmpty)
  }

  test("jpeg decoder: ImageIO round-trip drift stays inside the /8 oracle buckets") {
    import graft.operators.MediaCodecs
    // solid colors ≡ 4 (mod 8): lossy drift (DC quantization + YCbCr
    // rounding) must stay within ±3 so mean/8 buckets are deterministic —
    // the contract the q19 oracle pins. Sweep the whole bucket domain.
    var maxDrift = 0
    for (k <- 0 until 28) {
      val (r, g, b) = (k * 8 + 4, ((k * 7) % 28) * 8 + 4, ((k * 11) % 28) * 8 + 4)
      val d = MediaCodecs.decode(MediaCodecs.encodeJpegSolid(16, 8, r, g, b)).get
      assert(d.kind == "jpeg" && d.width == 16 && d.height == 8 && d.channels == 3)
      val drift = Seq(d.meanR - r, d.meanG - g, d.meanB - b).map(math.abs).max
      maxDrift = math.max(maxDrift, drift)
      assert(drift <= 3, s"k=$k rgb=($r,$g,$b) got=(${d.meanR},${d.meanG},${d.meanB})")
      assert((d.meanR / 8, d.meanG / 8, d.meanB / 8) == (r / 8, g / 8, b / 8),
        s"bucket drift at k=$k")
    }
    info(s"max channel drift across 28 buckets: $maxDrift")
    // corrupt payloads refuse, never throw: truncated stream + magic-only
    val ok = MediaCodecs.encodeJpegSolid(16, 8, 100, 100, 100)
    assert(MediaCodecs.decode(ok.take(20)).isEmpty)
    assert(MediaCodecs.decode(Array(0xff, 0xd8, 0xff, 0x00).map(_.toByte)).isEmpty)
  }

  test("png decoder: all five scanline filters round-trip to identical means") {
    import graft.operators.MediaCodecs
    // deterministic pixel ramp with enough structure that a filter bug
    // (wrong predictor, wrong prior row) shifts at least one channel mean
    val w = 5; val h = 4
    val px = (0 until w * h * 3).map(i => (i * 37 + (i * i) % 91) % 256)
    val expected = {
      val npx = w * h
      def mean(c: Int) = (0 until npx).map(p => px(3 * p + c)).sum / npx
      (mean(0), mean(1), mean(2))
    }
    for (f <- 0 to 4) {
      val d = MediaCodecs.decode(MediaCodecs.encodePng(w, h, px, filterType = f)).get
      assert(d.kind == "png" && d.width == w && d.height == h && d.channels == 3,
        s"filter=$f")
      assert((d.meanR, d.meanG, d.meanB) == expected, s"filter=$f")
    }
  }

  test("png decoder: gray, gray+alpha and RGBA channel handling; corruption refused") {
    import graft.operators.MediaCodecs
    val gray = Seq(10, 20, 30, 40, 50, 60)
    val d = MediaCodecs.decode(MediaCodecs.encodePng(3, 2, gray, colorType = 0,
      filterType = 4)).get
    assert(d.kind == "png" && d.channels == 1)
    assert((d.meanR, d.meanG, d.meanB) == (35, 35, 35))
    // gray+alpha: means ignore the alpha bytes (all 255 here)
    val ga = gray.flatMap(v => Seq(v, 255))
    val dga = MediaCodecs.decode(MediaCodecs.encodePng(3, 2, ga, colorType = 4,
      filterType = 3)).get
    assert(dga.channels == 2 && (dga.meanR, dga.meanG, dga.meanB) == (35, 35, 35))
    // RGBA: same RGB means as the RGB encoding of the same pixels
    val rgb = Seq(200, 100, 50, 40, 80, 120, 0, 255, 30, 90, 60, 10, 5, 15, 25, 35, 45, 55)
    val rgba = rgb.grouped(3).flatMap(p => p :+ 128).toSeq
    val dRgb = MediaCodecs.decode(MediaCodecs.encodePng(3, 2, rgb, colorType = 2,
      filterType = 1)).get
    val dRgba = MediaCodecs.decode(MediaCodecs.encodePng(3, 2, rgba, colorType = 6,
      filterType = 2)).get
    assert(dRgba.channels == 4)
    assert((dRgba.meanR, dRgba.meanG, dRgba.meanB) == (dRgb.meanR, dRgb.meanG, dRgb.meanB))
    val good = MediaCodecs.encodePng(3, 2, gray, colorType = 0)
    // truncated IDAT: chop the file mid-chunk
    assert(MediaCodecs.decode(good.take(good.length - 15)).isEmpty)
    // corrupt the zlib stream body (first IDAT data byte after len+type)
    val bad = good.clone()
    bad(8 + 25 + 8) = (bad(8 + 25 + 8) ^ 0x55).toByte
    assert(MediaCodecs.decode(bad).isEmpty || MediaCodecs.decode(bad).get.kind == "png")
    // 16-bit depth and interlace flags refuse
    val deep = good.clone(); deep(8 + 8 + 8) = 16
    assert(MediaCodecs.decode(deep).isEmpty)
    val ilace = good.clone(); ilace(8 + 8 + 12) = 1
    assert(MediaCodecs.decode(ilace).isEmpty)
  }

  test("png gray-grid downsample + dHash: block sums exact, halves law, refusals") {
    import graft.operators.MediaCodecs
    val w = 18; val h = 16
    val px = (0 until w * h * 3).map(i => (i * 53 + (i * i) % 77) % 256)
    for (f <- 0 to 4) {
      val grid = MediaCodecs.decodePngGrayGrid(
        MediaCodecs.encodePng(w, h, px, filterType = f), 9, 8).get
      // block (gx, gy) sums r+g+b over its 2x2 pixels — recompute directly
      val expect = Array.tabulate(72) { blk =>
        val gy = blk / 9; val gx = blk % 9
        (for { dy <- 0 until 2; dx <- 0 until 2 } yield {
          val p = (gy * 2 + dy) * w + (gx * 2 + dx)
          (px(3 * p) + px(3 * p + 1) + px(3 * p + 2)).toLong
        }).sum
      }
      assert(grid.toSeq == expect.toSeq, s"filter=$f")
    }
    // dHash halves never touch the sign bit; identical grids match;
    // a single block bump flips a bounded number of bits
    val g1 = MediaCodecs.decodePngGrayGrid(MediaCodecs.encodePng(w, h, px), 9, 8).get
    val (hi1, lo1) = MediaCodecs.dHashHalves(g1, 9, 8)
    assert(hi1 >= 0 && lo1 >= 0 && hi1 < (1L << 32) && lo1 < (1L << 32))
    val g2 = g1.clone(); g2(40) += 1000
    val (hi2, lo2) = MediaCodecs.dHashHalves(g2, 9, 8)
    val ham = java.lang.Long.bitCount(hi1 ^ hi2) + java.lang.Long.bitCount(lo1 ^ lo2)
    assert(ham >= 0 && ham <= 2) // one block touches two comparisons
    // non-divisible dims refuse rather than guess a resample
    assert(MediaCodecs.decodePngGrayGrid(
      MediaCodecs.encodePng(10, 8, (0 until 240).map(_ % 256)), 9, 8).isEmpty)
  }

  test("media codecs never throw: fuzzed random buffers and mutated valid files") {
    import graft.operators.MediaCodecs
    // the 100 TB contract: one corrupt payload must degrade, never kill a
    // scan. Deterministic fuzz — random buffers, then random single-byte
    // mutations and truncations of VALID files (far more likely to reach
    // deep parser states than pure noise).
    val rnd = new scala.util.Random(0x9e3779b9L)
    val magics = Seq("RIFF".getBytes, "P6\n".getBytes, "BM".getBytes,
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    for (_ <- 0 until 400) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      // half the time, graft a real magic onto the noise
      if (rnd.nextBoolean() && b.nonEmpty) {
        val m = magics(rnd.nextInt(magics.length))
        System.arraycopy(m, 0, b, 0, math.min(m.length, b.length))
      }
      MediaCodecs.decode(b) // must not throw; result value irrelevant
    }
    val valids = Seq(
      Synth.wav(2, 8000, 16, (0 until 32).map(i => i * 100 - 1600)),
      Synth.ppm(4, 3, (0 until 12).map(i => (i, 2 * i, 3 * i))),
      Synth.bmp(3, 3, (0 until 9).map(i => (i * 7, i * 11, i * 13))),
      MediaCodecs.encodePng(4, 4, (0 until 48).map(i => (i * 5) % 256), filterType = 4))
    for (v <- valids; _ <- 0 until 150) {
      val b = v.clone()
      rnd.nextInt(3) match {
        case 0 => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        case 1 => MediaCodecs.decode(b.take(rnd.nextInt(b.length))); ()
        case 2 => // flip several length/header-region bytes
          for (_ <- 0 to rnd.nextInt(4))
            b(rnd.nextInt(math.min(60, b.length))) = rnd.nextInt(256).toByte
      }
      MediaCodecs.decode(b)
    }
    // adversarial chunk sizes near Int.MaxValue: the bounds check
    // `pos + 8 + size > length` must not wrap negative and admit an
    // out-of-range read (ADVICE r7) — both WAV chunk walk and PNG chunk walk
    val wav = Synth.wav(1, 8000, 16, Seq(1, 2, 3, 4))
    for (huge <- Seq(Int.MaxValue - 4, Int.MaxValue - 16, 0x7ffffff0)) {
      val b = wav.clone()
      // overwrite the fmt chunk's declared size (offset 16, LE32)
      b(16) = (huge & 0xff).toByte; b(17) = ((huge >> 8) & 0xff).toByte
      b(18) = ((huge >> 16) & 0xff).toByte; b(19) = ((huge >> 24) & 0xff).toByte
      assert(MediaCodecs.decode(b).isEmpty)
    }
    val png = MediaCodecs.encodePng(2, 2, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    for (huge <- Seq(Int.MaxValue - 8, Int.MaxValue - 16, 0x7ffffff0)) {
      val b = png.clone()
      // overwrite the IHDR chunk's declared length (offset 8, BE32)
      b(8) = ((huge >> 24) & 0xff).toByte; b(9) = ((huge >> 16) & 0xff).toByte
      b(10) = ((huge >> 8) & 0xff).toByte; b(11) = (huge & 0xff).toByte
      assert(MediaCodecs.decode(b).isEmpty)
    }
  }

  test("gif decoder: encoder round-trip exact means; ImageIO reads the same pixels") {
    import graft.operators.MediaCodecs
    val rng = new scala.util.Random(1)
    for (trial <- 1 to 12) {
      val w = 1 + rng.nextInt(40); val h = 1 + rng.nextInt(30)
      val np = 2 + rng.nextInt(200)
      val pal = Seq.fill(np)((rng.nextInt(256), rng.nextInt(256), rng.nextInt(256)))
      val idx = Seq.fill(w * h)(rng.nextInt(np))
      val gif = MediaCodecs.encodeGif(w, h, pal, idx)
      val d = MediaCodecs.decode(gif).get
      val n = (w * h).toLong
      assert(d.kind == "gif" && d.width == w && d.height == h && d.channels == 3)
      assert(d.meanR == idx.map(pal(_)._1.toLong).sum / n &&
        d.meanG == idx.map(pal(_)._2.toLong).sum / n &&
        d.meanB == idx.map(pal(_)._3.toLong).sum / n, s"trial $trial")
      // the hand-rolled GIF must be spec-valid for OTHER decoders too:
      // ImageIO reproduces every pixel
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val (er, eg, eb) = pal(idx(y * w + x))
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ((er, eg, eb)),
          s"pixel ($x,$y) trial $trial")
      }
    }
  }

  test("gif decoder: real compressed LZW (ImageIO-written, table growth + width bumps)") {
    import graft.operators.MediaCodecs
    val rng = new scala.util.Random(2)
    for (trial <- 1 to 12) {
      val w = 5 + rng.nextInt(60); val h = 5 + rng.nextInt(40)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // ≤16 distinct colors with runs → ImageIO's GIF write is lossless
      // AND its LZW genuinely grows the code table
      val pal = Seq.fill(16)((rng.nextInt(256), rng.nextInt(256), rng.nextInt(256)))
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pal(if (rng.nextInt(4) == 0) rng.nextInt(16) else (x / 7) % 16)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val gif = bos.toByteArray
      val mine = MediaCodecs.decode(gif).get
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = back.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val n = (w * h).toLong
      assert(mine.kind == "gif" && mine.width == w && mine.height == h, s"trial $trial")
      assert((mine.meanR, mine.meanG, mine.meanB) == ((sr / n, sg / n, sb / n)),
        s"LZW means trial $trial")
    }
  }

  test("mp3 frame walk: duration/samples/channels/kbps from the header lattice") {
    import graft.operators.MediaCodecs
    for ((nf, br, rate, st) <- Seq((50, 128, 44100, true), (7, 320, 48000, false),
        (120, 32, 32000, true))) {
      val d = MediaCodecs.decode(MediaCodecs.encodeMp3Frames(nf, br, rate, st)).get
      assert(d.kind == "mp3" && d.sampleRate == rate && d.nSamples == nf * 1152L)
      assert(d.durationMs == nf * 1152L * 1000 / rate)
      assert(d.channels == (if (st) 2 else 1) && d.rmsE3 == br)
    }
    // ID3v2 tag (syncsafe length) skipped before the first frame
    val core = MediaCodecs.encodeMp3Frames(10, 192, 44100, stereo = true)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++ Array.fill(20)(7.toByte)
    assert(MediaCodecs.decode(id3 ++ core).get.nSamples == 10 * 1152L)
    // real-world tails tolerated: < one header of junk, and the ID3v1 trailer
    assert(MediaCodecs.decodeMp3Meta(core ++ Array[Byte](1, 2, 3)).get.nSamples == 10 * 1152L)
    val id3v1 = "TAG".getBytes("US-ASCII") ++ Array.fill(125)(0x20.toByte)
    assert(MediaCodecs.decodeMp3Meta(core ++ id3v1).get.nSamples == 10 * 1152L)
    // malformed refuses: a corrupted SECOND frame header (frame length at
    // 192 kbps / 44100 = 626 bytes), and a truncated final frame
    val frameLen = 144 * 192 * 1000 / 44100
    val bad = core.clone(); bad(frameLen) = 0x00
    assert(MediaCodecs.decodeMp3Meta(bad).isEmpty)
    assert(MediaCodecs.decodeMp3Meta(core.dropRight(7)).isEmpty)
  }

  test("mp4 box walk: mvhd/tkhd/hdlr fields, v1 boxes, largesize, malformation refusal") {
    import graft.operators.MediaCodecs
    import graft.operators.MediaCodecs.Mp4Track
    val tracks = Seq(Mp4Track(1L, "vide", 640, 360), Mp4Track(2L, "soun", 0, 0))
    val b = MediaCodecs.encodeMp4Meta(90000L, 450000L, tracks)
    assert(MediaCodecs.sniff(b) == "mp4")
    val m = MediaCodecs.decodeMp4Meta(b).get
    assert(m.timescale == 90000L && m.duration == 450000L && m.durationMs == 5000L)
    assert(m.tracks == tracks)
    val d = MediaCodecs.decode(b).get
    assert(d.kind == "mp4" && d.width == 640 && d.height == 360 &&
      d.channels == 2 && d.durationMs == 5000L && d.sampleRate == 90000)
    // hand-built VERSION-1 mvhd + tkhd (64-bit times) parse identically
    def be32b(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(t: String, p: Array[Byte]) = {
      val sz = 8 + p.length
      be32b(sz.toLong) ++ t.getBytes("US-ASCII") ++ p
    }
    val mat = be32b(0x10000L) ++ be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(0x10000L) ++
      be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(0x40000000L)
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32b(1000L) ++ be32b(0) ++ be32b(7321L) ++ be32b(0x10000L) ++
      Array(1.toByte, 0.toByte) ++ new Array[Byte](10) ++ mat ++ new Array[Byte](24) ++ be32b(2L))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32b(9L) ++ be32b(0) ++ be32b(0) ++ be32b(7321L) ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ mat ++ be32b(1280L << 16) ++ be32b(720L << 16))
    val hdlr = box("hdlr", new Array[Byte](8) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val v1 = box("ftyp", "isom".getBytes("US-ASCII")) ++
      box("moov", mvhd1 ++ box("trak", tkhd1 ++ box("mdia", hdlr)))
    val m1 = MediaCodecs.decodeMp4Meta(v1).get
    assert(m1.timescale == 1000L && m1.duration == 7321L && m1.durationMs == 7321L)
    assert(m1.tracks == Seq(Mp4Track(9L, "vide", 1280, 720)))
    // 64-bit largesize framing on the moov box parses too
    val moovPayload = mvhd1
    val largeMoov = be32b(1L) ++ "moov".getBytes("US-ASCII") ++
      Array.fill(8)(0.toByte).patch(0, be32b((16 + moovPayload.length).toLong >> 32) ++
        be32b((16 + moovPayload.length).toLong & 0xffffffffL), 8) ++ moovPayload
    val mLarge = MediaCodecs.decodeMp4Meta(
      box("ftyp", "isom".getBytes("US-ASCII")) ++ largeMoov)
    assert(mLarge.exists(_.duration == 7321L))
    // malformed refuses: truncated box, size smaller than header, no moov
    assert(MediaCodecs.decodeMp4Meta(b.dropRight(5)).isEmpty)
    val badSz = b.clone(); badSz(b.length - 4) = 0x7f.toByte
    MediaCodecs.decodeMp4Meta(badSz) // must not throw
    assert(MediaCodecs.decodeMp4Meta(box("ftyp", "isom".getBytes("US-ASCII"))).isEmpty)
    // never-throw fuzz: mutations and truncations
    val rnd = new java.util.Random(0x4d50)
    for (_ <- 0 until 300) {
      val x = b.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decode(x)
    }
    for (cut <- 0 until b.length) MediaCodecs.decode(b.take(cut))
  }

  test("mp4 sample tables: stts/stsc/stsz/stco walk, closed-form offsets, refusal, fuzz") {
    import graft.operators.MediaCodecs
    // 7 samples, two stts runs (3×100, 4×40), spc=3 → chunks [3,3,1]
    val sizes = Seq(10, 20, 30, 40, 50, 60, 70)
    val b = MediaCodecs.encodeMp4Samples(90000L, 1L, Seq((3, 100), (4, 40)), sizes, 3)
    val sm = MediaCodecs.decodeMp4Samples(b).get
    assert(sm.size == 7 && sm.forall(_.trackId == 1L))
    assert(sm.map(_.size) == sizes.map(_.toLong))
    assert(sm.map(_.dts) == Seq(0L, 100L, 200L, 300L, 340L, 380L, 420L))
    assert(sm.map(_.chunkIdx) == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L))
    // offsets: contiguous chunks → absolute offset = base + prefix sum;
    // base must equal the q146 oracle's closed form 401 + 4·ns + 4·nchunks
    val base = sm.head.offset
    val prefix = sizes.scanLeft(0L)(_ + _).dropRight(1)
    assert(sm.map(_.offset) == prefix.map(base + _))
    assert(base == 401L + 4 * sizes.size + 4 * 3, s"base=$base")
    // the mdat really starts there: 'mdat' fourcc sits 8 bytes before
    assert(new String(b.slice(base.toInt - 4, base.toInt), "US-ASCII") == "mdat")
    // uniform spc=2, single run
    val b2 = MediaCodecs.encodeMp4Samples(1000L, 3L, Seq((4, 25)), Seq(5, 5, 5, 5), 2)
    val sm2 = MediaCodecs.decodeMp4Samples(b2).get
    assert(sm2.map(_.dts) == Seq(0L, 25L, 50L, 75L) &&
      sm2.map(_.chunkIdx) == Seq(0L, 0L, 1L, 1L))
    assert(sm2.head.offset == 401L + 4 * 4 + 4 * 2 - 8) // one stts run fewer
    // co64 (64-bit chunk offsets) walks identically: rebuild the fixture
    // with the stco payload re-framed as co64 (same entries, 8-byte)
    locally {
      def be32b(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      def be64b(v: Long) = be32b(v >>> 32) ++ be32b(v & 0xffffffffL)
      def box(t: String, p: Array[Byte]) = {
        val sz = p.length + 8
        be32b(sz.toLong) ++ t.getBytes("US-ASCII") ++ p
      }
      // find the stco box in b2 and re-encode as co64; the offsets grow
      // by the frame delta (4 extra bytes per entry + same header), so
      // recompute them from the original decode + the size delta
      val orig = MediaCodecs.decodeMp4Samples(b2).get
      val nCh = orig.map(_.chunkIdx).distinct.size
      val delta = 4 * nCh // co64 payload is 4 bytes/entry larger
      val chunkOffs = orig.groupBy(_.chunkIdx).toSeq.sortBy(_._1)
        .map(_._2.minBy(_.sampleIdx).offset + delta)
      val co64 = box("co64", new Array[Byte](4) ++ be32b(nCh.toLong) ++
        chunkOffs.flatMap(be64b))
      val stcoPat = be32b(16L + 4 * nCh) ++ "stco".getBytes("US-ASCII")
      val at = b2.indices.find(i => i + stcoPat.length <= b2.length &&
        stcoPat.indices.forall(k => b2(i + k) == stcoPat(k))).get
      val stcoLen = 16 + 4 * nCh
      // splice: grow every enclosing box's size field by delta
      val pre = b2.take(at); val post = b2.drop(at + stcoLen)
      val spliced = pre ++ co64 ++ post
      // patch ancestor box sizes (moov/trak/mdia/minf/stbl all precede at)
      def patchSize(buf: Array[Byte], boxType: String): Unit = {
        val pat = boxType.getBytes("US-ASCII")
        val i = buf.indices.find(i => i + 4 <= buf.length - 4 &&
          pat.indices.forall(k => buf(i + 4 + k) == pat(k))).get
        val old = ((buf(i) & 0xffL) << 24) | ((buf(i + 1) & 0xffL) << 16) |
          ((buf(i + 2) & 0xffL) << 8) | (buf(i + 3) & 0xffL)
        val nv = old + delta
        buf(i) = (nv >>> 24).toByte; buf(i + 1) = (nv >>> 16).toByte
        buf(i + 2) = (nv >>> 8).toByte; buf(i + 3) = nv.toByte
      }
      Seq("moov", "trak", "mdia", "minf", "stbl").foreach(t => patchSize(spliced, t))
      val sm64 = MediaCodecs.decodeMp4Samples(spliced).get
      assert(sm64.map(s => (s.sampleIdx, s.dts, s.size, s.chunkIdx)) ==
        orig.map(s => (s.sampleIdx, s.dts, s.size, s.chunkIdx)))
      assert(sm64.map(_.offset) == orig.map(_.offset + delta))
    }
    // metadata-only fixtures (no stbl) refuse gracefully
    assert(MediaCodecs.decodeMp4Samples(MediaCodecs.encodeMp4Meta(600L, 100L,
      Seq(MediaCodecs.Mp4Track(1L, "vide", 64, 64)))).isEmpty)
    // malformed refusal: truncated, and never-throw fuzz
    assert(MediaCodecs.decodeMp4Samples(b.take(b.length / 2)).isEmpty ||
      MediaCodecs.decodeMp4Samples(b.take(b.length / 2)).nonEmpty) // no throw
    val rnd = new java.util.Random(0x4d51)
    for (_ <- 0 until 300) {
      val x = b.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decodeMp4Samples(x)
    }
    for (cut <- 0 until b.length) MediaCodecs.decodeMp4Samples(b.take(cut))
  }

  test("y4m decode: exact plane means, chroma modes, header variants, refusal, fuzz") {
    import graft.operators.MediaCodecs
    // 2x2, 420jpeg: Y [10,20,30,40] -> 25; Cb [7] -> 7; Cr [9] -> 9;
    // second frame Y [1,2,3,5] -> 2 (floor 11/4)
    val b = MediaCodecs.encodeY4m(2, 2, 25, 1, "420jpeg", Seq(
      (Seq(10, 20, 30, 40), Seq(7), Seq(9)),
      (Seq(1, 2, 3, 5), Seq(200), Seq(255))))
    assert(MediaCodecs.sniff(b) == "y4m")
    val v = MediaCodecs.decodeY4m(b).get
    assert(v.width == 2 && v.height == 2 && v.fpsNum == 25 && v.fpsDen == 1 &&
      v.chroma == "420jpeg" && v.frames.size == 2)
    assert(v.frames(0) == MediaCodecs.Y4mFrame(0, 25, 7, 9))
    assert(v.frames(1) == MediaCodecs.Y4mFrame(1, 2, 200, 255))
    assert(v.durationMs == 80L) // 2 frames / 25 fps
    val d = MediaCodecs.decode(b).get
    assert(d.kind == "y4m" && d.channels == 3 && d.nSamples == 2 &&
      d.durationMs == 80L && d.meanR == 25 && d.meanG == 7 && d.meanB == 9)
    // 444: full-size chroma planes; mono: none, chroma means report 0
    val v444 = MediaCodecs.decodeY4m(MediaCodecs.encodeY4m(2, 1, 30, 1, "444",
      Seq((Seq(100, 200), Seq(1, 3), Seq(5, 6))))).get
    assert(v444.frames == Seq(MediaCodecs.Y4mFrame(0, 150, 2, 5)))
    val vMono = MediaCodecs.decodeY4m(MediaCodecs.encodeY4m(3, 1, 30, 1, "mono",
      Seq((Seq(9, 10, 12), Nil, Nil)))).get
    assert(vMono.frames == Seq(MediaCodecs.Y4mFrame(0, 10, 0, 0)))
    assert(MediaCodecs.decode(MediaCodecs.encodeY4m(3, 1, 30, 1, "mono",
      Seq((Seq(9, 10, 12), Nil, Nil)))).get.channels == 1)
    // header variants: X metadata token, double spaces, FRAME parameters,
    // C absent (420jpeg default), fractional fps
    val hdr = "YUV4MPEG2 W2 H2  F30000:1001 Ip A1:1 Xcolorrange=FULL\n"
    val manual = hdr.getBytes("US-ASCII") ++ "FRAME Ximeta\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 7, 9)
    val vm = MediaCodecs.decodeY4m(manual).get
    assert(vm.chroma == "420jpeg" && vm.fpsNum == 30000 && vm.fpsDen == 1001 &&
      vm.frames == Seq(MediaCodecs.Y4mFrame(0, 25, 7, 9)))
    // refusal: odd dims for subsampled modes, truncated frame, zero
    // frames, unterminated header, unknown chroma, junk after frames
    assert(MediaCodecs.decodeY4m(
      "YUV4MPEG2 W3 H2 F25:1 C420jpeg\nFRAME\n".getBytes("US-ASCII") ++
        new Array[Byte](9)).isEmpty)
    assert(MediaCodecs.decodeY4m(b.dropRight(1)).isEmpty)
    assert(MediaCodecs.decodeY4m("YUV4MPEG2 W2 H2 F25:1\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.decodeY4m("YUV4MPEG2 W2 H2 F25:1".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.decodeY4m(
      "YUV4MPEG2 W2 H2 F25:1 C999\nFRAME\n".getBytes("US-ASCII") ++
        new Array[Byte](6)).isEmpty)
    assert(MediaCodecs.decodeY4m(b ++ Array[Byte](0x55)).isEmpty)
    // never-throw fuzz: mutations and truncations
    val rnd = new java.util.Random(0x59344d)
    for (_ <- 0 until 300) {
      val x = b.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decode(x)
    }
    for (cut <- 0 until b.length) MediaCodecs.decode(b.take(cut))
  }

  test("warc: round-trip, gzip members, malformed-record resync, spark lane, fuzz") {
    import graft.sources.WarcSource
    import graft.sources.WarcSource.WarcRecord
    val recs = Seq(
      WarcRecord("warcinfo", "", "2025-01-01T00:00:00Z", "<urn:uuid:i>", 0, "",
        "software: x\r\n"),
      WarcRecord("response", "http://a.com/p", "2025-01-02T00:00:00Z", "<urn:uuid:1>",
        200, "text/html", "Body one."),
      WarcRecord("request", "http://a.com/p", "2025-01-02T00:00:00Z", "<urn:uuid:2>",
        0, "", "GET /p HTTP/1.1\r\n"),
      WarcRecord("response", "https://b.org/q", "2025-01-03T00:00:00Z", "<urn:uuid:3>",
        404, "text/plain", "Gone.\r\nReally gone."))
    val plain = WarcSource.encode(recs)
    val (got, skipped) = WarcSource.parse(plain)
    assert(skipped == 0 && got == recs)
    // single-member gzip and CONCATENATED per-record members (the
    // Common Crawl layout) both inflate to the same records
    val gz1 = WarcSource.gzip(plain)
    val gzN = recs.map(r => WarcSource.gzip(WarcSource.encode(Seq(r))))
      .reduce(_ ++ _)
    assert(WarcSource.parse(gz1) == ((recs, 0)))
    assert(WarcSource.parse(gzN) == ((recs, 0)))
    // a record whose declared Content-Length runs past the file is
    // SKIPPED and the parser resyncs to the next record
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nxx")
      .getBytes("UTF-8")
    val (got2, skipped2) = WarcSource.parse(
      WarcSource.encode(recs.take(2)) ++ bad ++ WarcSource.encode(recs.drop(3)))
    assert(got2 == recs.take(2) ++ recs.drop(3) && skipped2 == 1)
    // bad version line is skipped the same way
    val badv = "WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("UTF-8")
    val (got3, skipped3) = WarcSource.parse(badv ++ WarcSource.encode(recs.take(2)))
    assert(got3 == recs.take(2) && skipped3 == 1)
    // spark lane: plain file and its gzip twin produce identical rows
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    java.nio.file.Files.write(dir.resolve("a.warc"), plain)
    val dirGz = java.nio.file.Files.createTempDirectory("warcspecgz")
    java.nio.file.Files.write(dirGz.resolve("a.warc.gz"), gz1)
    val s = TestSpark.spark
    def rows(d: java.nio.file.Path) =
      WarcSource.readResponses(s, d.toString).drop("path")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val pr = rows(dir)
    assert(pr == rows(dirGz))
    assert(pr.size == 2) // only the response records
    // never-throw fuzz: mutations and truncations of BOTH the plain
    // and the gzipped form (the compression layer must degrade, not die)
    val rnd = new java.util.Random(0x3a5c)
    for (base <- Seq(plain, gz1); _ <- 0 until 300) {
      val x = base.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      WarcSource.parse(x)
    }
    for (base <- Seq(plain, gz1); cut <- 0 until base.length by 7)
      WarcSource.parse(base.take(cut))
  }

  test("warc streaming walk == whole-buffer parse; bounded window; spark streaming lane") {
    import graft.sources.WarcSource
    import graft.sources.WarcSource.WarcRecord
    def stream(b: Array[Byte], chunk: Int = 64 * 1024, cap: Int = 64 << 20) =
      WarcSource.parseStreaming(new java.io.ByteArrayInputStream(b), cap, chunk).toSeq
    val recs = Seq(
      WarcRecord("warcinfo", "", "2025-01-01T00:00:00Z", "<urn:uuid:i>", 0, "",
        "software: x\r\n"),
      WarcRecord("response", "http://a.com/p", "2025-01-02T00:00:00Z", "<urn:uuid:1>",
        200, "text/html", "Body one. " * 900), // > one 4 KiB chunk
      WarcRecord("request", "http://a.com/p", "2025-01-02T00:00:00Z", "<urn:uuid:2>",
        0, "", "GET /p HTTP/1.1\r\n"),
      WarcRecord("response", "https://b.org/q", "2025-01-03T00:00:00Z", "<urn:uuid:3>",
        404, "text/plain", "Gone.\r\nReally gone."))
    val plain = WarcSource.encode(recs)
    val gz1 = WarcSource.gzip(plain)
    val gzN = recs.map(r => WarcSource.gzip(WarcSource.encode(Seq(r)))).reduce(_ ++ _)
    // equivalence across plain / single-member / multi-member gzip, with
    // a tiny chunk so records CROSS window boundaries and force growth
    for (b <- Seq(plain, gz1, gzN); ch <- Seq(64, 4096, 64 * 1024))
      assert(stream(b, ch) == recs, s"chunk=$ch")
    // malformed mid-file: same records, same resync as parse()
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nxx")
      .getBytes("UTF-8")
    val mixed = WarcSource.encode(recs.take(2)) ++ bad ++ WarcSource.encode(recs.drop(3))
    assert(stream(mixed) == WarcSource.parse(mixed)._1)
    // over-cap record (declared-size bomb) is skipped, walk continues
    val capped = stream(mixed, chunk = 64, cap = 1 << 14)
    assert(capped == recs.take(2) ++ recs.drop(3))
    // spark streaming lane rows == whole-buffer lane rows
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    java.nio.file.Files.write(dir.resolve("a.warc"), plain)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gzN)
    val s = TestSpark.spark
    val a = WarcSource.readResponsesStreaming(s, dir.toString)
      .drop("path").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = WarcSource.readResponses(s, dir.toString)
      .drop("path", "skipped").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b && a.size == 4)
    // never-throw fuzz through the streaming layer
    val rnd = new java.util.Random(0x57a3)
    for (base <- Seq(plain, gz1); _ <- 0 until 200) {
      val x = base.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      stream(x, 64)
    }
    for (base <- Seq(plain, gz1); cut <- 0 until base.length by 7)
      stream(base.take(cut), 64)
  }

  test("ogg-opus metadata walk: page framing, CRC verification, refusal, fuzz") {
    import graft.operators.MediaCodecs
    val b = MediaCodecs.encodeOggOpus(2, 312, 16000L, Seq(960L, 1920L, 2880L))
    assert(MediaCodecs.sniff(b) == "ogg")
    val m = MediaCodecs.decodeOggOpus(b).get
    assert(m.channels == 2 && m.preSkip == 312 && m.inputRate == 16000L &&
      m.lastGranule == 2880L && m.pages == 5) // BOS + tags + 3 audio
    assert(m.nSamples48k == 2568L && m.durationMs == 2568L * 1000 / 48000)
    val d = MediaCodecs.decode(b).get
    assert(d.kind == "ogg" && d.channels == 2 && d.sampleRate == 16000 &&
      d.nSamples == 2568L)
    // pre-skip larger than the stream clamps to zero samples
    assert(MediaCodecs.decodeOggOpus(
      MediaCodecs.encodeOggOpus(1, 5000, 48000L, Seq(960L))).get.nSamples48k == 0L)
    // integrity: a flipped payload byte fails the page CRC -> None
    val tam = b.clone(); tam(b.length - 5) = (tam(b.length - 5) ^ 0x10).toByte
    assert(MediaCodecs.decodeOggOpus(tam).isEmpty)
    // truncation, bad stream-structure version, missing OpusHead refuse
    assert(MediaCodecs.decodeOggOpus(b.dropRight(3)).isEmpty)
    val badv = b.clone(); badv(4) = 9
    assert(MediaCodecs.decodeOggOpus(badv).isEmpty)
    // never-throw fuzz
    val rnd = new java.util.Random(0x0995)
    for (_ <- 0 until 300) {
      val x = b.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decode(x)
    }
    for (cut <- 0 until b.length) MediaCodecs.decode(b.take(cut))
  }

  test("flac codec: lossless round-trips across modes, CRC verification, refusal, fuzz") {
    import graft.operators.{Flac, MediaCodecs}
    def pcm(n: Int, seed: Int): Seq[Int] =
      Seq.tabulate(n)(i => (((i.toLong * 2654435761L + seed * 97L) % 4001L) - 2000L).toInt)
    // mono 16-bit: VERBATIM (-1) and every FIXED order round-trip exactly
    for (order <- -1 to 4) {
      val src = pcm(400, order + 7)
      val b = Flac.encode(8000, 16, Seq(src), blockSize = 192, order = order)
      val a = Flac.decode(b).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.bps == 16, s"order $order")
      assert(a.samples(0).toSeq == src, s"order $order")
    }
    // Rice partition orders subdivide the residual exactly
    for (po <- 1 to 3) {
      val src = pcm(384, po)
      val a = Flac.decode(Flac.encode(8000, 16, Seq(src),
        blockSize = 192, order = 2, partOrder = po)).get
      assert(a.samples(0).toSeq == src, s"partOrder $po")
    }
    // stereo: independent and mid/side (odd L+R sums exercise the
    // lost-bit reconstruction), both lossless
    val l = pcm(300, 11); val r = pcm(300, 12).map(_ + 1) // force odd sums too
    for (ms <- Seq(false, true)) {
      val a = Flac.decode(Flac.encode(44100, 16, Seq(l, r),
        blockSize = 192, order = 2, midSide = ms)).get
      assert(a.channels == 2 && a.samples(0).toSeq == l && a.samples(1).toSeq == r,
        s"midSide $ms")
    }
    // 8-bit depth
    val s8 = Seq.tabulate(200)(i => (i % 251) - 125)
    assert(Flac.decode(Flac.encode(8000, 8, Seq(s8), order = 1))
      .get.samples(0).toSeq == s8)
    // constant signal (order-0 residuals all equal -> tiny rice stream)
    val const = Seq.fill(250)(-37)
    assert(Flac.decode(Flac.encode(8000, 16, Seq(const), order = 0))
      .get.samples(0).toSeq == const)
    // the shared feature row: FLAC of the same samples reports the SAME
    // rms/duration as the WAV lane (two independent code paths agree)
    val src = pcm(320, 42)
    val viaFlac = MediaCodecs.decode(Flac.encode(8000, 16, Seq(src), order = 2)).get
    val viaWav = MediaCodecs.decode(MediaCodecs.encodeWavPcm16(1, 8000, src)).get
    assert(viaFlac.kind == "flac" && viaWav.kind == "wav")
    assert(viaFlac.rmsE3 == viaWav.rmsE3 && viaFlac.nSamples == viaWav.nSamples &&
      viaFlac.durationMs == viaWav.durationMs)
    // integrity: a flipped payload byte fails a CRC -> None (never throws)
    val good = Flac.encode(8000, 16, Seq(src), order = 2)
    val tampered = good.clone(); tampered(good.length - 3) = (tampered(good.length - 3) ^ 0x40).toByte
    assert(Flac.decode(tampered).isEmpty)
    // truncation refuses (declared total samples never arrive)
    assert(Flac.decode(good.dropRight(8)).isEmpty)
    // never-throw fuzz: mutations and truncations
    val rnd = new java.util.Random(0xf1ac)
    for (_ <- 0 until 300) {
      val x = good.clone(); x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decode(x)
    }
    for (cut <- 0 until good.length) MediaCodecs.decode(good.take(cut))
  }

  test("gif/mp3 decoders never throw: mutations and truncations of valid files") {
    import graft.operators.MediaCodecs
    val rnd = new scala.util.Random(0x5eed)
    val gifOk = MediaCodecs.encodeGif(6, 4, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)),
      Seq.tabulate(24)(_ % 3))
    val mp3Ok = MediaCodecs.encodeMp3Frames(5, 64, 44100, stereo = false)
    for (base <- Seq(gifOk, mp3Ok); _ <- 0 until 300) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      MediaCodecs.decode(b) // must not throw
    }
    for (base <- Seq(gifOk, mp3Ok); cut <- 0 until base.length)
      MediaCodecs.decode(base.take(cut))
    // adversarial: LZW stream truncated inside a sub-block; huge ID3 size
    assert(MediaCodecs.decode(gifOk.dropRight(2)).isEmpty)
    val hugeId3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(MediaCodecs.decode(hugeId3).isEmpty)
  }

  test("decodeReal lane: mixed batch routes per payload, opaque keeps byte stats, no shuffle") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", Synth.wav(1, 8000, 16, Seq(0, 0, 0, 0)), 0, 0),
      Multimodal.MediaRow(2L, "image/x-portable-pixmap",
        Synth.ppm(1, 1, Seq((7, 8, 9))), 1, 1),
      Multimodal.MediaRow(3L, "image/bmp", Synth.bmp(1, 1, Seq((5, 6, 7))), 1, 1),
      Multimodal.MediaRow(4L, "application/octet-stream", "abc".getBytes, 320, 240),
      Multimodal.MediaRow(5L, "image/jpeg", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte), 8, 8))
    val ds = Multimodal.extractDecoded(spark, rows.toDF())
    assert(!ds.queryExecution.executedPlan.toString.contains("Exchange"),
      "decode lane must stay narrow (media never shuffles)")
    val got = ds.collect().map(r => r.doc_id -> r).toMap
    assert(got(1L).kind == "wav" && got(1L).sample_rate == 8000 && got(1L).n_samples == 4)
    assert(got(2L).kind == "ppm" &&
      (got(2L).mean_r, got(2L).mean_g, got(2L).mean_b) == (7, 8, 9))
    assert(got(3L).kind == "bmp" &&
      (got(3L).mean_r, got(3L).mean_g, got(3L).mean_b) == (5, 6, 7))
    // opaque payloads (including compressed formats) keep the byte-stat contract
    for (id <- Seq(4L, 5L)) assert(got(id).kind == "opaque")
    assert(got(4L).byte_sum == 'a' + 'b' + 'c' && got(4L).n_bytes == 3)
  }

  test("detrng shuffle is a permutation and deterministic") {
    val rng1 = new Kvp.DetRng("s")
    val rng2 = new Kvp.DetRng("s")
    val xs = (1 to 20).toList
    val a = rng1.shuffle(xs)
    assert(a == rng2.shuffle(xs))
    assert(a.sorted == xs)
  }

  // ---- refresh telemetry (src/ingestion.rs:204-217) ----

  test("refresh telemetry: counters ride the refresh job via observe()") {
    val spark = TestSpark.spark
    import spark.implicits._
    val page = Seq.tabulate(37)(i => (i.toLong, s"row $i")).toDF("id", "text")
    val (out, stats) = graft.sources.Telemetry.refresh(page, "srcA")
    assert(out.length == 37)
    assert(stats == graft.sources.RefreshStats("srcA", 37L, stats.millis))
    assert(stats.rowsPerSec > 0.0)
  }

  // ---- HF manifest offline seam (huggingface_source.rs:1735-1820,
  //      860-900; network fetch is out of scope) ----

  test("hf manifest: extension filter, sort+dedup, sizes, deterministic order") {
    val json = """{
      "parquet_files": [
        {"dataset": "acme/d", "url": "https://host/x/b.parquet", "size": 200},
        {"dataset": "acme/d", "url": "https://host/x/a.parquet", "size": 100},
        {"dataset": "acme/d", "url": "https://host/x/skip.json", "size": 5},
        {"dataset": "acme/d", "url": "https://host/x/b.parquet", "size": 999},
        {"dataset": "acme/d", "url": "https://host/x/c.parquet"}
      ]
    }"""
    val cands = graft.sources.HfManifest.parse(json)
    assert(cands.map(_.fileName) == Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(cands.map(_.expectedSize) == Seq(Some(100L), Some(200L), None))
    val o1 = graft.sources.HfManifest.downloadOrder(cands, "src", "42")
    val o2 = graft.sources.HfManifest.downloadOrder(cands, "src", "42")
    assert(o1 == o2, "order must be a pure function of (manifest, source, seed)")
    assert(o1.toSet == cands.toSet)
    assert(graft.sources.HfManifest.downloadOrder(cands, "src", "43") != o1 ||
      cands.size < 3, "seed must matter (up to tiny-permutation collisions)")
    // distinct urls sharing a basename must land under distinct names, and
    // a query-suffixed parquet url passes the extension filter
    val twinJson = "{\"parquet_files\": [" +
      "{\"url\": \"https://h/train/0000.parquet\", \"size\": 1}, " +
      "{\"url\": \"https://h/test/0000.parquet\", \"size\": 1}, " +
      "{\"url\": \"https://h/x/q.parquet?download=true\", \"size\": 1}]}"
    val twins = graft.sources.HfManifest.parse(twinJson)
    assert(twins.size == 3)
    assert(twins.map(_.landedName).distinct.size == 3)
    assert(twins.forall(_.landedName.matches("[0-9a-f]{8}_.*parquet.*")))
    // a ']' inside a url must not truncate the manifest array
    val bracketJson = "{\"parquet_files\": [" +
      "{\"url\": \"https://h/a]b/one.parquet\", \"size\": 1}, " +
      "{\"url\": \"https://h/two.parquet\", \"size\": 2}]}"
    assert(graft.sources.HfManifest.parse(bracketJson).size == 2)
  }

  test("hf manifest: cache reconciliation — first uncached, incomplete, eviction") {
    import graft.sources.HfManifest
    val dir = java.nio.file.Files.createTempDirectory("graft_landing")
    val cands = Seq(
      HfManifest.ShardCandidate("https://h/a.parquet", Some(3L)),
      HfManifest.ShardCandidate("https://h/b.parquet", Some(4L)),
      HfManifest.ShardCandidate("https://h/c.parquet", Some(5L)))
    val order = HfManifest.downloadOrder(cands, "s", "42")
    // land the first ordered shard with the RIGHT size, the second with a
    // WRONG size (incomplete download)
    java.nio.file.Files.write(dir.resolve(order(0).landedName),
      Array.fill(order(0).expectedSize.get.toInt)('x'.toByte))
    java.nio.file.Files.write(dir.resolve(order(1).landedName), Array[Byte]('x'))
    assert(HfManifest.firstUncached(order, dir.toString).contains(2))
    assert(HfManifest.incomplete(order, dir.toString) == Seq(order(1)))
    // eviction: oldest-first until the directory fits under the cap
    val sizes = Seq(order(0), order(1))
      .map(c => java.nio.file.Files.size(dir.resolve(c.landedName))).sum
    val plan = HfManifest.evictionPlan(dir.toString, 1L)
    val evicted = plan.map(java.nio.file.Files.size).sum
    assert(plan.nonEmpty && sizes - evicted <= 1L, "evicts until under cap")
    assert(HfManifest.evictionPlan(dir.toString, 0L).size == 2,
      "evicts everything when cap is 0")
    assert(HfManifest.evictionPlan(dir.toString, sizes).isEmpty,
      "no eviction when already under cap")
  }

  test("hf manifest: landed shards read through toRecords with stable ids") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_landed").toString
    Seq.tabulate(10)(i => (i.toLong, s"landed text $i"))
      .toDF("rid", "text").coalesce(1).write.mode("overwrite").parquet(dir)
    val entry = HfSourceList.parseLine(
      "hf://acme/landed/default/train anchor=text source_id=landed id=rid")
      .toOption.flatten.get
    val recs = graft.sources.HfManifest.readLanded(spark, dir, entry).collect()
    assert(recs.length == 10)
    assert(recs.map(_.id).sorted.toSeq == Seq.tabulate(10)(i => s"landed::$i").sorted)
  }

  // ---- stable record ids (reference: src/config.rs:138-145) ----

  test("hf shard ids are per-file metadata ids, stable across scan config") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    // two parquet part-files in one landing dir (skewed sizes, so Spark's
    // size-descending bin-packing visits them out of name order)
    Seq.tabulate(120)(i => (i.toLong, s"alpha body text number $i with padding tokens"))
      .toDF("rid", "text").repartition(2).write.mode("overwrite").parquet(dir)
    val entry = HfSourceList.parseLine(
      "hf://acme/stab/default/train anchor=text source_id=hfsrc")
      .toOption.flatten.get
    def readIds(maxBytes: String): Seq[String] = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
      try HfSourceList.toRecords(spark, spark.read.parquet(dir), entry)
        .collect().map(_.id).toSeq.sorted
      finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    val a = readIds("134217728")
    val b = readIds("65536")
    assert(a == b, "ids must not depend on scan-split configuration")
    assert(a.size == 120)
    assert(a.forall(_.matches("hfsrc::.*\\.parquet:row_\\d+")))
    // per-file numbering restarts at 0 in every file
    val byFile = a.groupBy(_.split(":row_")(0))
    assert(byFile.size == 2)
    byFile.values.foreach { ids =>
      val idxs = ids.map(_.split(":row_")(1).toLong).sorted
      assert(idxs == (0L until idxs.size).toSeq)
    }
    // explicit id column wins over file metadata
    val entryId = HfSourceList.parseLine(
      "hf://acme/stab/default/train anchor=text source_id=hfsrc id=rid")
      .toOption.flatten.get
    val withIdCol = HfSourceList.toRecords(spark, spark.read.parquet(dir), entryId)
      .collect().map(_.id).toSeq.sorted
    assert(withIdCol == Seq.tabulate(120)(i => s"hfsrc::$i").sorted)
  }

  test("csv ids follow exact in-file row order across partition configs") {
    val spark = TestSpark.spark
    val p = java.nio.file.Files.createTempDirectory("graft_csv").resolve("rows.csv")
    val body = "q,a\n" + (0 until 30).map(i => s"question $i,answer $i").mkString("\n") + "\n"
    java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    val cfg = graft.sources.CsvSourceConfig("cs", p.toString,
      anchorColumn = Some("q"), positiveColumn = Some("a"))
    def pairs(): Seq[(String, String)] =
      graft.sources.CsvSource.read(spark, cfg).collect()
        .map(r => r.id -> r.sections.head.text).toSeq.sortBy(_._1)
    val first = pairs()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    val second = try pairs() finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert(first == second)
    // id index i must name the i-th row of the file
    first.foreach { case (id, anchor) =>
      val i = id.stripPrefix("cs::row_").toInt
      assert(anchor == s"question $i")
    }
    assert(first.size == 30)
  }

  test("file stream pager: seeded order, wraparound re-serve, mid-wrap resume") {
    import graft.sources.{FileSource, FileSourceConfig, FileStream}
    import graft.operators.SamplerState
    val spark = TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("graft_fs_page")
    java.nio.file.Files.createDirectories(root.resolve("2020-01-02"))
    val names = Seq("alpha.txt", "beta.txt", "gamma.txt", "delta.txt",
      "2020-01-02/epsilon.txt", "2020-01-02/zeta.txt", "eta.txt")
    names.foreach(n => java.nio.file.Files.writeString(root.resolve(n), s"body of $n"))
    val cfg = FileSourceConfig("fsp", root.toString)
    val order = FileStream.orderedFiles(cfg)
    assert(order.size == 7)
    assert(order.map(_.toString).toSet == names.map(n => root.resolve(n).toString).toSet)
    // pseudo-random, not lexicographic (7! orders; lexicographic would be
    // a 1/5040 coincidence — and a regression to path-sorted serving)
    assert(order.map(_.toString) != order.map(_.toString).sorted)

    def servePages(st0: SamplerState, n: Int, limit: Int) = {
      var st = st0
      val served = Seq.newBuilder[java.nio.file.Path]
      (0 until n).foreach { _ =>
        val page = FileStream.nextPage(spark, cfg, st, limit)
        served ++= page.paths
        st = page.state
      }
      (served.result(), st)
    }
    // two full wraps in pages of 3: the corpus re-serves in the SAME order
    val (served, endSt) = servePages(SamplerState("s", 0L, Map.empty), 5, 3)
    assert(served.size == 15)
    assert(served == (order ++ order ++ order.take(1)))
    assert(endSt.counter("fs_cursor:fsp") == 15 % 7)
    // mid-wrap resume through the persisted file continues the sequence
    val dir = java.nio.file.Files.createTempDirectory("graft_fs_state")
    val (firstTwo, stMid) = servePages(SamplerState("s", 0L, Map.empty), 2, 3)
    SamplerState.save(stMid, s"$dir/st.json")
    val (rest, _) = servePages(SamplerState.load(s"$dir/st.json").get, 3, 3)
    assert(firstTwo ++ rest == served)
    // page records carry FileSource ids/sections for exactly the page
    val page1 = FileStream.nextPage(spark, cfg, SamplerState("s", 0L, Map.empty), 3)
    val recs = page1.records.collect()
    assert(recs.length == 3)
    assert(recs.map(_.id).toSet ==
      page1.paths.map(p => s"fsp::${root.relativize(p)}").toSet)
    // skipped files do not advance the cursor and are re-visited
    val skipFirst = FileStream.nextPage(spark, cfg, SamplerState("s", 0L, Map.empty), 2,
      convertible = p => p != order.head)
    assert(skipFirst.paths == order.slice(1, 3))
    assert(skipFirst.state.counter("fs_cursor:fsp") == 2)
    // a batch-vs-stream sanity: the full-corpus batch read equals one
    // whole-cycle page, id-for-id
    val batchIds = FileSource.read(spark, cfg).collect().map(_.id).toSet
    val cycle = FileStream.nextPage(spark, cfg, SamplerState("s", 0L, Map.empty), 7)
    assert(cycle.records.collect().map(_.id).toSet == batchIds)
  }

  test("hf seam e2e: loopback manifest fetch, seeded downloads, resume, eviction, records") {
    import graft.sources.{HfManifest, HfSourceList}
    val spark = TestSpark.spark
    import spark.implicits._
    // two real parquet shards (single part files) to serve
    val work = java.nio.file.Files.createTempDirectory("graft_hf_http")
    def shardBytes(name: String, rows: Seq[String]): Array[Byte] = {
      val d = work.resolve(name)
      rows.toDF("text").coalesce(1).write.parquet(d.toString)
      val part = java.nio.file.Files.list(d).iterator()
      val f = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.readAllBytes(f)
    }
    val aBytes = shardBytes("A", (0 until 6).map(i => s"alpha row $i body"))
    val bBytes = shardBytes("B", (0 until 4).map(i => s"beta row $i body"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, bytes: () => Array[Byte]): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val b = bytes()
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      })
    try {
      server.start()
      val port = server.getAddress.getPort
      val base = s"http://127.0.0.1:$port"
      val manifest = s"""{"parquet_files": [
        {"dataset": "acme/e2e", "url": "$base/shards/train/0000.parquet", "size": ${aBytes.length}},
        {"dataset": "acme/e2e", "url": "$base/shards/train/0001.parquet", "size": ${bBytes.length}}
      ]}"""
      serve("/manifest", () => manifest.getBytes("UTF-8"))
      serve("/shards/train/0000.parquet", () => aBytes)
      serve("/shards/train/0001.parquet", () => bBytes)

      val landing = java.nio.file.Files.createTempDirectory("graft_hf_landing").toString
      // fetch + parse + seeded order (stable across "restarts")
      val cands = HfManifest.parse(HfManifest.fetchManifest(s"$base/manifest"))
      assert(cands.size == 2)
      val order = HfManifest.downloadOrder(cands, "hfe2e", "7")
      assert(HfManifest.firstUncached(order, landing).contains(0))
      HfManifest.download(order(0), landing)
      // simulated restart: re-fetch, recompute — cursor resumes at 1
      val order2 = HfManifest.downloadOrder(
        HfManifest.parse(HfManifest.fetchManifest(s"$base/manifest")), "hfe2e", "7")
      assert(order2 == order)
      assert(HfManifest.firstUncached(order2, landing).contains(1))
      HfManifest.download(order2(1), landing)
      assert(HfManifest.firstUncached(order2, landing).isEmpty)
      assert(HfManifest.incomplete(order2, landing).isEmpty)
      // truncate one shard: flagged incomplete, re-download heals it
      val landed0 = java.nio.file.Paths.get(landing, order(0).landedName)
      java.nio.file.Files.write(landed0, aBytes.take(10))
      assert(HfManifest.incomplete(order2, landing) == Seq(order(0)))
      HfManifest.download(order(0), landing)
      assert(HfManifest.incomplete(order2, landing).isEmpty)
      // eviction plan under a one-shard cap keeps total under cap
      val plan = HfManifest.evictionPlan(landing, math.max(aBytes.length, bBytes.length).toLong)
      assert(plan.nonEmpty && plan.size < 2, s"plan: $plan")
      // landed shards -> records with stable per-file metadata ids
      val entry = HfSourceList.parseLine(
        "hf://acme/e2e/default/train anchor=text source_id=hfe2e").toOption.flatten.get
      val recs = HfManifest.readLanded(spark, landing, entry).collect()
      assert(recs.length == 10)
      assert(recs.map(_.id).distinct.length == 10)
      assert(recs.forall(_.id.startsWith("hfe2e::")))
      assert(recs.forall(_.sections.nonEmpty))
    } finally server.stop(0)
  }

  test("hf async expansion: reads never block on an in-flight download; landed set is the order prefix") {
    import graft.sources.{HfManifest, HfSourceList, ShardExpander}
    import java.util.concurrent.CountDownLatch
    val spark = TestSpark.spark
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_hf_async")
    def shardBytes(name: String, rows: Seq[String]): Array[Byte] = {
      val d = work.resolve(name)
      rows.toDF("text").coalesce(1).write.parquet(d.toString)
      val part = java.nio.file.Files.list(d).iterator()
      Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.readAllBytes).get
    }
    val bytesByPath = Seq(
      "/sh/0000.parquet" -> shardBytes("A", (0 until 6).map(i => s"alpha $i body text")),
      "/sh/0001.parquet" -> shardBytes("B", (0 until 4).map(i => s"beta $i body text")),
      "/sh/0002.parquet" -> shardBytes("C", (0 until 5).map(i => s"gamma $i body text"))).toMap
    val rowsByPath = Map("/sh/0000.parquet" -> 6, "/sh/0001.parquet" -> 4, "/sh/0002.parquet" -> 5)
    // a latch per gated path: the handler blocks BEFORE responding, so the
    // gated shard is genuinely in flight while readers are asserted against
    val gates = new java.util.concurrent.ConcurrentHashMap[String, CountDownLatch]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // requests block on the gate INSIDE the exchange, so serve each on its
    // own thread (the default server executor is the caller's thread)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    bytesByPath.foreach { case (path, bytes) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        Option(gates.get(path)).foreach(_.await())
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    try {
      server.start()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val cands = bytesByPath.toSeq.sortBy(_._1).map { case (p, b) =>
        HfManifest.ShardCandidate(s"$base$p", Some(b.length.toLong)) }
      val order = HfManifest.downloadOrder(cands, "hfasync", "7")
      def pathOf(c: HfManifest.ShardCandidate) = c.url.stripPrefix(base)
      // gate the SECOND shard in download order
      val gate = new CountDownLatch(1)
      gates.put(pathOf(order(1)), gate)

      val landing = java.nio.file.Files.createTempDirectory("graft_hf_l1").toString
      val exp = new ShardExpander(order, landing)
      try {
        // first shard lands; the second is now held in flight by the gate
        assert(exp.awaitLanded(1, 20000).size == 1)
        // materialized-set determinism: the landed set is exactly the
        // order's first position
        assert(exp.landed() == Seq(java.nio.file.Paths.get(landing, order(0).landedName)))
        assert(!exp.finished && exp.failure.isEmpty)
        // reads never block on the network: landed() answers immediately
        // while the download is in flight
        val t0 = System.nanoTime()
        exp.landed()
        assert((System.nanoTime() - t0) / 1e9 < 0.5, "landed() blocked")
        // and a Spark scan of the landing dir serves the materialized
        // prefix — the in-flight temp file is hidden from the file index
        assert(spark.read.parquet(landing).count() == rowsByPath(pathOf(order(0))).toLong)
        // release: expansion drains the rest of the order
        gate.countDown()
        assert(exp.awaitLanded(3, 20000).size == 3)
        assert(exp.landed() == order.map(c => java.nio.file.Paths.get(landing, c.landedName)))
        assert(exp.failure.isEmpty)
        val entry = HfSourceList.parseLine(
          "hf://acme/async/default/train anchor=text source_id=hfasync").toOption.flatten.get
        assert(HfManifest.readLanded(spark, landing, entry).collect().length == 15)
      } finally exp.close()

      // disk cap halts expansion BEFORE the shard that no longer fits
      val landing2 = java.nio.file.Files.createTempDirectory("graft_hf_l2").toString
      val cap = order(0).expectedSize.get
      val exp2 = new ShardExpander(order, landing2, capBytes = cap)
      try {
        exp2.awaitLanded(1, 20000)
        exp2.awaitLanded(2, 2000) // returns at halt; nothing more can land
        assert(exp2.finished && exp2.failure.isEmpty)
        assert(exp2.landed() == Seq(java.nio.file.Paths.get(landing2, order(0).landedName)))
      } finally exp2.close()

      // a dead URL: retries, then failure surfaces and expansion stops —
      // landed keeps serving what's on disk (here: nothing)
      val landing3 = java.nio.file.Files.createTempDirectory("graft_hf_l3").toString
      val bad = Seq(HfManifest.ShardCandidate(s"$base/missing.parquet", Some(10L)))
      val exp3 = new ShardExpander(bad, landing3, maxRetries = 0)
      try {
        exp3.awaitLanded(1, 20000)
        assert(exp3.finished && exp3.failure.isDefined && exp3.landed().isEmpty)
      } finally exp3.close()
    } finally server.stop(0)
  }

  test("hf manifest url: datasets-server query assembly, encoding, split omission, override") {
    import graft.sources.{HfManifest, HfSourceList}
    val e = HfSourceList.parseLine(
      "hf://acme/demo/es/train anchor=text source_id=mu").toOption.flatten.get
    assert(HfManifest.manifestUrl(e) ==
      "https://datasets-server.huggingface.co/parquet" +
        "?dataset=acme%2Fdemo&config=es&split=train")
    // all-splits mode (empty split) omits the split param — the server
    // then returns shards for every split of the config
    val all = e.copy(split = "")
    assert(HfManifest.manifestUrl(all) ==
      "https://datasets-server.huggingface.co/parquet?dataset=acme%2Fdemo&config=es")
    // query values URL-encode (spaces, unicode)
    val odd = e.copy(config = "mixed case")
    assert(HfManifest.manifestUrl(odd).contains("config=mixed+case"))
    // per-call endpoint override (the loopback / on-prem seam)
    assert(HfManifest.manifestUrl(e, Some("http://127.0.0.1:9/parquet"))
      .startsWith("http://127.0.0.1:9/parquet?dataset="))
  }

  test("hf auth + retry policy: bearer header, 429 backoff, fail-fast 401, expander-level recovery") {
    import graft.sources.{HfHttp, HfManifest, ShardExpander}
    import java.util.concurrent.atomic.AtomicInteger
    val payload = "shard-bytes-payload".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val authHeaders = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val hits401 = new AtomicInteger(0)
    val hits429 = new AtomicInteger(0)
    // /gated: 401 until two requests have been seen, then 200 — the
    // "token became valid" (or entitlement granted) sequence
    server.createContext("/gated.parquet", (ex: com.sun.net.httpserver.HttpExchange) => {
      authHeaders.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      if (hits401.incrementAndGet() <= 2) { ex.sendResponseHeaders(401, -1); ex.close() }
      else {
        ex.sendResponseHeaders(200, payload.length)
        ex.getResponseBody.write(payload); ex.close()
      }
    })
    // /flaky: 429 with Retry-After, then a plain 500, then 200 — both
    // retriable classes inside ONE leg invocation
    server.createContext("/flaky.parquet", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits429.incrementAndGet() match {
        case 1 =>
          ex.getResponseHeaders.set("Retry-After", "7")
          ex.sendResponseHeaders(429, -1); ex.close()
        case 2 => ex.sendResponseHeaders(500, -1); ex.close()
        case _ =>
          ex.sendResponseHeaders(200, payload.length)
          ex.getResponseBody.write(payload); ex.close()
      }
    })
    // /always401: never authorized
    server.createContext("/always401.parquet", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(401, -1); ex.close()
    })
    try {
      server.start()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sleeps = scala.collection.mutable.Buffer[Long]()
      val pol = HfHttp.Policy(token = Some("tok-abc"), maxRetries = 3,
        baseBackoffMs = 100L, maxBackoffMs = 4000L, sleep = sleeps += _)

      // 429 → honored (capped) Retry-After; 500 → exponential step; then 200
      val landing = java.nio.file.Files.createTempDirectory("graft_hf_auth").toString
      val flaky = HfManifest.ShardCandidate(s"$base/flaky.parquet", Some(payload.length.toLong))
      val t = HfManifest.download(flaky, landing, pol)
      assert(java.nio.file.Files.size(t) == payload.length.toLong)
      // Retry-After 7s capped to maxBackoffMs=4000; second delay is the
      // attempt-1 exponential step 100·2^1=200
      assert(sleeps.toSeq == Seq(4000L, 200L), s"backoff schedule: $sleeps")

      // 401 fails FAST inside the leg (no sleeps), carries AuthException,
      // and the request carried the bearer token
      sleeps.clear()
      val gated = HfManifest.ShardCandidate(s"$base/gated.parquet", Some(payload.length.toLong))
      intercept[HfHttp.AuthException](HfManifest.download(gated, landing, pol))
      assert(sleeps.isEmpty, "401 must not consume the backoff budget")
      assert(authHeaders.peek() == "Bearer tok-abc")

      // expander-level recovery: per-shard attempts retry the leg, so a
      // 401-then-authorized sequence still lands the shard
      val landing2 = java.nio.file.Files.createTempDirectory("graft_hf_auth2").toString
      val exp = new ShardExpander(Seq(gated), landing2, maxRetries = 3,
        fetch = (c, d) => HfManifest.download(c, d, pol))
      try {
        assert(exp.awaitLanded(1, 20000).size == 1)
        assert(exp.failure.isEmpty)
      } finally exp.close()

      // persistent 401: retries exhaust and the TERMINAL auth failure
      // surfaces through the expander
      val landing3 = java.nio.file.Files.createTempDirectory("graft_hf_auth3").toString
      val dead = HfManifest.ShardCandidate(s"$base/always401.parquet", Some(5L))
      val exp3 = new ShardExpander(Seq(dead), landing3, maxRetries = 1,
        fetch = (c, d) => HfManifest.download(c, d, pol))
      try {
        exp3.awaitLanded(1, 20000)
        assert(exp3.finished && exp3.landed().isEmpty)
        assert(exp3.failure.exists(_.isInstanceOf[HfHttp.AuthException]))
      } finally exp3.close()

      // anonymous policy sends NO Authorization header
      authHeaders.clear(); hits401.set(10) // serve 200 directly
      val anon = pol.copy(token = None)
      HfManifest.download(gated, landing3, anon)
      assert(authHeaders.peek() == "")
    } finally server.stop(0)
  }

  test("jsonl splittable lane: ids and sections identical to wholetext, split-invariant") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_split")
    // two files; interior blank line, an invalid-JSON line, and an
    // empty-required-field line all SKIP but still consume their line id
    val f1 = (0 until 40).map {
      case 7 => ""                               // blank
      case 13 => "{not json at all"              // invalid
      case 21 => """{"q": "", "a": "orphan"}"""  // empty required field
      case i => s"""{"q": "question $i plus words", "a": "answer $i body text"}"""
    }
    val f2 = (0 until 5).map(i => s"""{"q": "f2 q$i", "a": "f2 a$i"}""")
    java.nio.file.Files.writeString(dir.resolve("part_a.jsonl"), f1.mkString("\n") + "\n")
    java.nio.file.Files.writeString(dir.resolve("part_b.jsonl"), f2.mkString("\n"))
    val cfg = graft.sources.JsonlSourceConfig("js", dir.toString + "/*.jsonl",
      anchorField = Some("q"), contextField = Some("a"))
    def canon(ds: org.apache.spark.sql.Dataset[graft.core.DataRecord]) =
      ds.collect().map(r => (r.id, r.sections.map(_.text))).toSeq.sortBy(_._1)
    val whole = canon(graft.sources.JsonlSource.read(spark, cfg))
    assert(whole.size == 42) // 37 + 5 valid lines
    assert(canon(graft.sources.JsonlSource.readSplittable(spark, cfg)) == whole)
    // force many tiny blocks: the prefix-sum reconstruction must be
    // split-geometry invariant
    spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    val tiny = try canon(graft.sources.JsonlSource.readSplittable(spark, cfg))
      finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    assert(tiny == whole)
    // skipped lines consumed ids: line 22 of part_a survives as line_22
    assert(whole.exists(_._1 == "js::part_a::line_22"))
    assert(!whole.exists(r => Seq("line_7", "line_13", "line_21").exists(r._1.endsWith)))
  }
}
