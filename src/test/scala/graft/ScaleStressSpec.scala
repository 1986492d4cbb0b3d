package graft

import graft.operators.{Dedup, TripletConfig, Triplets}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 40×-the-bench-corpus stress: the dedup signatures and the flagship
  * sampler must complete on 200k synthetic documents with the same plans
  * that run the 5k-row testdata — no collect-driven steps, no per-group
  * blowup. This is a smoke-level scale check (minutes would indicate a
  * plan regression; it runs in seconds).
  */
class ScaleStressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpus(n: Int, tokens: Int = 40) = {
    import spark.implicits._
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(200)).cast("string")).as("source"),
      // `tokens` tokens of varying, overlapping vocabulary
      concat_ws(" ", (0 until tokens).map(j =>
        concat(lit(s"w"), pmod(col("id") * (j + 7) + j, lit(997)).cast("string"))): _*).as("text"))
  }

  test("minhash + simhash signatures complete at 200k docs") {
    val docs = corpus(200000)
    assert(Dedup.minhashSignatures(docs, "doc_id", "text", 8, 3).count() == 200000L)
    assert(Dedup.simhashSignature(docs, "doc_id", "text", 16).count() == 200000L)
  }

  test("q28 simhash band dial: derived width keeps in-band candidates near-linear") {
    // the PRODUCTION dial (queries.DedupQueries.half28): band keys are
    // half28(n) bits, so expected band-key occupancy stays ~constant; a
    // fixed 8-bit band key (the pre-round-16 dial) grows in-band pairs
    // ~n²/256 — at this 10× step it reads ~100× the small count
    def bandPairs(n: Int): Long = {
      val half = graft.queries.DedupQueries.half28(n)
      val sig = Dedup.simhashSignature(corpus(n), "doc_id", "text", 2 * half)
      sig.select(explode(array(
          expr(s"struct(0L AS band, simhash div ${1L << half} AS key)"),
          expr(s"struct(1L AS band, simhash % ${1L << half} AS key)"))).as("bk"))
        .select(col("bk.band").as("band"), col("bk.key").as("key"))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) DIV 2")).cast("long")).collect()(0).getLong(0)
    }
    val small = bandPairs(5000)   // half28 = 9
    val big = bandPairs(50000)    // half28 = 12
    assert(small > 0 && big > 0)
    // simhash keys cluster (similar docs converge by construction), so
    // the envelope is looser than a uniform-hash dial's; the fixed-width
    // failure mode reads ~100× and must stay out
    assert(big < small * 40L,
      s"in-band candidates grew past the derived-width envelope: $small -> $big")
  }

  test("flagship triplet batch completes at 200k docs, split isolation holds") {
    val docs = corpus(200000)
    val t = Triplets.triplets(docs, TripletConfig()).cache()
    val n = t.count()
    assert(n > 150000L, s"unexpectedly few triplets: $n") // most anchors survive
    assert(t.filter(col("split") =!= col("nsplit")).count() == 0)
    t.unpersist()
  }

  test("bm25 negative backend completes at 200k docs (batch anchors, full pools)") {
    // anchors are a 1-in-100 batch; candidate pools, tf/df/stats stay
    // full-corpus — the production shape (never all-anchors-at-once)
    val docs = corpus(200000)
    val t = Triplets.tripletRowsBm25(docs, TripletConfig(), "bm25_wrong_article",
      expr("doc_id % 100 = 0"))
    val n = t.count()
    assert(n > 1500L, s"unexpectedly few bm25 triplets: $n")
  }

  test("date-preference staging completes at 200k docs") {
    val docs = corpus(200000)
    val t = Triplets.tripletRowsDatePreferred(docs, TripletConfig(),
      concat(lit("2025-03-0"), (pmod(col("doc_id"), lit(3)) + 1).cast("string")))
    val n = t.count()
    assert(n > 150000L, s"unexpectedly few date-preferred triplets: $n")
  }

  test("curation kit completes at 200k docs (contamination, packing, repetition)") {
    import graft.operators.Curation
    val docs = corpus(200000)
    // decontamination: a benchmark-sized eval set against the full corpus;
    // overlapping vocabulary guarantees real shingle-hash collisions
    val evalSet = docs.filter(col("doc_id") % 1000 === 0)
    val scan = Curation.contaminationScan(
      docs.filter(col("doc_id") % 1000 =!= 0), evalSet, "doc_id", "text", 3)
    assert(scan.count() == 199800L) // every train doc reported
    // boundary-splitting packing at a production-ish shard count: every
    // doc covered, sequences exact (spot-checked by the budget law on one shard)
    val packed = Curation.packSequencesSplit(docs, "doc_id", "text", 512L, 32, "s")
    assert(packed.select(sum(col("tok_end") - col("tok_start"))).head().getLong(0) == 200000L * 40)
    // repetition profile: one row per doc, linear two-agg plan
    assert(Curation.repetitionProfile(docs, "doc_id", "text").count() == 200000L)
  }

  test("kvp decoration completes at 200k docs x 3 draws (narrow, zero shuffle)") {
    import graft.functions.{KvpField, KvpPrefixSampler}
    val sampler = KvpPrefixSampler(0.5f, Seq(
      Seq(KvpField("lang", Seq("en", "de", "fr")), KvpField("src", Seq("web", "book"))),
      Seq(KvpField("year", Seq("2023", "2024")))))
    val docs = corpus(200000)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("draw", explode(sequence(lit(0L), lit(2L))))
    val dec = graft.operators.Decoration.decorateColumn(sampler,
      concat(col("doc_id").cast("string"), lit(":"), col("draw").cast("string")),
      col("toks"), maxWindowTokens = 12)
    assert(docs.select(dec("est").as("est")).filter(col("est") > 0).count() == 600000L)
  }

  test("sentence splitting completes at 100k docs (char explode stays keyed)") {
    // the most explosive plan in the engine: ~250 chars/doc -> 25M char
    // rows through one (doc, block)-keyed window; minutes here would mean
    // the window lost its key
    val docs = corpus(100000)
      .select(col("doc_id"), concat(col("text"),
        lit(". Tail 3.14 ok! Done? End.")).as("text"))
    val n = graft.functions.Sentences.sentenceRows(docs, "doc_id", "text").count()
    assert(n >= 300000L, s"unexpectedly few sentences: $n") // >= 3 per doc
  }

  test("sentence splitting survives a multi-MB single-block document (hybrid lane)") {
    import spark.implicits._
    // 200k ordinary docs PLUS one 2.5 MB document with no blank lines —
    // a single block. The prefix-sum lane would serialize ~2.5M char rows
    // onto ONE (doc, block) key; the oversized-block UDF lane must absorb
    // it in linear time. Wall bound is the straggler assertion: the big
    // doc adds one linear task, not a minutes-long hot key.
    val big = (1 to 250000).map(i => s"Sentence number $i runs here.").mkString(" ")
    assert(big.length > 2000000 && !big.contains("\n\n"))
    val docs = corpus(200000)
      .select(col("doc_id"), concat(col("text"), lit(". Tail ok! Done.")).as("text"))
      .unionByName(Seq((9999999L, big)).toDF("doc_id", "text"))
    val t0 = System.nanoTime()
    val perDoc = graft.functions.Sentences.sentenceRows(docs, "doc_id", "text")
      .groupBy(col("doc_id")).count()
    val bigCount = perDoc.filter(col("doc_id") === 9999999L)
      .collect()(0).getLong(1)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(bigCount == 250000L, s"big-doc sentences: $bigCount")
    assert(wall < 120.0, s"straggler: sentence hybrid took $wall s")
    // and the oversized lane is byte-identical to the pure function
    val bigRows = graft.functions.Sentences.sentenceRows(
        Seq((1L, big)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy(col("sent_idx")).collect().map(_.getString(2)).toSeq
    assert(bigRows == graft.functions.Sentences.sentences(big))
  }

  test("media decode completes at 200k payloads (narrow lane, real codecs)") {
    import spark.implicits._
    import graft.operators.{MediaCodecs, Multimodal}
    // 200k small PNGs synthesized AND decoded inside one mapPartitions
    // chain — the lane must stay shuffle-free end to end, and the real
    // inflate+de-filter walk must hold up at volume
    val media = spark.range(200000).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val px = (0 until 27).map(i => ((id * 31 + i * 17) % 256).toInt)
        Multimodal.MediaRow(id, "image/png",
          MediaCodecs.encodePng(3, 3, px, filterType = (id % 5).toInt), 3, 3)
      }).toDF()
    val decoded = Multimodal.extractDecoded(spark, media)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    val agg = decoded.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("png" -> 200000L), s"unexpected kinds: $agg")
  }

  test("gif + mp3 decode complete at 200k payloads (narrow lane)") {
    import spark.implicits._
    import graft.operators.{MediaCodecs, Multimodal}
    // alternating GIF rasters (LZW bit stream) and MP3 frame sequences —
    // both synthesized and decoded inside the same mapPartitions
    val media = spark.range(200000).as[Long]
      .mapPartitions(_.map { id =>
        if (id % 2 == 0) {
          val pal = Seq.tabulate(4)(p => (p * 60, p * 50, p * 40))
          val idx = Seq.tabulate(12)(i => ((id + i) % 4).toInt)
          Multimodal.MediaRow(id, "image/gif", MediaCodecs.encodeGif(4, 3, pal, idx), 4, 3)
        } else {
          Multimodal.MediaRow(id, "audio/mpeg",
            MediaCodecs.encodeMp3Frames(3 + (id % 5).toInt, 128, 44100, id % 3 == 0), 0, 0)
        }
      }).toDF()
    val decoded = Multimodal.extractDecoded(spark, media)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    val agg = decoded.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("gif" -> 100000L, "mp3" -> 100000L), s"unexpected kinds: $agg")
  }

  test("mp4 metadata decode completes at 200k payloads (narrow lane)") {
    import spark.implicits._
    import graft.operators.{MediaCodecs, Multimodal}
    // 200k synthesized MP4 box trees decoded through the real box walk
    // inside one mapPartitions — zero Exchange, like every codec lane
    val media = spark.range(200000).as[Long]
      .mapPartitions(_.map { id =>
        val tracks = MediaCodecs.Mp4Track(1L, "vide", (id % 1920).toInt + 16,
          (id % 1080).toInt + 16) +:
          (2 to (id % 3).toInt + 1).map(i => MediaCodecs.Mp4Track(i.toLong, "soun", 0, 0))
        Multimodal.MediaRow(id, "video/mp4",
          MediaCodecs.encodeMp4Meta(90000L, id % 100000L + 1L, tracks), 0, 0)
      }).toDF()
    val decoded = Multimodal.extractDecoded(spark, media)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    val agg = decoded.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("mp4" -> 200000L), s"unexpected kinds: $agg")
  }

  test("composed sampler batch completes at 200k-record pools (fused lanes)") {
    import graft.operators.{NegativeStrategy, Sampler, SamplerState, Selector, TripletRecipe}
    // the fused negative dispatch + multi-slot chunk pick against a
    // 200k-record, 200-source, dated pool: per-batch cost must stay
    // batch-bounded (seconds, not minutes), and every slot delivers
    val docs = corpus(200000)
    val chunks = docs.select(col("doc_id").as("record_id"), lit(0).as("section_idx"),
      lit("context").as("role"), lit("window").as("view_kind"),
      lit(0).as("window_index"), lit(0).as("overlap"), col("text").as("wtext"))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(0).as("section_idx"),
        lit("anchor").as("role"), lit("full").as("view_kind"),
        lit(0).as("window_index"), lit(0).as("overlap"),
        substring(col("text"), 1, 40).as("wtext")))
    val pool = docs.select(col("doc_id").as("id"), col("source"),
      concat(lit("2025-02-0"), (pmod(col("doc_id"), lit(5)) + 1).cast("string")).as("date"))
    val recipes = Seq(
      TripletRecipe("wa", Selector.RoleAnchor, Selector.RoleContext,
        NegativeStrategy.WrongArticle, weight = 0.5f),
      TripletRecipe("wd", Selector.RoleAnchor, Selector.RoleContext,
        NegativeStrategy.WrongPublicationDate, weight = 0.5f))
    val out = Sampler.nextBatch(spark, chunks, pool, recipes,
      SamplerState("stress", 0L, Map.empty), batch = 32)
    assert(out.rows.count() == 32L)
  }

  test("fallback tier completes at 50k single-record sources (exact-key probe)") {
    import graft.operators.{NegativeStrategy, Sampler, SamplerState, Selector, TripletRecipe}
    // every source holds ONE record, so every WrongArticle slot takes the
    // cross-source fallback tier: the fb pick must resolve through the
    // driver-side (srnk → source, count) order + an exact (source, rn)
    // sidecar key — batch-bounded even when the source COUNT (not just
    // the record count) is corpus-scale
    import spark.implicits._
    val docs = spark.range(50000).select(
      col("id").as("doc_id"),
      concat(lit("solo"), col("id").cast("string")).as("source"),
      concat_ws(" ", (0 until 24).map(j =>
        concat(lit("w"), pmod(col("id") * (j + 7) + j, lit(997)).cast("string"))): _*).as("text"))
    val chunks = docs.select(col("doc_id").as("record_id"), lit(0).as("section_idx"),
      lit("context").as("role"), lit("window").as("view_kind"),
      lit(0).as("window_index"), lit(0).as("overlap"), col("text").as("wtext"))
      .unionByName(docs.select(col("doc_id").as("record_id"), lit(0).as("section_idx"),
        lit("anchor").as("role"), lit("full").as("view_kind"),
        lit(0).as("window_index"), lit(0).as("overlap"),
        substring(col("text"), 1, 40).as("wtext")))
    val pool = docs.select(col("doc_id").as("id"), col("source"))
    val recipes = Seq(TripletRecipe("wa", Selector.RoleAnchor, Selector.RoleContext,
      NegativeStrategy.WrongArticle, weight = 1.0f))
    val out = Sampler.nextBatch(spark, chunks, pool, recipes,
      SamplerState("fbstress", 0L, Map.empty), batch = 32)
    val core = out.core.collect()
    assert(core.length == 32)
    // single-record sources ⇒ the lane is fb for every slot, and the
    // negative always comes from a DIFFERENT source than the anchor
    assert(core.forall(_.getAs[String]("lane") == "fb"))
    assert(core.forall(r => r.getAs[Long]("nid") != r.getAs[Long]("record_id")))
  }

  test("smooth-WRR drain stays counter-arithmetic at 10k sources x 5k slots") {
    // the drain loop is O(slots x sources) driver work over #sources
    // state — no Spark job at all; 50M steps must complete in seconds
    val srcs = (0 until 10000).map(i => (f"s$i%05d", (i % 7 + 1).toLong, 3L))
    val order = graft.operators.Mixing.smoothWrrDrain(srcs, 5000L)
    assert(order.size == 5000 && order.map(_._1).distinct.size > 1000)
  }

  test("substring dedup + budget selection + HLL complete at 100k docs (~4M spans)") {
    // the span stream is one hash per token position: 100k docs x 40
    // tokens ≈ 4M span rows (26 remaining positions each) — linear scan
    // work with a single map-side-combined count and a keyed window.
    // Every 100th doc is a verbatim duplicate-pair member, so the dup
    // lane carries real mass at this size.
    import spark.implicits._
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(100)) < 2,
        lit((1 to 40).map(j => s"dup$j").mkString(" ")))
        .otherwise(concat_ws(" ", (0 until 40).map(j =>
          concat(lit("w"), (col("id") * (j + 11) + j).cast("string"))): _*))
        .as("text"))
    val prof = graft.operators.Curation
      .duplicateSpanProfile(docs, "doc_id", "text", 15, 200000L)
    assert(prof.count() == 100000L)
    // exactly the planted 2-per-100 duplicates are fully covered
    assert(prof.filter(col("dup_tokens") === 40L).count() == 2000L)
    assert(prof.filter(col("keep") === 1L).count() == 98000L)
    val sel = graft.operators.Curation.budgetSelection(docs, "doc_id", "text", 300000L)
    assert(sel.count() == 100000L)
    val hll = graft.operators.Sketches.hllDistinct(
      docs.select(lit("all").as("group"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("elem")),
      "group", "elem")
    assert(hll.collect().head.getLong(1) > 1000000L) // ~3.9M distinct tokens
  }

  test("auto-pair stages complete at 200k docs (keyed windows only)") {
    // 80-token docs -> 3 context windows each, so Stage B keeps every record
    val docs = corpus(200000, tokens = 80)
    val ctx = graft.queries.RecipeQueries.contextChunks(docs)
    val pairs = graft.operators.Recipes.selectDistinctWindowPairs(ctx, nDraws = 2, seed = "st")
    val n = pairs.count()
    assert(n > 300000L, s"unexpectedly few auto pairs: $n") // ~200k records x 2 draws
    assert(pairs.filter(col("a_widx") === col("p_widx")).count() == 0)
  }

  test("sketch lanes complete at 8M elements (bounded outputs, pure aggregates)") {
    // 200k docs x 40 tokens = 8M elements through each sketch: outputs
    // stay bounded (<= 128 bloom words, <= 2048 cms cells, one HLL row
    // per group) regardless of input size — the whole point of the
    // sketch lanes at 100 TB.
    import graft.operators.Sketches
    val elems = corpus(200000)
      .select(col("source").as("group"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("elem"))
    assert(Sketches.bloomBuild(elems, "elem").count()
      <= Sketches.BloomBits / Sketches.BloomWordBits)
    assert(Sketches.cmsBuild(elems, "elem").count()
      <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val hll = Sketches.hllDistinct(elems, "group", "elem")
    assert(hll.count() == 200L) // one estimate per source group
    // vocabulary is 997 tokens spread over 200 sources; estimates must
    // be in a sane band, not degenerate
    assert(hll.filter(col("hll_est") < 1L).count() == 0)
  }

  test("persisted bm25 postings complete at 200k docs, query restriction stays bounded") {
    import graft.operators.{Bm25, Bm25Index}
    val idx = Bm25Index.build(corpus(200000), "doc_id", "text")
    val scored = Bm25.topK(
      Bm25Index.scores(spark, idx, Seq(1 -> "w3 w500 w996", 2 -> "w13 w77")), 5)
    assert(scored.count() == 10L)
  }

  test("PQ encode + ADC complete at 200k vectors (codes only, no corpus floats)") {
    import graft.operators.Pq
    // 200k synthetic 16-dim vectors (4 subspaces x 8 codewords): the code
    // table must come out one row per (vector, subspace) and the ADC scan
    // must stay a broadcast join + keyed sum at this width
    val emb = spark.range(200000).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 16), i -> CAST(pmod(id * i + i, 97) / 10.0 AS FLOAT))")
        .as("embedding"))
    val cb = Pq.codebook(emb, "vec_id", "embedding", 16, 4, 8).localCheckpoint()
    val codes = Pq.encode(emb, "vec_id", "embedding", 16, 4, cb)
    assert(codes.count() == 800000L)
    val adc = Pq.adcTables(emb.filter(col("vec_id") < 4), "vec_id", "embedding", 16, 4, cb)
    assert(Pq.adcScores(codes, adc).count() == 800000L)
  }

  test("WordPiece segmentation completes at 200k docs (broadcast vocab, narrow encode)") {
    import graft.operators.{Bpe, WordPiece}
    val docs = corpus(200000)
    val vocab = WordPiece.vocabTable(Bpe.wordCounts(docs, maxWords = 500), 8, 300)
      .select(col("piece"), col("mlen"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seg = WordPiece.segment(spark, docs, vocab, 8)
    assert(seg.count() == 200000L)
  }

  test("streaming intake: a shard lands against a 200k-doc standing corpus") {
    import graft.streaming.CorpusStream
    // batch 0 = the 200k standing corpus; batch 1 = a 2k shard of which
    // half are exact re-sends of standing docs (hash-dropped against the
    // store, never signature-joined) and half are novel. The incremental
    // shape is what's under test: the shard's band join drives from the
    // new side, so the transition completes at interactive latency even
    // with 200k standing signatures.
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ss_intake").toString
    val cfg = CorpusStream.IntakeConfig()
    // per-(id, j) pseudo-random tokens: texts are pairwise distinct and
    // share almost no shingles (the shared `corpus` generator cycles its
    // vocabulary mod 997, which would exact-collapse 200k docs to 997)
    def distinctCorpus(n: Int, prefix: String, idOffset: Long) =
      spark.range(n).select(
        (col("id") + idOffset).as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(200)).cast("string")).as("source"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit(prefix), pmod(col("id") * 1000003L + lit(j * 7919L),
            lit(1000000007L)).cast("string"))): _*).as("text"))
    val standing = distinctCorpus(200000, "w", 0L)
    val kept0 = CorpusStream.applyBatch(spark, standing, 0L, stateDir, cfg)
    // 8 permutations are a deliberately weak signature at 200k docs: a
    // handful of chance >= 6/8 agreements (LSH false positives) is
    // realistic and tolerated; wholesale collapse would mean a plan bug
    assert(kept0 >= 199900L && kept0 <= 200000L, s"kept0 = $kept0")
    val dup = standing.filter(col("doc_id") < 1000)
    val novel = distinctCorpus(1000, "n", 1000000L)
    val survived = CorpusStream.applyBatch(
      spark, dup.unionByName(novel), 1L, stateDir, cfg)
    // every exact re-send hash-drops against the store (never reaching
    // the signature join); the novel half survives minus chance collisions
    assert(survived >= 990L && survived <= 1000L, s"survived = $survived")
    assert(CorpusStream.corpus(spark, stateDir).get.count() == kept0 + survived)
  }

  test("flac + y4m decode complete at 100k payloads (narrow lane)") {
    import spark.implicits._
    import graft.operators.{Flac, MediaCodecs, Multimodal}
    // full PCM through the compressed container (encode = fixed-order-2
    // Rice, decode = the whole CRC-verified bit walk) plus raw-video
    // frame walks — both must stay shuffle-free object pipelines
    val media = spark.range(100000).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        if (id % 2 == 0) {
          val pcm = (0 until 96).map(i => (((id * 37 + i * 13) % 4001) - 2000).toInt)
          Multimodal.MediaRow(id, "audio/flac",
            Flac.encode(8000, 16, Seq(pcm), blockSize = 96, order = 2), 0, 0)
        } else {
          val fr = (0 until 3).map(f =>
            ((0 until 4).map(i => ((id + f * 31 + i) % 256).toInt),
              Seq(((id + f) % 256).toInt), Seq(((id + f + 7) % 256).toInt)))
          Multimodal.MediaRow(id, "video/y4m",
            MediaCodecs.encodeY4m(2, 2, 25, 1, "420jpeg", fr), 2, 2)
        }
      }).toDF()
    val decoded = Multimodal.extractDecoded(spark, media)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    val agg = decoded.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("flac" -> 50000L, "y4m" -> 50000L), s"unexpected kinds: $agg")
  }

  test("bounded harmonic centrality completes at 200k nodes (sparse web graph)") {
    import spark.implicits._
    import graft.operators.LinkGraph
    // 200k hosts, ~600k hash-derived edges (out-degree 3, power-law-ish
    // target skew via the modulo square): three hops of sparse
    // join+anti-join must complete with per-hop lineage cuts holding
    // the plans flat
    val nodes = spark.range(200000).select(concat(lit("h"), col("id")).as("node"))
    val edges = spark.range(200000).select(col("id"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("k"))
      .select(concat(lit("h"), col("id")).as("src"),
        concat(lit("h"), pmod(col("id") * 2654435761L + col("k") * 40503L,
          when(pmod(col("id"), lit(10L)) < 7, lit(1000L)) // 70% into a hot head
            .otherwise(lit(200000L))).cast("string")).as("dst"))
    val h = LinkGraph.boundedHarmonic(nodes, edges, 3)
    assert(h.count() == 200000L)
    // the hot head must dominate the prior: top node by h_e6 is a head node
    val top = h.orderBy(col("h_e6").desc).limit(1).collect()(0)
    assert(top.getString(0).stripPrefix("h").toLong < 1000L)
  }

  test("warc parse completes at a 20k-record archive (single-file walk)") {
    import graft.sources.WarcSource
    import graft.sources.WarcSource.WarcRecord
    // one segment with 20k response records (~2 MB): the sequential
    // record walk within a file must stay linear; parallelism at scale
    // comes from the many-segments binaryFile scan
    val recs = (0 until 20000).map(i =>
      WarcRecord("response", s"http://s$i.example.com/p$i", "2025-01-01T00:00:00Z",
        s"<urn:uuid:$i>", 200, "text/html", s"body $i " + ("x" * 64)))
    val bytes = WarcSource.gzip(WarcSource.encode(recs))
    val (got, skipped) = WarcSource.parse(bytes)
    assert(skipped == 0 && got.size == 20000 && got(19999).targetUri.endsWith("p19999"))
  }

  test("warc STREAMING walk at 20k records: == whole-buffer, window stays record-bounded") {
    import graft.sources.WarcSource
    import graft.sources.WarcSource.WarcRecord
    // bounded-memory contract: with a 4 KiB read chunk and a 64 KiB
    // record cap, a 20k-record (~2 MB inflated) archive must stream
    // through without the cap ever binding — the compacting window holds
    // one record, not the file (the gunzipAll retirement argument at a
    // 1 GB segment, shrunk to spec scale)
    val recs = (0 until 20000).map(i =>
      WarcRecord("response", s"http://s$i.example.com/p$i", "2025-01-01T00:00:00Z",
        s"<urn:uuid:$i>", 200, "text/html", s"body $i " + ("x" * 64)))
    val bytes = WarcSource.gzip(WarcSource.encode(recs))
    val it = WarcSource.parseStreaming(
      new java.io.ByteArrayInputStream(bytes), maxRecord = 64 * 1024, chunk = 4096)
    var n = 0
    var last: WarcRecord = null
    it.foreach { r => n += 1; last = r }
    assert(n == 20000 && last.targetUri.endsWith("p19999"))
  }

  // ---- 10× growth bounds for the embedding/fingerprint dedup family:
  // the candidate-pair count (the input to every near-dup self-join) must
  // grow near-linearly when the corpus grows 10×, because the blocking
  // dial scales with n. A fixed-width dial grows pairs ~quadratically —
  // these bounds are what the scale-parameterized dials exist to pass.

  private def synthEmb(n: Int) = spark.range(n).select(
    col("id").as("vec_id"),
    expr("transform(sequence(1, 64), i -> " +
      "CAST((pmod(id * (i * 31 + 7) + i * i, 2001) - 1000) / 1000.0 AS FLOAT))")
      .as("embedding"))

  test("q95 LSH dial: candidate pairs grow near-linearly at 10x vectors") {
    import graft.operators.Similarity
    def candPairs(n: Int): Long = {
      val planes = graft.queries.SimilarityQueries.planes95(n)
      Similarity.lshBucketTable(spark, synthEmb(n), "vec_id", "embedding", 64, planes)
        .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) DIV 2")).cast("long")).collect()(0).getLong(0)
    }
    val small = candPairs(2000)  // planes95(2000) = 7
    val big = candPairs(20000)   // planes95(20000) = 11
    assert(small > 0 && big > 0)
    // fixed 2^5 buckets would grow in-bucket pairs ~100× here; the
    // occupancy-stable dial keeps the growth within ~2× of linear
    assert(big < small * 20L,
      s"candidate pairs grew superlinearly under the dial: $small -> $big")
  }

  test("q152 SemDeDup shape: the √n cell dial keeps pair AND assignment work at n^1.5") {
    import graft.operators.Similarity
    // the PRODUCTION dial (queries.SimilarityQueries.cells152): k ≈ √n
    // power-of-two balances assignment (n·k dots) against in-cell pairs
    // (n·cellsize/2) — both grow n^1.5, so a decade of rows costs ~31.6×
    // the pair work, never the ~100× a fixed cell count degenerates to
    // (q152 ran k=8 fixed until the round-16 decade smoke widened)
    def cellPairs(n: Int): Long = {
      val k = graft.queries.SimilarityQueries.cells152(n)
      val cents = Similarity.ivfCentroids(synthEmb(n), "vec_id", "embedding", k)
      Similarity.ivfAssign(synthEmb(n), "vec_id", "embedding", cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) DIV 2")).cast("long")).collect()(0).getLong(0)
    }
    val small = cellPairs(2000)  // cells152 = 64
    val big = cellPairs(20000)   // cells152 = 256
    assert(small > 0 && big > 0)
    // n^1.5 envelope: ideal 31.6×, slack for assignment skew; a fixed
    // cell count reads ~100× here and must fail
    assert(big < small * 45L,
      s"in-cell pairs grew past the n^1.5 envelope of the √n dial: $small -> $big")
    assert(big > small * 10L,
      s"pair growth implausibly sub-linear — is the dial still scale-derived? $small -> $big")
  }

  test("q124/q126 fingerprint band join: 16-bit band keys keep 10x candidates bounded") {
    // the dHash/audio band table's scale contract without the codec lane:
    // 4 bands × 16-bit keys over hash-spread fingerprints — at 200k
    // fingerprints (10× the 20k refresh shard) the banded self-join's
    // candidate count must stay ~n·occupancy, far below n²
    def bandPairs(n: Int): Long = {
      val banded = spark.range(n).select(col("id").as("doc_id"),
          expr("abs(hash(CAST(id AS STRING), 'fp-hi'))").cast("long").as("hi"),
          expr("abs(hash(CAST(id AS STRING), 'fp-lo'))").cast("long").as("lo"))
        .select(col("doc_id"), explode(array(
          expr("struct(0L AS band, lo & 65535 AS key)"),
          expr("struct(1L AS band, shiftright(lo, 16) & 65535 AS key)"),
          expr("struct(2L AS band, hi & 65535 AS key)"),
          expr("struct(3L AS band, shiftright(hi, 16) & 65535 AS key)"))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) DIV 2")).cast("long")).collect()(0).getLong(0)
    }
    val small = bandPairs(20000)
    val big = bandPairs(200000)
    // 4 bands × 65536 keys: expected pairs ≈ 4·n²/2^17 — quadratic in
    // principle, but the key space keeps absolute candidate counts tiny
    // through this scale (the production dial adds band WIDTH, not count,
    // past ~1M items); the bound documents where the cliff would start
    assert(big > 0 && big < 4L * 200000L * 8L,
      s"banded candidates blew past the occupancy envelope: $small -> $big")
  }
}
