package graft

import graft.core.Tables
import graft.ml._
import graft.operators.{TripletConfig, Triplets}
import org.apache.spark.ml.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** The MLlib-pipeline composition path: stages chain as a standard
  * `Pipeline` and produce exactly what the operator kit produces. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bucketed join runs with no shuffle exchange and no sort on either side") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q09_bucketed_join")(spark, dir)
    df.count() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    // the ONLY exchange allowed is the final group-by aggregation — the
    // join reads both bucketed tables pre-partitioned, so NOTHING shuffles
    // for the join itself. (A per-bucket in-memory Sort remains: Spark 3+
    // intentionally ignores sortBy metadata at scan time — the legacy
    // bucketedTableScan.outputOrdering flag is off for correctness — and
    // that sort is per-bucket streaming work, not a shuffle.)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"bucketed join should not shuffle (got $exchanges exchanges):\n$plan")
  }

  test("salted skew join spreads the hot key: join keys carry the salt") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q16_salted_skew_join")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected the forced shuffle join:\n$plan")
    val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin")).get
    assert(joinLine.contains("salt"), s"join keys must include the salt:\n$joinLine")
  }

  test("corpus -> stats -> quality gate -> split -> triplets as one Pipeline") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pipeline = new Pipeline().setStages(Array(
      new TextStats(),
      new QualityFilter(minTokens = 12),
      new SplitAssigner(),
      new TripletSamplerStage()))
    val out = pipeline.fit(docs).transform(docs)
    assert(out.columns.contains("a_hash") && out.columns.contains("weight_e6"))
    val n = out.count()
    assert(n > 0)
    // pipeline result == direct operator result (the quality gate at
    // minTokens matches TripletConfig.minTokens, digit-free corpus)
    val direct = Triplets.tripletRows(docs, TripletConfig()).count()
    assert(n == direct)
  }

  test("every negative lane is reachable from the MLlib facade") {
    import graft.ml.SamplerLane
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val date = concat(lit("2025-01-0"),
      (pmod(graft.core.Determinism.seeded("day", col("doc_id")), lit(3)) + 1).cast("string"))
    val bm = new TripletSamplerStage(lane = SamplerLane.Bm25()).transform(docs)
    assert(bm.columns.contains("lane") && bm.count() > 0)
    val dp = new TripletSamplerStage(lane = SamplerLane.DatePreferred(date)).transform(docs)
    assert(dp.columns.contains("lane") && dp.count() > 0)
    val wd = new TripletSamplerStage(lane = SamplerLane.WrongDate(date)).transform(docs)
    assert(wd.count() > 0)
    val fb = new TripletSamplerStage(lane = SamplerLane.WithFallback).transform(docs)
    assert(fb.count() > 0)
    val na = new TripletSamplerStage(lane = SamplerLane.NegativeAnchor()).transform(docs)
    assert(na.count() > 0)
    val sampler = graft.functions.KvpPrefixSampler(0.5f, Seq(
      Seq(graft.functions.KvpField("lang", Seq("en", "de")))))
    val dec = new TripletSamplerStage(lane = SamplerLane.Decorated(sampler)).transform(docs)
    assert(dec.columns.contains("a_dec") && dec.count() > 0)
  }

  test("curation pipeline: dedup -> decontaminate -> LM-score -> budget as one Pipeline") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val isEval = pmod(graft.core.Determinism.seeded("ev", col("doc_id")), lit(20L)) === 0L
    val train = docs.filter(!isEval)
    val evalSet = docs.filter(isEval)
    // fit the LM on the in-domain slice, then chain filters + the fitted
    // model as one Pipeline (all stages are Transformers after fit)
    val lm = new NgramLmEstimator().fit(train.filter(col("source") === "src0"))
    val pipeline = new Pipeline().setStages(Array(
      new SubstringDedupFilter(),
      new DecontaminationFilter(evalSet),
      lm,
      new BudgetSelector(fracE6 = 500000L)))
    val out = pipeline.fit(train).transform(train)
    assert(out.columns.contains("avg_cost_e6"))
    val n = out.count()
    assert(n > 0 && n < train.count(), "curation pipeline must drop something")
    // facade == operator kit composed directly
    val direct = {
      val d1 = new SubstringDedupFilter().transform(train)
      val d2 = new DecontaminationFilter(evalSet).transform(d1)
      graft.operators.Curation.budgetSelection(d2, "doc_id", "text", 500000L)
        .filter(col("kept") === 1L)
    }
    assert(n == direct.count())
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == direct.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("subword tokenizer stage: all four scheme variants fit and count pieces") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(60)
    for (scheme <- Seq(SubwordScheme.Bpe, SubwordScheme.WordPiece,
        SubwordScheme.Unigram, SubwordScheme.UnigramSoft)) {
      val model = new SubwordTokenizerEstimator(scheme).fit(docs)
      val out = model.transform(docs)
      assert(out.columns.contains("n_pieces"), s"$scheme")
      assert(out.count() == 60L, s"$scheme keeps every row")
      // subword pieces are never fewer than whitespace words on non-blank docs
      val bad = out
        .withColumn("n_words", graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
        .filter(col("n_pieces") < col("n_words")).count()
      assert(bad == 0L, s"$scheme produced fewer pieces than words")
    }
    // facade == operator kit: the BPE stage reproduces Bpe.pieceCounts
    val wc = graft.operators.Bpe.wordCounts(docs, maxWords = 300)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val direct = graft.operators.Bpe.pieceCounts(spark, docs,
        graft.operators.Bpe.train(wc, nMerges = 60))
      .select("doc_id", "n_pieces").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val staged = new SubwordTokenizerEstimator(SubwordScheme.Bpe).fit(docs)
      .transform(docs).select("doc_id", "n_pieces")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(staged == direct)
  }

  test("ivf-pq facade: transform and search match the operator kit bit-for-bit") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Pq, Similarity}
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, sf, "embeddings")
    val (dim, ivfK, m, ks, nprobe, k) = (64, 8, 8, 8, 2, 5)

    val model = new IvfPqIndexer("vec_id", "embedding", dim, ivfK, m, ks).fit(emb)
    val encoded = model.transform(emb).cache()

    // operator-kit expected: assign + residual encode
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", ivfK).localCheckpoint()
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val resid = emb.join(assign, "vec_id")
      .join(broadcast(cents.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col("vec_id"),
        zip_with(col("embedding").cast("array<double>"), col("cemb").cast("array<double>"),
          (x, y) => x - y).cast("array<float>").as("_resid"))
      .localCheckpoint()
    val cb = Pq.codebook(resid, "vec_id", "_resid", dim, m, ks).localCheckpoint()
    val codes = Pq.encode(resid, "vec_id", "_resid", dim, m, cb)

    // cell parity
    val cellsF = encoded.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellsK = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellsF == cellsK)
    // code parity (facade array order = subspace order)
    val codesF = encoded.select(col("vec_id"), col("pq_codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val codesK = codes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3).toVector }
    assert(codesF == codesK)

    // search parity against the q122-shape residual ADC pipeline
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val got = model.search(encoded, q, "qid", "qemb", nprobe, k)
      .select(col("qid"), col("id"), col("adist"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val probes = Similarity.ivfProbes(q, "qid", "qemb", cents, nprobe)
      .select(col("qid"), col("cell"))
    val subN = dim / m
    val qslices = (0 until m).map(j =>
      struct(lit(j.toLong).as("m"), slice(col("qres"), j * subN + 1, subN).as("semb")))
    val adc = probes.join(q, "qid")
      .join(broadcast(cents.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col("qid"), col("cell"),
        zip_with(col("qemb").cast("array<double>"), col("cemb").cast("array<double>"),
          (x, y) => x - y).cast("array<float>").as("qres"))
      .select(col("qid"), col("cell"), explode(array(qslices: _*)).as("sl"))
      .join(broadcast(cb), col("sl.m") === col("m"))
      .select(col("qid"), col("cell"), col("m"), col("code"),
        Pq.distE3(col("sl.semb"), col("cemb")).as("d"))
    val want = codes
      .join(assign.select(col("vec_id").as("aid"), col("cell")), col("id") === col("aid"))
      .drop("aid")
      .join(broadcast(probes), "cell")
      .filter(col("id") =!= col("qid"))
      .join(broadcast(adc), Seq("qid", "cell", "m", "code"))
      .groupBy(col("qid"), col("id")).agg(sum(col("d")).as("adist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("adist"), col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    encoded.unpersist()
  }

  test("ivf-pq index save/load round-trip: encode + search bit-identical; corrupt meta surfaces") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, sf, "embeddings")
    val (dim, ivfK, m, ks, nprobe, k) = (64, 8, 8, 8, 2, 5)
    val model = new IvfPqIndexer("vec_id", "embedding", dim, ivfK, m, ks).fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/ix"
    model.save(spark, dir)
    val loaded = IvfPqModel.load(spark, dir)

    // the LOADED index must encode and search byte-for-byte like the
    // fitted one — including over a NEW shard (transform against fixed
    // codebooks is the incremental-add path)
    val shard = emb.filter(col("vec_id") % 3 === 0)
    def enc(mm: IvfPqModel) = mm.transform(shard)
      .select(col("vec_id"), col("cell"), col("pq_codes")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toVector)).toSet
    assert(enc(loaded) == enc(model))
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val encodedAll = model.transform(emb).localCheckpoint()
    def hits(mm: IvfPqModel) = mm.search(encodedAll, q, "qid", "qemb", nprobe, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(hits(loaded) == hits(model))
    assert(hits(loaded).nonEmpty)

    // absent and corrupt stores surface loudly (never silent retrain)
    intercept[IllegalArgumentException] { IvfPqModel.load(spark, dir + "_nope") }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/meta.json"), """{"id_col":"vec_id"}""")
    intercept[RuntimeException] { IvfPqModel.load(spark, dir) }
  }

  test("tokenizer save/load round-trip: piece counts bit-identical for all schemes") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents").limit(60).cache()
    for (scheme <- Seq(SubwordScheme.Bpe, SubwordScheme.WordPiece,
        SubwordScheme.Unigram, SubwordScheme.UnigramSoft)) {
      val model = new SubwordTokenizerEstimator(scheme).fit(docs)
      val dir = java.nio.file.Files.createTempDirectory("graft_tok").toString + "/tok"
      model.save(spark, dir)
      val loaded = SubwordTokenizerModel.load(spark, dir)
      def counts(m: SubwordTokenizerModel) = m.transform(docs)
        .select(col("doc_id"), col("n_pieces")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts(loaded) == counts(model), s"round-trip drift for $scheme")
    }
    docs.unpersist()
    intercept[IllegalArgumentException] {
      SubwordTokenizerModel.load(spark, "/tmp/graft_tok_nope")
    }
  }

  test("ngram-lm save/load round-trip: scores bit-identical") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents").limit(80).cache()
    val model = new NgramLmEstimator().fit(docs.filter(col("doc_id") % 2 === 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString + "/lm"
    model.save(dir)
    val loaded = NgramLmModel.load(spark, dir)
    def scores(m: NgramLmModel) = m.transform(docs)
      .select(col("doc_id"), col("avg_cost_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s0 = scores(model)
    assert(scores(loaded) == s0 && s0.nonEmpty)
    docs.unpersist()
  }

  test("transformSchema declares the stage outputs") {
    val schema = new TextStats().transformSchema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(schema.fieldNames.contains("n_tokens"))
    assert(schema.fieldNames.contains("digit_ratio"))
  }
}
