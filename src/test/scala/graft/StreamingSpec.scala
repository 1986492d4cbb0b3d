package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch/stream equivalence: the same transformations must produce the
  * same results from a parquet-backed stream as from the batch frame. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def eventsFixture(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // 3 users, deterministic µs timestamps spread over 2 days
    (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 37L * 60000L),
        (i % 3).toLong, if (i % 5 == 0) "purchase" else "click", (i % 7) * 1.25)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("windowed agg: streaming over parquet == batch") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val df = eventsFixture()
    df.write.mode("overwrite").parquet(dir)
    val batch = EventStreams.windowedAgg(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet

    val stream = EventStreams.windowedAgg(
      spark.readStream.schema(df.schema).parquet(dir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_agg_test").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("session windows: streaming over parquet == batch") {
    val dir = Files.createTempDirectory("graft_sess").toString
    val df = eventsFixture()
    df.write.mode("overwrite").parquet(dir)
    val batch = EventStreams.sessionAgg(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet
    val q = EventStreams.sessionAgg(spark.readStream.schema(df.schema).parquet(dir))
      .writeStream.outputMode("complete").format("memory").queryName("sess_test").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess_test").collect().map(_.toSeq).toSet == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.UserEvent]
    val totals = EventStreams.runningTotals(spark,
      input.toDS(), OutputMode.Update())
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("totals_test").start()
    try {
      input.addData(EventStreams.UserEvent(1L, 1L, 1.5), EventStreams.UserEvent(1L, 2L, 2.0))
      q.processAllAvailable()
      input.addData(EventStreams.UserEvent(1L, 3L, 0.25))
      q.processAllAvailable()
      val rows = spark.table("totals_test").as[EventStreams.UserTotal]
        .collect().filter(_.user_id == 1L)
      // last emitted state must reflect all 3 events
      assert(rows.map(_.n_events).max == 3L)
      assert(rows.map(_.value_e6).max == 3750000L)
    } finally q.stop()
  }

  test("FileStream: streamed corpus files == batch FileSource records") {
    import graft.sources.{FileSource, FileSourceConfig}
    val root = Files.createTempDirectory("graft_fstream")
    def put(rel: String, body: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes("UTF-8"))
    }
    put("src_a/2025-01-01/doc_one.txt", "Body one. Two sentences here.")
    put("src_a/2025-01-02/doc_two.txt", "Body two.")
    put("src_b/note_three.txt", "Body three.")
    val cfg = FileSourceConfig("fstr", root.toString)
    val batch = FileSource.read(spark, cfg).collect().map(_.id).toSet
    val q = FileSource.stream(spark, cfg).toDF()
      .writeStream.format("memory").queryName("fstream_test").start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      val streamed = spark.table("fstream_test").select("id").as[String].collect().toSet
      assert(streamed == batch)
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("streaming dedup: distinct content hashes == batch dedup") {
    val dir = Files.createTempDirectory("graft_dedup_stream").toString
    import spark.implicits._
    // 200 docs, every text duplicated across ~3 ids -> real dedup work
    val docs = (0 until 200).map(i => (i.toLong, s"text body number ${i % 70}"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val batch = EventStreams.dedupStream(spark.read.parquet(dir))
      .select("chash").collect().map(_.getLong(0)).toSet
    val q = EventStreams.dedupStream(spark.readStream.schema(docs.schema).parquet(dir))
      .select("chash")
      .writeStream.outputMode("append").format("memory").queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_test").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.size == 70)
    } finally q.stop()
  }

  test("streaming sampler: foreachBatch triplet batches == batch pipeline") {
    // the reference's FileStream → sampler path (SURVEY §2.1 #7): new
    // corpus files arrive as a stream, each micro-batch runs the SAME
    // declarative triplet plan. Because every choice is a pure function
    // of (seed, id), a micro-batch over file set F equals the batch run
    // over F — no cross-batch state to reconcile for same-file draws.
    import graft.operators.{TripletConfig, Triplets}
    val dir = Files.createTempDirectory("graft_docs_stream").toString
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      (i.toLong, s"src${i % 5}",
        (0 until 30).map(j => s"tok${(i * 31 + j * 7) % 97}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(dir)
    val cfg = TripletConfig()
    val expected = Triplets.tripletRows(spark.read.parquet(dir), cfg)
      .collect().map(_.toSeq).toSet
    val collected = scala.collection.mutable.Set[Seq[Any]]()
    val q = spark.readStream.schema(docs.schema).parquet(dir)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= Triplets.tripletRows(batch, cfg).collect().map(_.toSeq)
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(collected.toSet == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("streaming span-index refresh: arriving shards profile against the standing corpus") {
    // the incremental substring-dedup operator driven by Structured
    // Streaming: shard files arrive one micro-batch at a time; each
    // batch profiles against the docs already landed (the maintained
    // span index). Per the refresh-equivalence law, each micro-batch's
    // profile must equal the full-corpus profile restricted to that
    // batch's docs over (standing ∪ batch) — checked per batch.
    import graft.operators.Curation
    val dir = Files.createTempDirectory("graft_span_stream").toString
    import spark.implicits._
    val run = (1 to 20).map(i => s"sp$i").mkString(" ")
    def mkDocs(ids: Range) = ids.map(i =>
      (i.toLong, if (i % 4 == 0) run + s" tail$i"
        else (1 to 20).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    mkDocs(1 to 40).write.mode("overwrite").parquet(dir) // standing corpus
    new java.io.File(s"$dir/incoming").mkdirs()
    val schema = mkDocs(1 to 1).schema
    val landed = new java.util.concurrent.atomic.AtomicReference(
      spark.read.parquet(dir))
    val failures = scala.collection.mutable.Buffer[String]()
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/incoming")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val standing = landed.get()
          val inc = Curation.incrementalSpanProfile(
              batch, standing, "doc_id", "text", 15, 200000L)
            .collect().map(_.toSeq).toSet
          val ids = batch.select("doc_id").collect().map(_.getLong(0)).toSet
          val full = Curation.duplicateSpanProfile(
              standing.unionByName(batch), "doc_id", "text", 15, 200000L)
            .filter(org.apache.spark.sql.functions.col("doc_id")
              .isin(ids.toSeq: _*))
            .collect().map(_.toSeq).toSet
          if (inc != full) failures += s"batch $ids diverged"
          landed.set(standing.unionByName(batch).localCheckpoint())
        }
        ()
      }.start()
    try {
      // two shards arrive: one duplicating the standing run, one clean
      mkDocs(41 to 50).write.mode("append").parquet(s"$dir/incoming")
      q.processAllAvailable()
      mkDocs(51 to 60).write.mode("append").parquet(s"$dir/incoming")
      q.processAllAvailable()
      assert(failures.isEmpty, failures.mkString("; "))
      // the index genuinely grew across batches
      assert(landed.get().count() == 60L)
    } finally q.stop()
  }

  test("streaming sketch maintenance: per-shard CMS/Bloom merges equal the whole-corpus sketch") {
    // corpus-stats sketches maintained under Structured Streaming: each
    // arriving shard contributes a partial sketch; the standing state is
    // the MERGE (CMS cells add, Bloom words OR) — so the maintained
    // sketch equals the batch build over everything landed, which is the
    // property that lets a 100 TB deployment keep stats hot without
    // re-scanning the corpus per refresh.
    import graft.operators.Sketches
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sketch_stream").toString
    val docs = (0 until 240).map(i =>
      (i.toLong, (0 until 12).map(j => s"tk${(i * 13 + j * 5) % 301}").mkString(" ")))
      .toDF("doc_id", "text")
    docs.repartition(6).write.mode("overwrite").parquet(dir)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("elem"))
    val cmsParts = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val bloomParts = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        cmsParts ++= Sketches.cmsBuild(toks(b), "elem").collect().map(_.toSeq)
        bloomParts ++= Sketches.bloomBuild(toks(b), "elem").collect().map(_.toSeq)
        ()
      }.start()
    try {
      q.processAllAvailable()
      val mergedCms = cmsParts.map(s => (s(0), s(1)) -> s(2).asInstanceOf[Long])
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val batchCms = Sketches.cmsBuild(toks(docs), "elem").collect()
        .map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
      assert(mergedCms == batchCms, "shard-merged CMS != whole-corpus CMS")
      val mergedBloom = bloomParts.map(s => s(0) -> s(1).asInstanceOf[Long])
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).reduce(_ | _) }
      val batchBloom = Sketches.bloomBuild(toks(docs), "elem").collect()
        .map(r => r.get(0) -> r.getLong(1)).toMap
      assert(mergedBloom == batchBloom, "shard-OR'd Bloom != whole-corpus Bloom")
    } finally q.stop()
  }
}
