package graft

import org.scalatest.funsuite.AnyFunSuite

/** Live-network Hugging Face integration suite (reference:
  * tests/huggingface_integration.rs:1271-1400 — the `#[ignore]`d /
  * env-gated live tests against datasets-server + the hub CDN, with
  * `TRIPLETS_SKIP_LIVE_TESTS` opting CI jobs without secrets out,
  * src/constants.rs:41-50).
  *
  * Gate semantics here are INVERTED to opt-IN (`GRAFT_HF_LIVE_TESTS=1`
  * runs; anything else cancels) because this build environment has zero
  * egress — the default must be skipped-green, and the first networked
  * environment turns the suite on with one env var. Every canceled test
  * reports `canceled`, not `failed`, so `sbt test` stays green in the
  * sandbox. The same seams these tests exercise live are pinned hermetic
  * by SourcesSpec's loopback-HTTP fixtures (manifest fetch, seeded order,
  * resume, truncation heal, auth/retry policy, async expansion) — this
  * suite only re-verifies them against the real endpoints:
  * datasets-server's /parquet manifest, the hub's resolve CDN (redirect
  * chain), /info ClassLabel names, and token auth on a private repo.
  */
class HfLiveSpec extends AnyFunSuite {
  import graft.sources.{HfHttp, HfManifest, HfSourceList}

  private def live: Boolean =
    sys.env.get("GRAFT_HF_LIVE_TESTS").exists(_.trim.nonEmpty)
  private def gate(): Unit =
    assume(live, "live HF tests disabled (set GRAFT_HF_LIVE_TESTS=1 to run)")

  private lazy val spark = TestSpark.spark

  /** rotten_tomatoes: the reference's canonical small public dataset
    * (tests/huggingface_integration.rs:1273-1300). */
  private val PublicUri = "hf://cornell-movie-review-data/rotten_tomatoes/default/train"
  private def publicEntry = HfSourceList
    .parseLine(s"$PublicUri anchor=text source_id=hf_live source=hf_live")
    .toOption.flatten.getOrElse(fail(s"unparseable test URI: $PublicUri"))

  test("live: datasets-server manifest lists train parquet shards") {
    gate()
    val url = HfManifest.manifestUrl(publicEntry)
    val cands = HfManifest.parse(HfManifest.fetchManifest(url))
    assert(cands.nonEmpty, s"empty manifest from $url")
    assert(cands.forall(_.fileName.endsWith(".parquet")))
    // sizes are advertised — the resume/heal contract depends on them
    assert(cands.forall(_.expectedSize.exists(_ > 0L)))
  }

  test("live: shard download through the CDN redirect chain, then records") {
    gate()
    val cands = HfManifest.parse(
      HfManifest.fetchManifest(HfManifest.manifestUrl(publicEntry)))
    assume(cands.nonEmpty)
    val landing = java.nio.file.Files.createTempDirectory("graft_hf_live").toString
    val order = HfManifest.downloadOrder(cands, "hf_live", "7")
    // stable across re-derivation (the restart-resume law, live inputs)
    assert(order == HfManifest.downloadOrder(cands, "hf_live", "7"))
    val landed = HfManifest.download(order.head, landing)
    assert(java.nio.file.Files.size(landed) > 0L)
    order.head.expectedSize.foreach(sz =>
      assert(java.nio.file.Files.size(landed) == sz,
        "landed size != manifest size (truncated or re-encoded download)"))
    assert(HfManifest.incomplete(Seq(order.head), landing).isEmpty)
    val recs = HfManifest.readLanded(spark, landing, publicEntry)
    val sample = recs.limit(50).collect()
    assert(sample.nonEmpty)
    assert(sample.forall(_.source == "hf_live"))
    assert(sample.map(_.id).distinct.length == sample.length)
    assert(sample.forall(_.sections.exists(_.text.nonEmpty)))
  }

  test("live: /info ClassLabel names resolve integer labels to strings") {
    gate()
    // the reference resolves ClassLabel names from the datasets-server
    // info endpoint before mapping integers
    // (tests/huggingface_integration.rs:1345-1400); the repo keeps that
    // mapping in HfSourceList.resolveClassLabels(labels) and this test
    // closes the loop by pulling the live names
    val base = sys.env.getOrElse("GRAFT_HF_INFO_ENDPOINT",
      "https://datasets-server.huggingface.co/info")
    val url = s"$base?dataset=${java.net.URLEncoder.encode(publicEntry.dataset, "UTF-8")}" +
      s"&config=${publicEntry.config}"
    val in = HfHttp.openStream(url, HfHttp.fromEnv)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // labels live under features: [... {"name":"label","type":{"names":[...]}}]
    val names = """"names"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse(fail("no ClassLabel names in /info"))
    val labels = """"([^"]+)"""".r.findAllMatchIn(names).map(_.group(1)).toSeq
    assert(labels == Seq("neg", "pos"), s"unexpected labels: $labels")
    import spark.implicits._
    val mapped = HfSourceList.resolveClassLabels(
      Seq((0, "a"), (1, "b")).toDF("label", "text"), "label", labels)
      .select("label").as[String].collect().toSeq
    assert(mapped == Seq("neg", "pos"))
  }

  test("live: anonymous access to a private dataset fails fast with AuthException") {
    gate()
    val ds = sys.env.get("GRAFT_HF_PRIVATE_TEST_DATASET")
    assume(ds.nonEmpty,
      "set GRAFT_HF_PRIVATE_TEST_DATASET=org/name (a private repo) to run")
    val entry = HfSourceList
      .parseLine(s"hf://${ds.get}/default/train anchor=text source_id=priv")
      .toOption.flatten.get
    val url = HfManifest.manifestUrl(entry)
    val e = intercept[HfHttp.HttpStatusException] {
      HfManifest.fetchManifest(url, HfHttp.Policy(token = None))
    }
    assert(e.code == 401 || e.code == 403 || e.code == 404,
      s"private repo leaked anonymously: HTTP ${e.code}")
  }

  test("live: bearer token grants access to the private dataset") {
    gate()
    val ds = sys.env.get("GRAFT_HF_PRIVATE_TEST_DATASET")
    val tok = sys.env.get("HF_TOKEN").orElse(sys.env.get("HUGGING_FACE_HUB_TOKEN"))
      .map(_.trim).filter(_.nonEmpty)
    assume(ds.nonEmpty && tok.nonEmpty,
      "set GRAFT_HF_PRIVATE_TEST_DATASET and HF_TOKEN to run")
    val entry = HfSourceList
      .parseLine(s"hf://${ds.get}/default/train anchor=text source_id=priv")
      .toOption.flatten.get
    val cands = HfManifest.parse(HfManifest.fetchManifest(
      HfManifest.manifestUrl(entry), HfHttp.Policy(token = tok)))
    assert(cands.nonEmpty, "token-authorized manifest came back empty")
  }
}
