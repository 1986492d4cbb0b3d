package graft.sources

import graft.functions.Kvp
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The Hugging-Face shard pipeline seam (reference: manifest walk
  * huggingface_source.rs:1735-1820, download ordering contract 860-900,
  * background expansion 4354-4421, disk cap 567-569). All deterministic
  * decisions are pure functions over an (optionally pre-fetched) manifest
  * JSON and an on-disk landing directory; [[fetchManifest]]/[[download]]
  * are standard-library HTTP legs under the [[HfHttp]] auth +
  * retry/backoff policy (Bearer token, bounded exponential backoff on
  * 429/5xx, fail-fast 401/403), with [[manifestUrl]] building the
  * datasets-server endpoint (env-overridable, the reference's contract);
  * everything is exercised e2e against a loopback fixture server in
  * SourcesSpec, since this sandbox has zero egress. The owned
  * decisions:
  *
  *   - candidate extraction: `parquet_files[].url` filtered by accepted
  *     extensions, sorted + deduped, with expected sizes — so position N
  *     always maps to the same shard regardless of cache state;
  *   - download order: a seed-derived permutation of the sorted manifest
  *     (stable for a given (sourceId, seed, manifest), exactly the
  *     reference's `remote_candidate_order` contract);
  *   - cache reconciliation: the next position to download is the first
  *     uncached one; a cached file whose size mismatches the manifest is
  *     incomplete and must be re-fetched;
  *   - disk cap: evict least-recently-modified shards until under cap.
  *
  * Landed shards are then read by Spark's parquet scan and mapped via
  * [[HfSourceList.toRecords]] (stable per-file metadata ids).
  */
object HfManifest {

  case class ShardCandidate(url: String, expectedSize: Option[Long]) {
    /** Path part with any query/fragment suffix stripped. */
    private def path: String = url.takeWhile(c => c != '?' && c != '#')
    def fileName: String = path.substring(path.lastIndexOf('/') + 1)
    /** Landing-dir file name, URL-hash-prefixed: distinct shard URLs
      * sharing a basename (different config/split directories) must never
      * collide on disk — a collision would make the reconcile loop treat
      * an unfetched shard as cached (or clobber a good one as
      * "incomplete"). */
    def landedName: String =
      f"${graft.plans.PortableHash32.hash(org.apache.spark.unsafe.types.UTF8String.fromString(url))}%08x" +
        s"_$fileName"
    private[sources] def extension: Option[String] = {
      val dot = path.lastIndexOf('.')
      if (dot < 0) None else Some(path.substring(dot + 1).toLowerCase)
    }
  }

  val DefaultExtensions: Set[String] = Set("parquet")

  /** Extract shard candidates from a datasets-server parquet manifest.
    * The array bounds are found with a string-aware bracket scan (a `]`
    * inside a url must not end the array); entries are flat objects;
    * non-matching extensions (query/fragment suffixes stripped) are
    * skipped; result is sorted by url and deduped (first size wins) —
    * the reference's exact normalization (candidates.sort(); dedup()). */
  def parse(json: String, accepted: Set[String] = DefaultExtensions): Seq[ShardCandidate] = {
    val keyIdx = json.indexOf("\"parquet_files\"")
    if (keyIdx < 0) return Nil
    val open = json.indexOf('[', keyIdx)
    if (open < 0) return Nil
    var i = open; var depth = 0; var inStr = false; var end = -1
    while (i < json.length && end < 0) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return Nil
    val arr = json.substring(open + 1, end)
    val objs = """\{[^{}]*\}""".r.findAllIn(arr).toSeq
    val cands = objs.flatMap { o =>
      val url = """"url"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(o).map(_.group(1))
      val size = """"size"\s*:\s*(\d+)""".r.findFirstMatchIn(o).map(_.group(1).toLong)
      url.map(u => ShardCandidate(u, size))
        .filter(_.extension.exists(accepted.contains))
    }
    cands.groupBy(_.url).map { case (_, g) => g.head }.toSeq.sortBy(_.url)
  }

  /** Seed-derived download order over the sorted manifest: position N for
    * seed S always resolves to the same shard, independent of cache
    * state (reference contract, huggingface_source.rs:860-866). */
  def downloadOrder(cands: Seq[ShardCandidate], sourceId: String, seed: String): Seq[ShardCandidate] =
    new Kvp.DetRng(s"hf-shards:$sourceId:$seed").shuffle(cands)

  private def target(landingDir: String, c: ShardCandidate): Path =
    Paths.get(landingDir, c.landedName)

  /** First position in the download order whose shard is not yet landed —
    * the reference's `first_uncached_order_position`. None = all landed. */
  def firstUncached(order: Seq[ShardCandidate], landingDir: String): Option[Int] = {
    val i = order.indexWhere(c => !Files.exists(target(landingDir, c)))
    if (i < 0) None else Some(i)
  }

  /** Landed shards whose on-disk size mismatches the manifest — stale or
    * incomplete downloads that must be deleted and re-fetched
    * (reference: huggingface_source.rs:1786-1806). */
  def incomplete(order: Seq[ShardCandidate], landingDir: String): Seq[ShardCandidate] =
    order.filter { c =>
      val t = target(landingDir, c)
      Files.exists(t) && c.expectedSize.exists(_ != Files.size(t))
    }

  /** Shards to evict (least-recently-modified first) until the landing
    * dir fits under `capBytes` (reference disk cap, :567-569). Pure
    * decision — deletion is the caller's. */
  def evictionPlan(landingDir: String, capBytes: Long): Seq[Path] = {
    val dir = Paths.get(landingDir)
    if (!Files.isDirectory(dir)) return Nil
    val files = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        // skip dot-prefixed in-flight temp files: evicting a shard that is
        // mid-download would corrupt the publish it is about to make
        s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith(".")).toList
      } finally s.close()
    }
    var total = files.map(Files.size).sum
    val byAge = files.sortBy(p => (Files.getLastModifiedTime(p).toMillis, p.toString))
    val evict = Seq.newBuilder[Path]
    val it = byAge.iterator
    while (total > capBytes && it.hasNext) {
      val p = it.next()
      evict += p
      total -= Files.size(p)
    }
    evict.result()
  }

  /** The datasets-server parquet-manifest URL for an entry (reference:
    * constants.rs:282-306 default endpoint + env override;
    * huggingface_source.rs query assembly — the `split` param is OMITTED
    * in all-splits mode so the server returns every split's shards).
    * Query values are URL-encoded; the base endpoint can be overridden
    * per call or via `GRAFT_HF_PARQUET_ENDPOINT` (test doubles,
    * on-premises mirrors — the reference's env-override contract). */
  def manifestUrl(entry: HfSourceEntry,
      endpointOverride: Option[String] = None): String = {
    val base = endpointOverride
      .orElse(sys.env.get("GRAFT_HF_PARQUET_ENDPOINT").map(_.trim).filter(_.nonEmpty))
      .getOrElse("https://datasets-server.huggingface.co/parquet")
    def enc(v: String) = java.net.URLEncoder.encode(v, "UTF-8")
    val q = Seq("dataset" -> entry.dataset, "config" -> entry.config) ++
      (if (entry.split.nonEmpty) Seq("split" -> entry.split) else Nil)
    base + "?" + q.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** Fetch the manifest JSON (reference: huggingface_source.rs:1735-1760
    * datasets-server GET; URL from [[manifestUrl]]) under the [[HfHttp]]
    * auth + retry/backoff policy (Bearer token when configured; 429/5xx
    * retried with bounded exponential backoff; 401/403 fail fast) —
    * exercised e2e against a loopback fixture server in SourcesSpec. */
  def fetchManifest(url: String, policy: HfHttp.Policy): String = {
    val in = HfHttp.openStream(url, policy)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def fetchManifest(url: String): String = fetchManifest(url, HfHttp.fromEnv)

  /** Download one shard into the landing dir under its [[ShardCandidate.landedName]],
    * temp-then-publish: the reconcile loop treats file EXISTENCE as
    * landed, so a partially-written shard must never appear under the
    * final name (reference download path: huggingface_source.rs:4424-4480;
    * same atomic-publish contract as FileSplitStore). The temp name is
    * dot-prefixed so Spark's file index skips it as hidden: a parquet scan
    * of the landing dir stays valid WHILE a download is in flight — the
    * property [[ShardExpander]]'s readers rely on. Returns the landed
    * path. */
  def download(c: ShardCandidate, landingDir: String, policy: HfHttp.Policy): Path = {
    val t = target(landingDir, c)
    if (t.getParent != null) Files.createDirectories(t.getParent)
    val tmp = t.resolveSibling("." + t.getFileName.toString + ".part")
    val in = HfHttp.openStream(c.url, policy)
    try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    Files.move(tmp, t, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    t
  }

  def download(c: ShardCandidate, landingDir: String): Path =
    download(c, landingDir, HfHttp.fromEnv)

  /** Read every landed shard of the directory and map to records —
    * Spark's vectorized parquet scan + [[HfSourceList.toRecords]] (ids
    * from (file, row_index) metadata, or the entry's id column). */
  def readLanded(spark: org.apache.spark.sql.SparkSession, landingDir: String,
      entry: HfSourceEntry): org.apache.spark.sql.Dataset[graft.core.DataRecord] =
    HfSourceList.toRecords(spark, spark.read.parquet(landingDir), entry)
}
