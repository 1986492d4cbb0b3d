package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Tables}
import graft.operators.Multimodal
import graft.sources._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Source-layer and multimodal demonstrations. The CSV/file-corpus queries
  * materialize tiny deterministic fixtures under /tmp and verify the full
  * read→record mapping against literal VALUES oracles — exact expected
  * rows, not just row counts.
  */
object SourceQueries extends QueryModule {

  private val FixDir = "/tmp/graft_fixtures"

  private def ensureWarcFixture(): String = {
    import graft.sources.WarcSource.WarcRecord
    val root = Paths.get(FixDir, "warc")
    Files.createDirectories(root)
    val recs = Seq(
      WarcRecord("warcinfo", "", "2025-03-01T00:00:00Z", "<urn:uuid:info1>",
        0, "", "software: graft-fixture\r\n"),
      WarcRecord("response",
        "HTTPS://WWW.Example5.co.uk:443/a/b/?utm_source=x&b=2&a=1#f",
        "2025-03-01T10:00:00Z", "<urn:uuid:r1>", 200, "text/html",
        "Hello crawl one."),
      WarcRecord("request", "https://www.example5.co.uk/a/b/",
        "2025-03-01T10:00:00Z", "<urn:uuid:q1>", 0, "", "GET /a/b/ HTTP/1.1\r\n"),
      WarcRecord("response", "http://news.example9.com:80/story?id=7",
        "2025-03-02T11:30:00Z", "<urn:uuid:r2>", 404, "text/plain",
        "Missing page."),
      WarcRecord("response", "https://blog.site3.io/post/",
        "2025-03-03T09:15:00Z", "<urn:uuid:r3>", 200, "text/html",
        "Another page body."))
    Files.write(root.resolve("seg0.warc"), graft.sources.WarcSource.encode(recs))
    root.toString
  }

  /** The q148 archive: 200 hash-drawn responses behind a warcinfo
    * record, with a planted short-body class (i%11==7 → 3 tokens), a
    * planted duplicate class (i%5==4 → body copied from i−4), and two
    * malformed records injected mid-stream (the resync must not shift
    * rec_idx). Every draw keys `st:i` so the oracle regenerates the
    * SAME urls/bodies arithmetically. Single-member gzip. */
  private def ensureCrawlFixture(): String = {
    import graft.core.Determinism.jvmHash
    import graft.sources.WarcSource
    import graft.sources.WarcSource.WarcRecord
    val root = Paths.get(FixDir, "crawl")
    Files.createDirectories(root)
    val subs = Seq("", "www.", "WWW.", "cdn.")
    val sfxs = Seq("com", "org", "co.uk", "github.io", "kawasaki.jp",
      "city.kawasaki.jp")
    val qss = Seq("", "?utm_source=tw&b=2&a=1", "?b=2&a=1",
      "?a=1&utm_campaign=z&fbclid=x1")
    def wordsOf(i: Int): Seq[String] = {
      val k = if (i % 11 == 7) 3 else 8 + (jvmHash(s"cbk:$i") % 20L).toInt
      (0 until k).map(j => "w" + (jvmHash(s"cbw:$i:$j") % 50L))
    }
    val recs = (0 until 200).map { i =>
      val scheme = if (jvmHash(s"cus:$i") % 2L == 0L) "https" else "http"
      val sub = subs((jvmHash(s"cuc:$i") % 4L).toInt)
      val sfx = sfxs((jvmHash(s"cux:$i") % 6L).toInt)
      val port =
        if (jvmHash(s"cup:$i") % 4L == 0L) { if (scheme == "https") ":443" else ":80" }
        else ""
      val url = s"$scheme://${sub}site${jvmHash(s"cub:$i") % 25L}.$sfx$port" +
        s"/p${jvmHash(s"cua:$i") % 40L}${qss((jvmHash(s"cuq:$i") % 4L).toInt)}"
      val words = if (i % 5 == 4) wordsOf(i - 4) else wordsOf(i)
      WarcRecord("response", url, "2025-04-01T00:00:00Z", s"<urn:uuid:c$i>",
        200, "text/plain", words.mkString(" "))
    }
    val info = WarcRecord("warcinfo", "", "2025-04-01T00:00:00Z",
      "<urn:uuid:cinfo>", 0, "", "software: graft-crawl-fixture\r\n")
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nxx")
      .getBytes("UTF-8")
    val bytes = WarcSource.encode(info +: recs.take(50)) ++ bad ++
      WarcSource.encode(recs.slice(50, 120)) ++ bad ++
      WarcSource.encode(recs.drop(120))
    Files.write(root.resolve("crawl0.warc.gz"), WarcSource.gzip(bytes))
    root.toString
  }

  /** q150's robots corpus: one robots.txt per synthetic domain, rules
    * hash-drawn so the oracle regenerates the same TEXT arithmetically.
    * Shapes exercised: comments, blank lines, a `*` group with 1-3
    * allow/disallow rules, a specific `graftbot` group that must take
    * precedence, graftbot-ONLY files (every 5th domain by draw — no `*`
    * group at all; RFC 9309 still serves the matched agent's rules), and
    * a SECOND `*` group (every 4th starred domain) whose rules must
    * MERGE with the first group's (RFC 9309 §2.2.1: all groups of the
    * matched agent combine). */
  private def ensureRobotsFixture(): String = {
    import graft.core.Determinism.jvmHash
    val root = Paths.get(FixDir, "robots")
    Files.createDirectories(root)
    (0 until 40).foreach { n =>
      val hasStar = jvmHash(s"rbo:$n") % 5L != 0L
      val hasBot = jvmHash(s"rbg:$n") % 3L == 0L || !hasStar
      val sb = new StringBuilder
      sb ++= "# graft fixture\n"
      if (hasStar) {
        sb ++= "User-agent: *\n"
        sb ++= s"Disallow: /p${jvmHash(s"rbd1:$n") % 4L}\n"
        if (jvmHash(s"rba:$n") % 2L == 0L)
          sb ++= s"Allow: /p${jvmHash(s"rbd1:$n") % 4L}/open\n"
        if (jvmHash(s"rbd2:$n") % 3L > 0L)
          sb ++= s"Disallow: /q${jvmHash(s"rbd2:$n") % 3L}\n"
        sb ++= "\n"
      }
      if (hasBot) {
        sb ++= "User-agent: graftbot\n"
        sb ++= "Allow: /\n"
        sb ++= "Disallow: /secret\n"
        sb ++= "\n"
      }
      if (hasStar && jvmHash(s"rbm:$n") % 4L == 0L) {
        sb ++= "User-agent: *\n"
        sb ++= "Disallow: /r\n"
      }
      Files.write(root.resolve(s"d$n.example.txt"),
        sb.toString.getBytes("UTF-8"))
    }
    root.toString
  }

  private def ensureCsvFixture(): String = {
    val p = Paths.get(FixDir, "csv_role.csv")
    Files.createDirectories(p.getParent)
    val content =
      """question,answer
        |What is alpha?,Alpha measures  risk-adjusted outperformance.
        |What is beta?,Beta compares volatility.
        | ,no anchor here
        |What is gamma?,
        |""".stripMargin
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  private def ensureCorpusFixture(): String = {
    val root = Paths.get(FixDir, "corpus")
    def put(rel: String, body: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes("UTF-8"))
    }
    put("source_a/2025-01-01/article_a.txt", "Body of article a. It has two sentences.")
    put("source_a/2025-01-02/article_b.txt", "Body of article b.")
    put("source_b/2026/02-14--DRAFT/qa_alpha.txt", "Alpha question body.")
    root.toString
  }

  /** Shared q124/q127 machinery: hash-derived grouped images → real PNG
    * decode + gray 9×8 grid → dHash halves → 4×16-bit band table
    * `(doc_id, hi, lo, band, key)`. In production the fingerprint table
    * is the persisted index; here it derives from the synthesis lane.
    * The halves frame is `localCheckpoint`ed so the expensive
    * encode→decode→hash codec lane executes ONCE — the downstream band
    * self-join would otherwise re-run the whole lane per join side
    * (the cheap band explode alone replays above the checkpoint). */
  private def dhashBanded(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
    val dh = ids.mapPartitions { it =>
      // group-base memo: 4-member groups share the 864-entry base raster
      // and parquet hands ids in order, so hashing the base once per
      // group (not per member) drops ~75% of the hash/string work; a
      // group split across partitions just re-hashes once — correctness
      // never depends on the ordering.
      var lastGrp = Long.MinValue
      var lastBase: Array[Int] = null
      it.map { id =>
        val grp = id / 4; val mem = (id % 4).toInt
        if (grp != lastGrp) {
          lastBase = Array.tabulate(18 * 16 * 3)(i =>
            (Determinism.jvmHash(s"dh:$grp:$i") % 256L).toInt)
          lastGrp = grp
        }
        val px =
          if (mem == 0) lastBase
          else {
            val a = lastBase.clone()
            var i = mem
            while (i < a.length) { a(i) = (a(i) + 40 * mem) % 256; i += 97 }
            a
          }
        val png = graft.operators.MediaCodecs.encodePng(18, 16,
          px.toIndexedSeq, filterType = (id % 5).toInt)
        val grid = graft.operators.MediaCodecs.decodePngGrayGrid(png, 9, 8).get
        val (hi, lo) = graft.operators.MediaCodecs.dHashHalves(grid, 9, 8)
        (id, hi, lo)
      }
    }.toDF("doc_id", "hi", "lo").localCheckpoint(eager = true)
    dh.select(col("doc_id"), col("hi"), col("lo"),
      explode(array(
        struct(lit(0L).as("band"), expr("lo & 65535").as("key")),
        struct(lit(1L).as("band"), expr("(lo >> 16) & 65535").as("key")),
        struct(lit(2L).as("band"), expr("hi & 65535").as("key")),
        struct(lit(3L).as("band"), expr("(hi >> 16) & 65535").as("key"))))
        .as("bk"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** DuckDB twin of [[dhashBanded]]: emits px/grid/cmp/halves/banded. */
  private def duckDhashBandedCtes: String =
    s"""px AS MATERIALIZED (
      SELECT doc_id, i,
        CASE WHEN doc_id % 4 > 0 AND i % 97 = doc_id % 4
          THEN (CAST(${Determinism.duckHash(
            "'dh:' || CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 256
            AS BIGINT) + 40 * (doc_id % 4)) % 256
          ELSE CAST(${Determinism.duckHash(
            "'dh:' || CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 256
            AS BIGINT) END AS v
      FROM documents, unnest(generate_series(0, ${18 * 16 * 3 - 1})) AS g(i)
    ), grid AS MATERIALIZED (
      -- pixel p = i//3 at (row = p//18, col = p%18); 2x2 blocks -> 9x8
      SELECT doc_id,
        ((i // 3) // 18 // 2) * 9 + ((i // 3) % 18 // 2) AS block,
        CAST(sum(v) AS BIGINT) AS s
      FROM px GROUP BY 1, 2
    ), cmp AS (
      SELECT a.doc_id, (a.block // 9) * 8 + (a.block % 9) AS k
      FROM grid a JOIN grid b ON a.doc_id = b.doc_id AND b.block = a.block + 1
      WHERE a.block % 9 < 8 AND a.s > b.s
    ), halves AS (
      SELECT d.doc_id,
        CAST(coalesce(sum(CASE WHEN c.k >= 32 THEN (CAST(1 AS BIGINT) << (c.k - 32)) ELSE 0 END), 0) AS BIGINT) AS hi,
        CAST(coalesce(sum(CASE WHEN c.k < 32 THEN (CAST(1 AS BIGINT) << c.k) ELSE 0 END), 0) AS BIGINT) AS lo
      FROM documents d LEFT JOIN cmp c ON d.doc_id = c.doc_id
      GROUP BY d.doc_id
    ), banded AS MATERIALIZED (
      SELECT doc_id, hi, lo, band,
        CASE band WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
                  WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS key
      FROM halves, LATERAL (SELECT unnest(generate_series(0, 3)) AS band) t
    )"""

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q136_warc_source",
      // the Common Crawl ingest container (sources.WarcSource — real
      // WARC/1.x record walk: version line, CRLF headers,
      // Content-Length blocks, HTTP response splitting, gzip members,
      // malformed-record resync) composed with the q133 URL layer:
      // response records surface as (url, normalized url, registered
      // domain, date, status, mime, body) rows — the exact front door
      // of a web-crawl curation pipeline. Oracle = literal VALUES with
      // hand-normalized URLs (the q70 fixture idiom). This lane runs the
      // STREAMING walk (readResponsesStreaming: PortableDataStream →
      // parseStreaming's compacting window — memory bounded by one
      // record, not one archive), so the bounded-memory path is the
      // oracle-gated one; the whole-buffer parse stays pinned equal in
      // SourcesSpec.
      (s, dir) => {
        import graft.functions.UrlFunctions
        val root = ensureWarcFixture()
        WarcSource.readResponsesStreaming(s, root)
          .select(col("rec_idx"), col("url"),
            UrlFunctions.normalizeUrl(col("url")).as("norm_url"),
            UrlFunctions.registeredDomain(UrlFunctions.hostOf(col("url")))
              .as("reg_domain"),
            col("date"), col("status"), col("mime"), col("body"))
      },
      Some("""SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'HTTPS://WWW.Example5.co.uk:443/a/b/?utm_source=x&b=2&a=1#f',
         'https://www.example5.co.uk/a/b?a=1&b=2', 'example5.co.uk',
         '2025-03-01T10:00:00Z', CAST(200 AS BIGINT), 'text/html', 'Hello crawl one.'),
        (CAST(3 AS BIGINT), 'http://news.example9.com:80/story?id=7',
         'http://news.example9.com/story?id=7', 'example9.com',
         '2025-03-02T11:30:00Z', CAST(404 AS BIGINT), 'text/plain', 'Missing page.'),
        (CAST(4 AS BIGINT), 'https://blog.site3.io/post/',
         'https://blog.site3.io/post', 'site3.io',
         '2025-03-03T09:15:00Z', CAST(200 AS BIGINT), 'text/html', 'Another page body.')
        ) t(rec_idx, url, norm_url, reg_domain, date, status, mime, body)""")),

    QueryDef("q70_csv_source",
      (s, dir) => {
        val path = ensureCsvFixture()
        import s.implicits._
        val ds = CsvSource.read(s, CsvSourceConfig("csvfix", path,
          anchorColumn = Some("Question"), positiveColumn = Some("answer"), trust = 0.9f))
        ds.flatMap(r => r.sections.map(sec =>
          (r.id, r.source, sec.role, sec.heading.getOrElse(""), sec.text,
            sec.sentences.size.toLong)))
          .toDF("id", "source", "role", "heading", "text", "n_sentences")
      },
      // row 2 (blank anchor) and row 3 (configured-but-blank positive) drop
      Some("""SELECT * FROM (VALUES
        ('csvfix::row_0','csvfix','anchor','Question','What is alpha?', CAST(1 AS BIGINT)),
        ('csvfix::row_0','csvfix','context','answer','Alpha measures risk-adjusted outperformance.', CAST(1 AS BIGINT)),
        ('csvfix::row_1','csvfix','anchor','Question','What is beta?', CAST(1 AS BIGINT)),
        ('csvfix::row_1','csvfix','context','answer','Beta compares volatility.', CAST(1 AS BIGINT))
        ) t(id, source, role, heading, text, n_sentences)""")),

    QueryDef("q71_file_source",
      (s, dir) => {
        val root = ensureCorpusFixture()
        import s.implicits._
        val ds = FileSource.read(s, FileSourceConfig("fs", root))
        ds.map(r => (r.id, r.source,
          r.sections.head.text,
          r.taxonomy.find(_.startsWith("date=")).getOrElse(""),
          r.sections.size.toLong))
          .toDF("id", "source", "anchor_text", "date_tag", "n_sections")
      },
      Some("""SELECT * FROM (VALUES
        ('fs::source_a/2025-01-01/article_a.txt','fs','article a','date=2025-01-01', CAST(2 AS BIGINT)),
        ('fs::source_a/2025-01-02/article_b.txt','fs','article b','date=2025-01-02', CAST(2 AS BIGINT)),
        ('fs::source_b/2026/02-14--DRAFT/qa_alpha.txt','fs','qa alpha','date=2026-02-14', CAST(2 AS BIGINT))
        ) t(id, source, anchor_text, date_tag, n_sections)""")),

    QueryDef("q72_hf_line_mapping",
      (s, dir) => {
        // parse a source-list line, then map the documents table through the
        // HF column config (documents stands in for a landed shard)
        // id=doc_id exercises the explicit id-column lane — the strongest
        // stable-id form (survives re-sharding, reference id_column)
        val entry = HfSourceList.parseLine(
          "hf://acme/docs/default/train anchor=text trust=0.7 source_id=hfdocs id=doc_id")
          .toOption.flatten.get
        import s.implicits._
        val shard = Tables.load(s, dir, "documents").orderBy("doc_id").limit(5)
        HfSourceList.toRecords(s, shard, entry)
          .map(r => (r.id, r.source, math.round(r.trust * 1000).toLong,
            r.sections.size.toLong, r.sections.head.role))
          .toDF("id", "source", "trust_e3", "n_sections", "first_role")
      },
      // anchor-only mapping: positive falls back to anchor → 2 sections/row
      Some("""SELECT 'hfdocs::' || CAST(doc_id AS VARCHAR) AS id, 'hfdocs' AS source,
        CAST(700 AS BIGINT) AS trust_e3, CAST(2 AS BIGINT) AS n_sections, 'anchor' AS first_role
        FROM documents WHERE doc_id < 5""")),

    QueryDef("q73_multimodal_bytes",
      (s, dir) => {
        Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("mime"),
            length(col("media")).cast("long").as("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
      },
      Some(s"""SELECT doc_id, 'application/octet-stream' AS mime,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        320 + ${Determinism.duckSeeded("w", "doc_id")} % 320 AS width,
        240 + ${Determinism.duckSeeded("h", "doc_id")} % 240 AS height
        FROM documents""")),

    QueryDef("q75_frame_offsets",
      // frame sampling's metadata plane: 4 deterministic byte offsets per
      // media row, computed WITHOUT touching the payload (the per-offset
      // frame decode is the stubbed codec step)
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")), 4),
      Some("""SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
          (i * CAST(octet_length(encode(text)) AS BIGINT)) // 4 AS offset
        FROM documents, unnest(generate_series(0, 3)) AS g(i)
        WHERE octet_length(encode(text)) > 0""")),

    QueryDef("q76_resize_plan",
      // aspect-preserving fit into 224x224, never upscaling — pure integer
      // floor arithmetic over the metadata struct (the pixel resample is
      // the stubbed codec step)
      (s, dir) => Multimodal.resizePlan(
        Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")), 224, 224),
      Some(s"""WITH m AS (
          SELECT doc_id,
            320 + ${Determinism.duckSeeded("w", "doc_id")} % 320 AS width,
            240 + ${Determinism.duckSeeded("h", "doc_id")} % 240 AS height
          FROM documents
        )
        SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
          CAST(CASE WHEN width <= 224 AND height <= 224 THEN width
                    WHEN width * 224 >= height * 224 THEN 224
                    ELSE (width * 224) // height END AS BIGINT) AS out_w,
          CAST(CASE WHEN width <= 224 AND height <= 224 THEN height
                    WHEN width * 224 >= height * 224 THEN (height * 224) // width
                    ELSE 224 END AS BIGINT) AS out_h
        FROM m""")),

    QueryDef("q78_jsonl_source",
      // JSONL source end-to-end against a literal-VALUES oracle: role
      // mapping with a required context field, whitespace normalization,
      // blank/invalid/missing-field rows silently skipped but still
      // consuming their line id (gap at line_2..line_4)
      (s, dir) => {
        val p = java.nio.file.Paths.get(FixDir, "qa.jsonl")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, Seq(
          """{"q": "What is alpha?", "a": "Alpha measures  risk-adjusted outperformance."}""",
          """{"q": "What is beta?", "a": "Beta compares volatility."}""",
          """{"q": "   ", "a": "no anchor here"}""",
          """{"q": "What is gamma?"}""",
          """not valid json at all""",
          """{"q": "What is delta?", "a": "Delta is sensitivity."}""").mkString("\n").getBytes("UTF-8"))
        import s.implicits._
        JsonlSource.read(s, JsonlSourceConfig("jdocs", p.toString,
            anchorField = Some("q"), contextField = Some("a"), trust = 0.8f))
          .map(r => (r.id, r.source, math.round(r.trust * 1000).toLong,
            r.sections.size.toLong, r.sections.head.text, r.sections(1).text))
          .toDF("id", "source", "trust_e3", "n_sections", "anchor", "context")
      },
      Some("""SELECT * FROM (VALUES
          ('jdocs::qa::line_0', 'jdocs', CAST(800 AS BIGINT), CAST(2 AS BIGINT),
           'What is alpha?', 'Alpha measures risk-adjusted outperformance.'),
          ('jdocs::qa::line_1', 'jdocs', CAST(800 AS BIGINT), CAST(2 AS BIGINT),
           'What is beta?', 'Beta compares volatility.'),
          ('jdocs::qa::line_5', 'jdocs', CAST(800 AS BIGINT), CAST(2 AS BIGINT),
           'What is delta?', 'Delta is sensitivity.')
        ) t(id, source, trust_e3, n_sections, anchor, context)""")),

    QueryDef("q77_date_meta_values",
      // build_date_meta_values (reference: src/metadata.rs:38-50): the six
      // date renderings, sorted + deduped, as a column twin of the pure
      // DateHelpers path — one synthetic date per doc (hash-derived month
      // and day so all renderings vary), exploded with position
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            make_date(lit(2024),
              pmod(Determinism.seeded("dm", col("doc_id")), lit(12)) + 1,
              pmod(Determinism.seeded("dd", col("doc_id")), lit(28)) + 1).as("d"))
        d.select(col("doc_id"),
            posexplode(DateHelpers.dateMetaValuesColumn(col("d"))))
          .select(col("doc_id"), col("pos").cast("long").as("idx"),
            col("col").as("rendering"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, make_date(2024,
            CAST(${Determinism.duckSeeded("dm", "doc_id")} % 12 + 1 AS INT),
            CAST(${Determinism.duckSeeded("dd", "doc_id")} % 28 + 1 AS INT)) AS d
          FROM documents
        ), ls AS (
          SELECT doc_id, ${DateHelpers.duckDateMetaValues("d")} AS vs FROM t
        )
        SELECT doc_id, CAST(generate_subscripts(vs, 1) - 1 AS BIGINT) AS idx,
          unnest(vs) AS rendering
        FROM ls""")),

    QueryDef("q79_multimodal_real_decode",
      // the REAL codec lane (MediaCodecs.decodeWav): synthesize one PCM
      // WAV per document from the portable hash stream, decode it through
      // the actual RIFF chunk walk, and let DuckDB recompute duration and
      // RMS arithmetically from the same hash-derived samples — if the
      // byte layout or the parser drifts, the hashes diverge. Both
      // engines compute floor(1000·sqrt(ss/n)/32767) over identical
      // integers in the same IEEE order, so the floor is exact.
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val samples = (0 until 8).map(i =>
              (Determinism.jvmHash(s"wavs:$id:$i") % 2001L - 1000L).toInt)
            Multimodal.MediaRow(id, "audio/wav",
              graft.operators.MediaCodecs.encodeWavPcm16(1, 8000, samples), 0, 0)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("channels").cast("long").as("channels"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_samples"), col("duration_ms"), col("rms_e3"))
      },
      Some(s"""WITH smp AS (
          SELECT doc_id,
            CAST(${Determinism.duckHash(
              "'wavs:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 2001 - 1000
              AS BIGINT) AS s
          FROM documents, unnest(generate_series(0, 7)) AS g(i)
        ), agg AS (
          SELECT doc_id, sum(s * s) AS ss, count(*) AS n FROM smp GROUP BY doc_id
        )
        SELECT doc_id, 'wav' AS kind, CAST(1 AS BIGINT) AS channels,
          CAST(8000 AS BIGINT) AS sample_rate, CAST(8 AS BIGINT) AS n_samples,
          CAST(1 AS BIGINT) AS duration_ms,
          CAST(floor(1000.0 * sqrt(CAST(ss AS DOUBLE) / n) / 32767.0) AS BIGINT) AS rms_e3
        FROM agg""")),

    QueryDef("q126_audio_fingerprint_neardup",
      // acoustic near-dup dedup — the audio twin of q124: hash-derived
      // PCM streams (4-member groups share a base signal, members perturb
      // a few samples) are WAV-encoded, decoded through the real RIFF
      // walk into a 65-window exact energy profile
      // (MediaCodecs.decodeWavEnergyWindows), fingerprinted by
      // energy-difference bits into two 32-bit halves, and near-dup pairs
      // come from the same 4×16-bit band self-join + exact hamming
      // verify (≤ 3 guaranteed by pigeonhole; 4–6 best-effort — see
      // q124). DuckDB recomputes window energies, bits, bands and pairs
      // from the same hash-derived samples. The fingerprint frame is
      // localCheckpointed so the WAV encode/decode lane runs once, not
      // once per self-join side.
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val fp = ids.mapPartitions { it =>
          // group-base memo (see dhashBanded): members share the 260-sample
          // base signal, so hash it once per group and perturb per member
          var lastGrp = Long.MinValue
          var lastBase: Array[Int] = null
          it.map { id =>
            val grp = id / 4; val mem = (id % 4).toInt
            if (grp != lastGrp) {
              lastBase = Array.tabulate(260)(i =>
                (Determinism.jvmHash(s"afp:$grp:$i") % 2001L - 1000L).toInt)
              lastGrp = grp
            }
            val samples =
              if (mem == 0) lastBase.toIndexedSeq
              else {
                val a = lastBase.clone()
                var i = mem
                while (i < a.length) {
                  a(i) = ((a(i) + 1000 + 137 * mem) % 2001) - 1000; i += 53
                }
                a.toIndexedSeq
              }
            val wav = graft.operators.MediaCodecs.encodeWavPcm16(1, 8000, samples)
            val win = graft.operators.MediaCodecs
              .decodeWavEnergyWindows(wav, 65).get
            val (hi, lo) = graft.operators.MediaCodecs.energyHashHalves(win)
            (id, hi, lo)
          }
        }.toDF("doc_id", "hi", "lo").localCheckpoint(eager = true)
        val banded = fp.select(col("doc_id"), col("hi"), col("lo"),
          explode(array(
            struct(lit(0L).as("band"), expr("lo & 65535").as("key")),
            struct(lit(1L).as("band"), expr("(lo >> 16) & 65535").as("key")),
            struct(lit(2L).as("band"), expr("hi & 65535").as("key")),
            struct(lit(3L).as("band"), expr("(hi >> 16) & 65535").as("key"))))
            .as("bk"))
          .select(col("doc_id"), col("hi"), col("lo"),
            col("bk.band").as("band"), col("bk.key").as("key"))
        val l = banded.as("l"); val r = banded.as("r")
        l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            expr("CAST(bit_count(l.hi ^ r.hi) + bit_count(l.lo ^ r.lo) AS BIGINT)")
              .as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
      },
      Some(s"""WITH smp AS MATERIALIZED (
          SELECT doc_id, i,
            CASE WHEN doc_id % 4 > 0 AND i % 53 = doc_id % 4
              THEN ((CAST(${Determinism.duckHash(
                "'afp:' || CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 2001 - 1000
                AS BIGINT) + 1000 + 137 * (doc_id % 4)) % 2001) - 1000
              ELSE CAST(${Determinism.duckHash(
                "'afp:' || CAST(doc_id // 4 AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 2001 - 1000
                AS BIGINT) END AS s
          FROM documents, unnest(generate_series(0, 259)) AS g(i)
        ), win AS MATERIALIZED (
          SELECT doc_id, i // 4 AS w, CAST(sum(s * s) AS BIGINT) AS e
          FROM smp GROUP BY 1, 2
        ), cmp AS (
          SELECT a.doc_id, a.w AS k
          FROM win a JOIN win b ON a.doc_id = b.doc_id AND b.w = a.w + 1
          WHERE a.e > b.e
        ), halves AS (
          SELECT d.doc_id,
            CAST(coalesce(sum(CASE WHEN c.k >= 32 THEN (CAST(1 AS BIGINT) << (c.k - 32)) ELSE 0 END), 0) AS BIGINT) AS hi,
            CAST(coalesce(sum(CASE WHEN c.k < 32 THEN (CAST(1 AS BIGINT) << c.k) ELSE 0 END), 0) AS BIGINT) AS lo
          FROM documents d LEFT JOIN cmp c ON d.doc_id = c.doc_id
          GROUP BY d.doc_id
        ), banded AS (
          SELECT doc_id, hi, lo, band,
            CASE band WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
                      WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS key
          FROM halves, LATERAL (SELECT unnest(generate_series(0, 3)) AS band) t
        )
        SELECT DISTINCT a, b, hamming FROM (
          SELECT l.doc_id AS a, r.doc_id AS b,
            CAST(bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) AS BIGINT) AS hamming
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id) t
        WHERE hamming <= 6""")),

    QueryDef("q69_multimodal_png_decode",
      // the COMPRESSED codec lane (MediaCodecs.decodePng): hash-derived
      // 4×3 RGB pixels are PNG-encoded with scanline filter doc_id % 5 —
      // every one of the five PNG filters (None/Sub/Up/Average/Paeth) is
      // exercised across the corpus — deflated, then decoded through the
      // real chunk walk + java.util.zip.Inflater + de-filter. Filters are
      // lossless, so DuckDB recomputes the channel means directly from
      // the same hash stream: any drift in the filter algebra, the zlib
      // framing, or the chunk walk shifts a mean and fails the hash.
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val px = (0 until 36).map(i =>
              (Determinism.jvmHash(s"png:$id:$i") % 256L).toInt)
            Multimodal.MediaRow(id, "image/png",
              graft.operators.MediaCodecs.encodePng(4, 3, px,
                filterType = (id % 5).toInt), 4, 3)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("channels").cast("long").as("channels"),
            col("mean_r").cast("long").as("mean_r"),
            col("mean_g").cast("long").as("mean_g"),
            col("mean_b").cast("long").as("mean_b"))
      },
      Some(s"""WITH px AS (
          SELECT doc_id, i,
            CAST(${Determinism.duckHash(
              "'png:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 256
              AS BIGINT) AS v
          FROM documents, unnest(generate_series(0, 35)) AS g(i)
        ), agg AS (
          SELECT doc_id,
            sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS sr,
            sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS sg,
            sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS sb
          FROM px GROUP BY doc_id
        )
        SELECT doc_id, 'png' AS kind, CAST(4 AS BIGINT) AS width,
          CAST(3 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
          CAST(sr // 12 AS BIGINT) AS mean_r, CAST(sg // 12 AS BIGINT) AS mean_g,
          CAST(sb // 12 AS BIGINT) AS mean_b
        FROM agg""")),

    QueryDef("q124_image_dhash_neardup",
      // perceptual image dedup — the multimodal twin of the text
      // near-dup lanes (LAION-style): hash-derived 18×16 RGB images
      // (4-member groups share a base raster, members perturb a few
      // pixels) are PNG-encoded, decoded + gray-downsampled to the 9×8
      // dHash grid in ONE sweep (MediaCodecs.decodePngGrayGrid — no
      // raster materializes), difference-hashed into two 32-bit halves
      // (no sign-bit hazard in either engine), and near-dup pairs come
      // from a 4×16-bit band self-join + exact hamming verify — any
      // hamming ≤ 3 pair collides on some band by pigeonhole; pairs at
      // hamming 4–6 pass the emit filter but are BEST-EFFORT recall
      // (they must happen to collide on a band — widen to 8×8-bit bands
      // for a guaranteed ≤ 6). The
      // oracle recomputes grid sums, bits, bands and pairs from the same
      // hash stream: a single filter/inflate/downsample drift flips a
      // bit and fails the hash.
      (s, dir) => {
        val banded = dhashBanded(s, dir)
        val l = banded.as("l"); val r = banded.as("r")
        l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            expr("CAST(bit_count(l.hi ^ r.hi) + bit_count(l.lo ^ r.lo) AS BIGINT)")
              .as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
      },
      Some(s"""WITH $duckDhashBandedCtes
        SELECT DISTINCT a, b, hamming FROM (
          SELECT l.doc_id AS a, r.doc_id AS b,
            CAST(bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) AS BIGINT) AS hamming
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id) t
        WHERE hamming <= 6""")),

    QueryDef("q127_incremental_image_dedup",
      // streaming-refresh image dedup — the multimodal member of the
      // incremental family (q68 text bands, q109 span index): a landed
      // shard (doc_id % 10 = 0) fingerprints ONLY its own images and
      // band-joins the STANDING fingerprint table; per-refresh cost is
      // |new| × collisions and old-old pairs never enter the plan. Pairs
      // canonicalize to (min, max) so new-new duplicates count once.
      // Recall contract as q124: hamming ≤ 3 guaranteed, 4–6 best-effort.
      (s, dir) => {
        val banded = dhashBanded(s, dir)
        val newB = banded.filter(col("doc_id") % 10 === 0)
        val l = newB.as("l"); val r = banded.as("r")
        l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") =!= col("r.doc_id"))
          .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
            greatest(col("l.doc_id"), col("r.doc_id")).as("b"),
            expr("CAST(bit_count(l.hi ^ r.hi) + bit_count(l.lo ^ r.lo) AS BIGINT)")
              .as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
      },
      Some(s"""WITH $duckDhashBandedCtes
        SELECT DISTINCT a, b, hamming FROM (
          SELECT least(l.doc_id, r.doc_id) AS a, greatest(l.doc_id, r.doc_id) AS b,
            CAST(bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) AS BIGINT) AS hamming
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.key = r.key AND l.doc_id <> r.doc_id
          WHERE l.doc_id % 10 = 0) t
        WHERE hamming <= 6""")),

    QueryDef("q19_multimodal_jpeg_decode",
      // the LOSSY codec lane (MediaCodecs.decodeJpeg — the JDK's own
      // ImageIO baseline codec, stdlib): hash-derived solid colors
      // ≡ 4 (mod 8) are JPEG-encoded, decoded through the real
      // entropy-decode + IDCT + YCbCr conversion, and the channel means
      // land within ±3 of the source color (spec-pinned drift ≤ 1), so
      // the /8 BUCKETS are deterministic and DuckDB recomputes them from
      // the same hash stream — a tolerance oracle that still fails on
      // any real decoder drift.
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            def c(ch: String) =
              ((Determinism.jvmHash(s"jpg:$ch:$id") % 28L).toInt) * 8 + 4
            Multimodal.MediaRow(id, "image/jpeg",
              graft.operators.MediaCodecs.encodeJpegSolid(16, 8,
                c("r"), c("g"), c("b")), 16, 8)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            expr("CAST(mean_r AS BIGINT) div 8").as("r_bucket"),
            expr("CAST(mean_g AS BIGINT) div 8").as("g_bucket"),
            expr("CAST(mean_b AS BIGINT) div 8").as("b_bucket"))
      },
      Some {
        def c(ch: String) = s"(${Determinism.duckHash(
          s"'jpg:$ch:' || CAST(doc_id AS VARCHAR)")} % 28)"
        s"""SELECT doc_id, 'jpeg' AS kind, CAST(16 AS BIGINT) AS width,
          CAST(8 AS BIGINT) AS height,
          CAST(${c("r")} AS BIGINT) AS r_bucket,
          CAST(${c("g")} AS BIGINT) AS g_bucket,
          CAST(${c("b")} AS BIGINT) AS b_bucket
        FROM documents"""
      }),

    QueryDef("q104_multimodal_gif_decode",
      // the GIF codec lane (MediaCodecs.decodeGif — from-scratch LZW):
      // hash-derived 8-color palettes + 5×4 index rasters are GIF-encoded
      // and decoded through the real header walk + variable-width LZW +
      // palette lookup. GIF is lossless, so DuckDB recomputes the channel
      // means from the same hash streams: any drift in the LZW bit
      // unpacking, sub-block reassembly, or palette indexing shifts a
      // mean and fails the hash
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val pal = (0 until 8).map(p => (
              (Determinism.jvmHash(s"gifr:$id:$p") % 256L).toInt,
              (Determinism.jvmHash(s"gifg:$id:$p") % 256L).toInt,
              (Determinism.jvmHash(s"gifb:$id:$p") % 256L).toInt))
            val idx = (0 until 20).map(i =>
              (Determinism.jvmHash(s"gifi:$id:$i") % 8L).toInt)
            Multimodal.MediaRow(id, "image/gif",
              graft.operators.MediaCodecs.encodeGif(5, 4, pal, idx), 5, 4)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("mean_r").cast("long").as("mean_r"),
            col("mean_g").cast("long").as("mean_g"),
            col("mean_b").cast("long").as("mean_b"))
      },
      Some(s"""WITH pal AS (
          SELECT doc_id, p,
            CAST(${Determinism.duckHash("'gifr:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)")} % 256 AS BIGINT) AS r,
            CAST(${Determinism.duckHash("'gifg:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)")} % 256 AS BIGINT) AS g,
            CAST(${Determinism.duckHash("'gifb:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)")} % 256 AS BIGINT) AS b
          FROM documents, unnest(generate_series(0, 7)) AS gp(p)
        ), px AS (
          SELECT doc_id,
            CAST(${Determinism.duckHash("'gifi:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 8 AS BIGINT) AS p
          FROM documents, unnest(generate_series(0, 19)) AS gi(i)
        ), agg AS (
          SELECT px.doc_id, sum(pal.r) AS sr, sum(pal.g) AS sg, sum(pal.b) AS sb
          FROM px JOIN pal ON px.doc_id = pal.doc_id AND px.p = pal.p
          GROUP BY px.doc_id)
        SELECT doc_id, 'gif' AS kind, CAST(5 AS BIGINT) AS width,
          CAST(4 AS BIGINT) AS height,
          CAST(sr // 20 AS BIGINT) AS mean_r, CAST(sg // 20 AS BIGINT) AS mean_g,
          CAST(sb // 20 AS BIGINT) AS mean_b
        FROM agg""")),

    QueryDef("q105_multimodal_mp3_meta",
      // the MP3 metadata lane (MediaCodecs.decodeMp3Meta — frame-header
      // walk, no PCM): hash-picked frame counts / bitrates / sample rates
      // / channel modes synthesize structurally-valid MPEG-1 Layer III
      // streams; the decoder re-derives duration, sample count, channels
      // and mean kbps by walking the real frame lattice, and DuckDB
      // recomputes them from the same hash draws
      (s, dir) => {
        import s.implicits._
        val brs = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
        val rates = Seq(44100, 48000, 32000)
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val nf = 20 + (Determinism.jvmHash(s"mp3n:$id") % 60L).toInt
            val br = brs((Determinism.jvmHash(s"mp3b:$id") % 14L).toInt)
            val rate = rates((Determinism.jvmHash(s"mp3r:$id") % 3L).toInt)
            val stereo = Determinism.jvmHash(s"mp3c:$id") % 2L == 0L
            Multimodal.MediaRow(id, "audio/mpeg",
              graft.operators.MediaCodecs.encodeMp3Frames(nf, br, rate, stereo), 0, 0)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_samples"), col("duration_ms"),
            col("channels").cast("long").as("channels"),
            col("rms_e3").as("kbps"))
      },
      Some(s"""WITH draws AS (
          SELECT doc_id,
            20 + (${Determinism.duckHash("'mp3n:' || CAST(doc_id AS VARCHAR)")} % 60) AS nf,
            ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(${Determinism.duckHash("'mp3b:' || CAST(doc_id AS VARCHAR)")} % 14 AS INT) + 1] AS br,
            ([44100,48000,32000])[CAST(${Determinism.duckHash("'mp3r:' || CAST(doc_id AS VARCHAR)")} % 3 AS INT) + 1] AS rate,
            CASE WHEN ${Determinism.duckHash("'mp3c:' || CAST(doc_id AS VARCHAR)")} % 2 = 0 THEN 2 ELSE 1 END AS ch
          FROM documents)
        SELECT doc_id, 'mp3' AS kind, CAST(rate AS BIGINT) AS sample_rate,
          CAST(nf * 1152 AS BIGINT) AS n_samples,
          CAST((nf * 1152 * 1000) // rate AS BIGINT) AS duration_ms,
          CAST(ch AS BIGINT) AS channels, CAST(br AS BIGINT) AS kbps
        FROM draws""")),

    QueryDef("q130_multimodal_mp4_meta",
      // the VIDEO metadata lane (MediaCodecs.decodeMp4Meta — the real ISO
      // BMFF box walk: ftyp sniff, moov → mvhd timescale/duration, trak →
      // tkhd track ids + 16.16 dims, mdia → hdlr handler 4cc; no sample
      // decode — frame codecs aren't in this container): hash-picked
      // timescales / durations / track sets synthesize structurally-valid
      // MP4s, the decoder re-derives every field by walking the real box
      // framing, and DuckDB recomputes them from the same hash draws —
      // any drift in the framing, version offsets, or fixed-point dims
      // shifts a value and fails the hash. The first track is the video
      // track; extra tracks are audio (so n_tracks exercises the handler
      // dispatch).
      (s, dir) => {
        import s.implicits._
        val tss = Seq(600L, 1000L, 90000L, 44100L)
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val ts = tss((Determinism.jvmHash(s"mp4t:$id") % 4L).toInt)
            val dur = Determinism.jvmHash(s"mp4d:$id") % 100000L + 1L
            val nt = (Determinism.jvmHash(s"mp4n:$id") % 3L).toInt + 1
            val w = (Determinism.jvmHash(s"mp4w:$id") % 1920L).toInt + 16
            val h = (Determinism.jvmHash(s"mp4h:$id") % 1080L).toInt + 16
            val tracks = graft.operators.MediaCodecs.Mp4Track(1L, "vide", w, h) +:
              (2 to nt).map(i =>
                graft.operators.MediaCodecs.Mp4Track(i.toLong, "soun", 0, 0))
            Multimodal.MediaRow(id, "video/mp4",
              graft.operators.MediaCodecs.encodeMp4Meta(ts, dur, tracks), 0, 0)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("channels").cast("long").as("n_tracks"),
            col("sample_rate").cast("long").as("timescale"),
            col("n_samples").as("dur_units"), col("duration_ms"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
      },
      Some(s"""WITH draws AS (
          SELECT doc_id,
            ([600,1000,90000,44100])[CAST(${Determinism.duckHash("'mp4t:' || CAST(doc_id AS VARCHAR)")} % 4 AS INT) + 1] AS ts,
            ${Determinism.duckHash("'mp4d:' || CAST(doc_id AS VARCHAR)")} % 100000 + 1 AS dur,
            ${Determinism.duckHash("'mp4n:' || CAST(doc_id AS VARCHAR)")} % 3 + 1 AS nt,
            ${Determinism.duckHash("'mp4w:' || CAST(doc_id AS VARCHAR)")} % 1920 + 16 AS w,
            ${Determinism.duckHash("'mp4h:' || CAST(doc_id AS VARCHAR)")} % 1080 + 16 AS h
          FROM documents)
        SELECT doc_id, 'mp4' AS kind, CAST(nt AS BIGINT) AS n_tracks,
          CAST(ts AS BIGINT) AS timescale, CAST(dur AS BIGINT) AS dur_units,
          CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
        FROM draws""")),

    QueryDef("q132_video_frame_sample",
      // REAL video SAMPLE decode + frame sampling (MediaCodecs.decodeY4m):
      // hash-picked even dims, frame counts, and chroma modes (420jpeg /
      // 444 / mono — all three plane layouts exercised) synthesize
      // YUV4MPEG2 streams with hash-derived plane bytes; the decoder walks
      // the real header + FRAME framing and reports exact integer plane
      // means per frame; the training-pipeline frame-sampling STRIDE is a
      // relational filter over the decoded frame rows (keep every 2nd
      // frame). DuckDB recomputes every mean arithmetically from the same
      // hash draws — any drift in the header parse, plane sizes, or frame
      // hops shifts a mean and fails the hash.
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val frames = ids.mapPartitions { it =>
          it.flatMap { id =>
            val w = 2 + 2 * (Determinism.jvmHash(s"y4mw:$id") % 3L).toInt // 2|4|6
            val h = 2 + 2 * (Determinism.jvmHash(s"y4mh:$id") % 2L).toInt // 2|4
            val nf = 2 + (Determinism.jvmHash(s"y4mn:$id") % 4L).toInt // 2..5
            val chroma = (Determinism.jvmHash(s"y4mc:$id") % 3L).toInt match {
              case 0 => "420jpeg"
              case 1 => "444"
              case _ => "mono"
            }
            val cN = chroma match {
              case "mono" => 0
              case "444" => w * h
              case _ => (w / 2) * (h / 2)
            }
            def plane(f: Int, p: String, n: Int): Seq[Int] = (0 until n).map(i =>
              (Determinism.jvmHash(s"y4mp:$id:$f:$p:$i") % 256L).toInt)
            val payload = graft.operators.MediaCodecs.encodeY4m(w, h, 25, 1, chroma,
              (0 until nf).map(f =>
                (plane(f, "y", w * h), plane(f, "u", cN), plane(f, "v", cN))))
            val dec = graft.operators.MediaCodecs.decodeY4m(payload).get
            dec.frames.map(fr => (id, chroma, dec.width.toLong, dec.height.toLong,
              dec.frames.size.toLong, dec.durationMs, fr.index,
              fr.meanY, fr.meanCb, fr.meanCr))
          }
        }.toDF("doc_id", "chroma", "w", "h", "n_frames", "duration_ms",
          "frame_idx", "mean_y", "mean_cb", "mean_cr")
        frames.filter(col("frame_idx") % 2 === 0)
      },
      Some(s"""WITH cfg AS (
          SELECT doc_id,
            2 + 2 * (${Determinism.duckHash("'y4mw:' || CAST(doc_id AS VARCHAR)")} % 3) AS w,
            2 + 2 * (${Determinism.duckHash("'y4mh:' || CAST(doc_id AS VARCHAR)")} % 2) AS h,
            2 + (${Determinism.duckHash("'y4mn:' || CAST(doc_id AS VARCHAR)")} % 4) AS nf,
            ${Determinism.duckHash("'y4mc:' || CAST(doc_id AS VARCHAR)")} % 3 AS cm
          FROM documents
        ), cfg2 AS (
          SELECT doc_id, w, h, nf,
            CASE WHEN cm = 0 THEN '420jpeg' WHEN cm = 1 THEN '444' ELSE 'mono' END AS chroma,
            CASE WHEN cm = 0 THEN (w // 2) * (h // 2) WHEN cm = 1 THEN w * h ELSE 0 END AS cn
          FROM cfg
        ), fr AS MATERIALIZED (
          SELECT * FROM (
            SELECT doc_id, w, h, nf, chroma, cn,
              unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS frame_idx
            FROM cfg2)
          WHERE frame_idx % 2 = 0
        ), ypix AS (
          SELECT doc_id, frame_idx,
            unnest(generate_series(0, CAST(w * h - 1 AS BIGINT))) AS i
          FROM fr
        ), ym AS (
          SELECT doc_id, frame_idx,
            sum(${Determinism.duckHash(
              "'y4mp:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':y:' || CAST(i AS VARCHAR)")} % 256) AS sy
          FROM ypix GROUP BY doc_id, frame_idx
        ), cpix AS (
          SELECT doc_id, frame_idx,
            unnest(generate_series(0, CAST(cn - 1 AS BIGINT))) AS i
          FROM fr WHERE cn > 0
        ), cmn AS (
          SELECT doc_id, frame_idx,
            sum(${Determinism.duckHash(
              "'y4mp:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':u:' || CAST(i AS VARCHAR)")} % 256) AS su,
            sum(${Determinism.duckHash(
              "'y4mp:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':v:' || CAST(i AS VARCHAR)")} % 256) AS sv
          FROM cpix GROUP BY doc_id, frame_idx
        )
        SELECT f.doc_id, f.chroma, CAST(f.w AS BIGINT) AS w, CAST(f.h AS BIGINT) AS h,
          CAST(f.nf AS BIGINT) AS n_frames, CAST(f.nf * 40 AS BIGINT) AS duration_ms,
          CAST(f.frame_idx AS BIGINT) AS frame_idx,
          CAST(ym.sy // (f.w * f.h) AS BIGINT) AS mean_y,
          CAST(COALESCE(c.su // f.cn, 0) AS BIGINT) AS mean_cb,
          CAST(COALESCE(c.sv // f.cn, 0) AS BIGINT) AS mean_cr
        FROM fr f JOIN ym ON ym.doc_id = f.doc_id AND ym.frame_idx = f.frame_idx
        LEFT JOIN cmn c ON c.doc_id = f.doc_id AND c.frame_idx = f.frame_idx""")),

    QueryDef("q135_flac_real_decode",
      // REAL full-PCM decode of a COMPRESSED audio container
      // (operators.Flac — from-scratch: bit framing, CRC-8/16 verify,
      // Rice residuals, fixed predictors, mid/side decorrelation): each
      // document's hash-derived samples FLAC-encode under a hash-picked
      // coding config (channel count, predictor order incl. verbatim,
      // mid/side) and decode through the real parser. FLAC is LOSSLESS,
      // so the coding config cannot move a single value — DuckDB
      // recomputes duration and RMS arithmetically from the same hash
      // draws with no tolerance band (the q79 WAV idiom through a
      // genuinely compressed container).
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val ch = 1 + (Determinism.jvmHash(s"flcc:$id") % 2L).toInt
            val order = (Determinism.jvmHash(s"flco:$id") % 6L).toInt - 1 // -1..4
            val ms = ch == 2 && Determinism.jvmHash(s"flcm:$id") % 2L == 0L
            val chans = (0 until ch).map(c => (0 until 240).map(i =>
              (Determinism.jvmHash(s"flcs:$id:$c:$i") % 4001L - 2000L).toInt))
            Multimodal.MediaRow(id, "audio/flac",
              graft.operators.Flac.encode(8000, 16, chans,
                blockSize = 192, order = order, midSide = ms), 0, 0)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("channels").cast("long").as("channels"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_samples"), col("duration_ms"), col("rms_e3"))
      },
      Some(s"""WITH cfg AS (
          SELECT doc_id,
            1 + (${Determinism.duckHash("'flcc:' || CAST(doc_id AS VARCHAR)")} % 2) AS ch
          FROM documents
        ), smp AS (
          SELECT doc_id, ch,
            CAST(${Determinism.duckHash(
              "'flcs:' || CAST(doc_id AS VARCHAR) || ':' || CAST(c AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 4001 - 2000
              AS BIGINT) AS s
          FROM (SELECT doc_id, ch, unnest(generate_series(0, CAST(ch - 1 AS BIGINT))) AS c
                FROM cfg),
            unnest(generate_series(0, 239)) AS g(i)
        ), agg AS (
          SELECT doc_id, sum(s * s) AS ss, count(*) AS n FROM smp GROUP BY doc_id
        )
        SELECT c.doc_id, 'flac' AS kind, CAST(c.ch AS BIGINT) AS channels,
          CAST(8000 AS BIGINT) AS sample_rate, CAST(240 AS BIGINT) AS n_samples,
          CAST(30 AS BIGINT) AS duration_ms,
          CAST(floor(1000.0 * sqrt(CAST(a.ss AS DOUBLE) / a.n) / 32767.0) AS BIGINT) AS rms_e3
        FROM cfg c JOIN agg a ON a.doc_id = c.doc_id""")),

    QueryDef("q139_multimodal_ogg_meta",
      // the Ogg-Opus metadata lane (MediaCodecs.decodeOggOpus — real RFC
      // 3533 page walk with the non-reflected CRC-32 verified, RFC 7845
      // OpusHead): hash-picked channels / pre-skips / input rates / page
      // counts synthesize structurally-valid streams, the decoder
      // re-derives duration from the last granule on the 48 kHz Opus
      // clock, and DuckDB recomputes every field from the same draws
      // (Opus PCM needs the CELT/SILK codec and stays undecoded — the
      // MP3/MP4 metadata-plane contract).
      (s, dir) => {
        import s.implicits._
        val rates = Seq(8000L, 16000L, 48000L)
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions { it =>
          it.map { id =>
            val ch = 1 + (Determinism.jvmHash(s"oggc:$id") % 2L).toInt
            val ps = (Determinism.jvmHash(s"oggp:$id") % 960L).toInt
            val rate = rates((Determinism.jvmHash(s"oggr:$id") % 3L).toInt)
            val np = 1 + (Determinism.jvmHash(s"oggn:$id") % 3L).toInt
            val step = 960L + (Determinism.jvmHash(s"oggs:$id") % 8L) * 120L
            Multimodal.MediaRow(id, "audio/ogg",
              graft.operators.MediaCodecs.encodeOggOpus(ch, ps, rate,
                (1 to np).map(_ * step)), 0, 0)
          }
        }.toDF()
        Multimodal.extractDecoded(s, media)
          .select(col("doc_id"), col("kind"),
            col("channels").cast("long").as("channels"),
            col("sample_rate").cast("long").as("input_rate"),
            col("n_samples").as("n_samples_48k"), col("duration_ms"),
            col("rms_e3").as("pre_skip"))
      },
      Some(s"""WITH draws AS (
          SELECT doc_id,
            1 + (${Determinism.duckHash("'oggc:' || CAST(doc_id AS VARCHAR)")} % 2) AS ch,
            ${Determinism.duckHash("'oggp:' || CAST(doc_id AS VARCHAR)")} % 960 AS ps,
            ([8000,16000,48000])[CAST(${Determinism.duckHash("'oggr:' || CAST(doc_id AS VARCHAR)")} % 3 AS INT) + 1] AS rate,
            1 + (${Determinism.duckHash("'oggn:' || CAST(doc_id AS VARCHAR)")} % 3) AS np,
            960 + (${Determinism.duckHash("'oggs:' || CAST(doc_id AS VARCHAR)")} % 8) * 120 AS step
          FROM documents)
        SELECT doc_id, 'ogg' AS kind, CAST(ch AS BIGINT) AS channels,
          CAST(rate AS BIGINT) AS input_rate,
          CAST(greatest(0, np * step - ps) AS BIGINT) AS n_samples_48k,
          CAST(greatest(0, np * step - ps) * 1000 // 48000 AS BIGINT) AS duration_ms,
          CAST(ps AS BIGINT) AS pre_skip
        FROM draws""")),

    QueryDef("q74_multimodal_decode",
      // the decoder itself is the documented stub (no codec in this
      // container), but the stub is DETERMINISTIC byte statistics — so the
      // whole mapPartitions plumbing is still exactly oracle-checkable:
      // DuckDB recomputes the byte stats from the hex rendering of the
      // same UTF-8 payload
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
        Multimodal.extractFeatures(s, media).toDF()
      },
      Some(s"""WITH m AS (
          SELECT doc_id, hex(encode(text)) AS hx,
            CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
            320 + ${Determinism.duckSeeded("w", "doc_id")} % 320 AS width,
            240 + ${Determinism.duckSeeded("h", "doc_id")} % 240 AS height
          FROM documents
        )
        SELECT doc_id, n_bytes,
          CAST(COALESCE(list_aggregate(list_transform(generate_series(1, CAST(n_bytes AS INT)),
            i -> CAST('0x' || substr(hx, 2*i-1, 2) AS BIGINT)), 'sum'), 0) AS BIGINT) AS byte_sum,
          CAST(CASE WHEN n_bytes > 0 THEN CAST('0x' || substr(hx, 1, 2) AS BIGINT)
               ELSE -1 END AS INT) AS head_byte,
          (width * 1000) // height AS aspect_e3,
          'fake-v1' AS feature_version
        FROM m""")),

    QueryDef("q148_crawl_pipeline",
      // the END-TO-END crawl curation funnel as ONE oracle-gated plan —
      // the composition every stage query (q136 ingest, q133 URL layer,
      // q140-class gates, q20-class dedup) exists to serve: a synthetic
      // 200-response WARC archive (hash-drawn URLs/bodies, planted
      // short-body and duplicate classes, malformed records injected
      // mid-file) streams through the REAL record walk
      // (readResponsesStreaming), then normalize → full-PSL registered
      // domain → blocklist → per-domain cap (keep 3) → token-count gate
      // → exact content dedup (earliest record wins), each stage a flag
      // column and `kept` their conjunction. DuckDB re-derives every
      // row ARITHMETICALLY from the same hash draws (the codec-oracle
      // idiom applied to the container): any drift in the WARC framing,
      // resync, URL algebra, PSL match, window ranks, or dedup keys
      // shifts a flag and fails the hash.
      (s, dir) => {
        import graft.functions.{Psl, UrlFunctions}
        import graft.functions.TextFunctions
        import org.apache.spark.sql.expressions.Window
        val root = ensureCrawlFixture()
        val gi = col("rec_idx") - 1 // responses sit after the warcinfo
        val blocklist = Seq("site3.com", "site7.github.io")
        val capW = Window.partitionBy(col("reg_domain"))
          .orderBy(Determinism.seeded("ccap", col("gi")), col("gi"))
        val dupW = Window.partitionBy(col("body")).orderBy(col("gi"))
        WarcSource.readResponsesStreaming(s, root)
          .withColumn("gi", gi)
          .withColumn("norm_url", UrlFunctions.normalizeUrl(col("url")))
          .withColumn("reg_domain", Psl.registeredDomain(UrlFunctions.hostOf(col("url"))))
          .withColumn("blocked", col("reg_domain").isInCollection(blocklist).cast("long"))
          .withColumn("cap_rank", row_number().over(capW).cast("long"))
          .withColumn("ntoks", size(TextFunctions.tokens(col("body"))).cast("long"))
          .withColumn("gate_ok", (col("ntoks") >= 8).cast("long"))
          .withColumn("dup_rank", row_number().over(dupW).cast("long"))
          .withColumn("kept", (col("blocked") === 0 && col("cap_rank") <= 3 &&
            col("gate_ok") === 1 && col("dup_rank") === 1).cast("long"))
          .select(col("gi"), col("norm_url"), col("reg_domain"), col("blocked"),
            col("cap_rank"), col("ntoks"), col("gate_ok"), col("dup_rank"), col("kept"))
      },
      Some {
        import graft.functions.Psl
        def d(st: String) = Determinism.duckSeeded(st, "i")
        val hw = Determinism.duckHash(
          "'cbw:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
        s"""WITH gen AS (SELECT CAST(t.i AS BIGINT) AS i FROM range(200) t(i)),
          drw AS (
            SELECT i,
              CASE WHEN ${d("cus")} % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
              (['', 'www.', 'WWW.', 'cdn.'])[CAST(${d("cuc")} % 4 AS INT) + 1] AS sub,
              (['com', 'org', 'co.uk', 'github.io', 'kawasaki.jp',
                'city.kawasaki.jp'])[CAST(${d("cux")} % 6 AS INT) + 1] AS sfx,
              CAST(${d("cub")} % 25 AS VARCHAR) AS ub,
              CAST(${d("cua")} % 40 AS VARCHAR) AS ua,
              ${d("cup")} % 4 AS updraw,
              (['', '?utm_source=tw&b=2&a=1', '?b=2&a=1',
                '?a=1&utm_campaign=z&fbclid=x1'])[CAST(${d("cuq")} % 4 AS INT) + 1] AS qs,
              CASE WHEN i % 11 = 7 THEN 3 ELSE 8 + ${d("cbk")} % 20 END AS k
            FROM gen
          ),
          w0 AS (
            SELECT i, list_transform(range(CAST(k AS INT)),
              j -> 'w' || CAST($hw % 50 AS VARCHAR)) AS words
            FROM drw
          ),
          w1 AS (
            SELECT a.i, CASE WHEN a.i % 5 = 4 THEN b.words ELSE a.words END AS words
            FROM w0 a LEFT JOIN w0 b ON b.i = a.i - 4
          ),
          bod AS (
            SELECT i, array_to_string(words, ' ') AS body,
              CAST(len(words) AS BIGINT) AS ntoks
            FROM w1
          ),
          raw AS (
            SELECT i,
              scheme || '://' || sub || 'site' || ub || '.' || sfx ||
              (CASE WHEN updraw = 0 THEN
                (CASE WHEN scheme = 'https' THEN ':443' ELSE ':80' END) ELSE '' END) ||
              '/p' || ua || qs AS raw_url
            FROM drw
          ),
          n0 AS (
            SELECT i AS doc_id, raw_url,
              ${graft.functions.UrlFunctions.duckNormalizeUrl("raw_url")} AS norm_url,
              ${graft.functions.UrlFunctions.duckHostOf("raw_url")} AS host
            FROM raw
          ), ${Psl.duckRegDomainCtes("n0", "doc_id", "host")},
          f0 AS (
            SELECT n0.doc_id AS i, n0.norm_url, pslr.reg_domain,
              CAST(CASE WHEN pslr.reg_domain IN ('site3.com', 'site7.github.io')
                THEN 1 ELSE 0 END AS BIGINT) AS blocked,
              b.body, b.ntoks
            FROM n0 JOIN pslr USING (doc_id) JOIN bod b ON b.i = n0.doc_id
          ),
          f1 AS (
            SELECT i AS gi, norm_url, reg_domain, blocked,
              CAST(row_number() OVER (PARTITION BY reg_domain
                ORDER BY ${Determinism.duckSeeded("ccap", "i")}, i) AS BIGINT) AS cap_rank,
              ntoks,
              CAST(CASE WHEN ntoks >= 8 THEN 1 ELSE 0 END AS BIGINT) AS gate_ok,
              CAST(row_number() OVER (PARTITION BY body ORDER BY i) AS BIGINT) AS dup_rank
            FROM f0
          )
          SELECT gi, norm_url, reg_domain, blocked, cap_rank, ntoks, gate_ok, dup_rank,
            CAST(CASE WHEN blocked = 0 AND cap_rank <= 3 AND gate_ok = 1 AND dup_rank = 1
              THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM f1"""
      }),

    QueryDef("q150_robots_exclusion",
      // robots.txt exclusion (RFC 9309 — the crawl front door's FIRST
      // gate, before any fetch lands in a WARC): a REAL parser over
      // per-domain robots.txt fixtures — line walk (comments, blanks,
      // case-insensitive directives), RFC group semantics (stacked
      // User-agent lines share a block; a rule line binds to every
      // agent of its block; ALL groups of the matched agent merge,
      // §2.2.1), most-specific agent selection (the `graftbot` groups
      // beat `*` when any exist — including files with no `*` group at
      // all), and longest-path-
      // prefix rule precedence with allow winning ties; unmatched paths
      // default to allowed. All column algebra — two keyed windows
      // (block assignment, per-URL best rule) and broadcast-sized rule
      // tables; at 100 TB the rules side stays a per-domain broadcast
      // while the URL stream never shuffles. DuckDB regenerates the
      // same robots TEXT from the fixture's hash draws and replays the
      // parse + precedence algebra line for line.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val root = ensureRobotsFixture()
        val txt = s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
          .load(root)
          .select(regexp_extract(col("path"), "([^/]+)\\.txt$", 1).as("host"),
            col("content").cast("string").as("text"))
        val lines = txt
          .select(col("host"), posexplode(split(col("text"), "\n")).as(Seq("lno", "l0")))
          .withColumn("line", trim(col("l0")))
          .filter(col("line") =!= "" && !col("line").startsWith("#"))
          .withColumn("directive", lower(trim(substring_index(col("line"), ":", 1))))
          .withColumn("v", trim(expr("substring(line, instr(line, ':') + 1)")))
          .withColumn("is_ua", col("directive") === "user-agent")
        val wD = Window.partitionBy(col("host")).orderBy(col("lno"))
        val blocks = lines
          .withColumn("prev_ua", coalesce(lag(col("is_ua"), 1).over(wD), lit(false)))
          .withColumn("block",
            sum((col("is_ua") && !col("prev_ua")).cast("int")).over(wD))
        val agents = blocks.filter(col("is_ua"))
          .select(col("host"), col("block"), lower(col("v")).as("agent"))
        val rules = blocks.filter(col("directive").isin("allow", "disallow"))
          .select(col("host"), col("block"),
            (col("directive") === "allow").cast("long").as("allow"),
            col("v").as("rpath"))
        // RFC 9309 group selection: graftbot's groups when ANY exist
        // (even in a file with no `*` group at all), else the `*`
        // groups — and ALL groups of the chosen agent merge (§2.2.1),
        // not just the first
        val agentSets = agents.filter(col("agent").isin("*", "graftbot"))
        val chosenAgent = agentSets.groupBy(col("host"))
          .agg(max((col("agent") === "graftbot").cast("int")).as("hasbot"))
          .select(col("host"), when(col("hasbot") === 1, lit("graftbot"))
            .otherwise(lit("*")).as("cagent"))
        val cblk = agentSets.join(chosenAgent, "host")
          .filter(col("agent") === col("cagent"))
          .select(col("host"), col("block")).distinct()
        val eff = rules.join(cblk, Seq("host", "block"))
          .select(col("host"), col("allow"), col("rpath"))
        def dr(st: String, m: Int) =
          pmod(Determinism.seeded(st, col("uid")), lit(m.toLong))
        val urls = s.range(300).select(col("id").as("uid"))
          .withColumn("host",
            concat(lit("d"), dr("run", 40).cast("string"), lit(".example")))
          .withColumn("path", element_at(array(
            concat(lit("/p"), dr("rupp", 4).cast("string")),
            concat(lit("/p"), dr("rupp", 4).cast("string"), lit("/open/x")),
            concat(lit("/q"), dr("rupq", 3).cast("string")),
            concat(lit("/r/"), dr("rupr", 5).cast("string")),
            lit("/secret/a")), (dr("rup", 5) + 1).cast("int")))
        val m = urls.join(eff, Seq("host"), "left")
          .withColumn("hit",
            col("rpath").isNotNull && startswith(col("path"), col("rpath")))
        val wU = Window.partitionBy(col("uid")).orderBy(
          when(col("hit"), length(col("rpath"))).otherwise(-1).desc,
          col("allow").desc, col("rpath").asc)
        m.withColumn("rk", row_number().over(wU)).filter(col("rk") === 1)
          .select(col("uid"), col("host"), col("path"),
            when(col("hit"), col("rpath")).otherwise(lit("")).as("mrule"),
            when(col("hit"), col("allow")).otherwise(lit(1L)).as("allowed"))
      },
      Some {
        def h(st: String) = Determinism.duckSeeded(st, "n")
        def d(st: String) = Determinism.duckSeeded(st, "uid")
        s"""WITH rb AS (
          SELECT 'd' || CAST(t.n AS VARCHAR) || '.example' AS host,
            '# graft fixture' || chr(10) ||
            (CASE WHEN ${h("rbo")} % 5 <> 0 THEN
              'User-agent: *' || chr(10) ||
              'Disallow: /p' || CAST(${h("rbd1")} % 4 AS VARCHAR) || chr(10) ||
              (CASE WHEN ${h("rba")} % 2 = 0 THEN
                'Allow: /p' || CAST(${h("rbd1")} % 4 AS VARCHAR) || '/open' || chr(10)
                ELSE '' END) ||
              (CASE WHEN ${h("rbd2")} % 3 > 0 THEN
                'Disallow: /q' || CAST(${h("rbd2")} % 3 AS VARCHAR) || chr(10)
                ELSE '' END) ||
              chr(10) ELSE '' END) ||
            (CASE WHEN ${h("rbg")} % 3 = 0 OR ${h("rbo")} % 5 = 0 THEN
              'User-agent: graftbot' || chr(10) || 'Allow: /' || chr(10) ||
              'Disallow: /secret' || chr(10) || chr(10) ELSE '' END) ||
            (CASE WHEN ${h("rbo")} % 5 <> 0 AND ${h("rbm")} % 4 = 0 THEN
              'User-agent: *' || chr(10) || 'Disallow: /r' || chr(10)
              ELSE '' END) AS text
          FROM (SELECT CAST(i AS BIGINT) AS n FROM range(40) r(i)) t
        ),
        ln0 AS (
          SELECT host, CAST(t.i AS BIGINT) AS lno, trim(ls[CAST(t.i AS INT)]) AS line
          FROM (SELECT host, string_split(text, chr(10)) AS ls FROM rb),
            unnest(range(1, len(ls) + 1)) AS t(i)
        ),
        ln AS (
          SELECT host, lno, line,
            lower(trim(split_part(line, ':', 1))) AS directive,
            trim(substr(line, instr(line, ':') + 1)) AS v,
            (lower(trim(split_part(line, ':', 1))) = 'user-agent') AS is_ua
          FROM ln0 WHERE line <> '' AND NOT starts_with(line, '#')
        ),
        ln1 AS (
          SELECT host, lno, directive, v, is_ua,
            COALESCE(lag(is_ua) OVER (PARTITION BY host ORDER BY lno), FALSE) AS prev_ua
          FROM ln
        ),
        blk AS (
          SELECT host, lno, directive, v, is_ua,
            SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
              OVER (PARTITION BY host ORDER BY lno
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block
          FROM ln1
        ),
        agents AS (SELECT host, block, lower(v) AS agent FROM blk WHERE is_ua),
        rules AS (
          SELECT host, block,
            CAST(CASE WHEN directive = 'allow' THEN 1 ELSE 0 END AS BIGINT) AS allow,
            v AS rpath
          FROM blk WHERE directive IN ('allow', 'disallow')
        ),
        chosen AS (
          SELECT host, CASE WHEN bool_or(agent = 'graftbot')
            THEN 'graftbot' ELSE '*' END AS cagent
          FROM agents WHERE agent IN ('*', 'graftbot') GROUP BY host
        ),
        cblk AS (
          SELECT DISTINCT a.host, a.block
          FROM agents a JOIN chosen c ON c.host = a.host AND a.agent = c.cagent
        ),
        eff AS (
          SELECT r.host, r.allow, r.rpath
          FROM rules r JOIN cblk c ON c.host = r.host AND r.block = c.block
        ),
        urls AS (
          SELECT uid, 'd' || CAST(${d("run")} % 40 AS VARCHAR) || '.example' AS host,
            (['/p' || CAST(${d("rupp")} % 4 AS VARCHAR),
              '/p' || CAST(${d("rupp")} % 4 AS VARCHAR) || '/open/x',
              '/q' || CAST(${d("rupq")} % 3 AS VARCHAR),
              '/r/' || CAST(${d("rupr")} % 5 AS VARCHAR),
              '/secret/a'])[CAST(${d("rup")} % 5 AS INT) + 1] AS path
          FROM (SELECT CAST(i AS BIGINT) AS uid FROM range(300) r(i))
        ),
        m AS (
          SELECT u.uid, u.host, u.path, e.allow, e.rpath,
            (e.rpath IS NOT NULL AND starts_with(u.path, e.rpath)) AS hit
          FROM urls u LEFT JOIN eff e ON e.host = u.host
        ),
        rk AS (
          SELECT uid, host, path, allow, rpath, hit,
            row_number() OVER (PARTITION BY uid ORDER BY
              CASE WHEN hit THEN length(rpath) ELSE -1 END DESC,
              allow DESC, rpath ASC) AS rk
          FROM m
        )
        SELECT uid, host, path,
          CASE WHEN hit THEN rpath ELSE '' END AS mrule,
          CAST(CASE WHEN hit THEN allow ELSE 1 END AS BIGINT) AS allowed
        FROM rk WHERE rk = 1"""
      }),

    QueryDef("q146_mp4_sample_tables",
      // the MP4 sample-table walk (MediaCodecs.decodeMp4Samples — ISO
      // 14496-12 stts/stsc/stsz/stco box arithmetic, no codec): the
      // frame-accurate (dts, size, chunk, absolute offset) capability
      // the compressed container needs for frame slicing at 100 TB —
      // the q132 Y4M lane's equivalent for real-world video. Fixtures:
      // hash-picked sample counts, a TWO-run stts (delta change
      // mid-track), per-sample hash sizes, and hash-picked
      // samples-per-chunk (so stsc runs, partial last chunks, and the
      // stco prefix-sum all exercise). The decoder re-derives every
      // field by walking the real boxes; DuckDB recomputes dts from the
      // run algebra, chunk from floor-div, and offsets from the closed
      // form base(ns, nchunks) + size prefix-sum — any drift in the box
      // framing, run expansion, or chunk arithmetic shifts a value and
      // fails the hash. (base = 401 + 4·ns + 4·nchunks: ftyp 24 +
      // fixed moov skeleton 353 + stts-run 16 + stsz/stco tables +
      // mdat header 8 — pinned byte-exact in MediaCodecsSpec.)
      (s, dir) => {
        import s.implicits._
        import graft.operators.MediaCodecs
        val ids = Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
          .filter(col("doc_id") % 7 === 0)
        ids.mapPartitions { it =>
          it.flatMap { id =>
            val ns = 8 + (Determinism.jvmHash(s"m4n:$id") % 40L).toInt
            val d1 = 256 + (Determinism.jvmHash(s"m4a:$id") % 256L).toInt
            val d2 = 128 + (Determinism.jvmHash(s"m4b:$id") % 128L).toInt
            val spc = 1 + (Determinism.jvmHash(s"m4c:$id") % 4L).toInt
            val sizes = (0 until ns).map(i =>
              50 + (Determinism.jvmHash(s"m4s:$id:$i") % 200L).toInt)
            val b = MediaCodecs.encodeMp4Samples(90000L, 1L,
              Seq((ns / 2, d1), (ns - ns / 2, d2)), sizes, spc)
            MediaCodecs.decodeMp4Samples(b).getOrElse(Seq.empty).map(sm =>
              (id, sm.sampleIdx, sm.dts, sm.size, sm.chunkIdx, sm.offset))
          }
        }.toDF("doc_id", "sample_idx", "dts", "ssize", "chunk_idx", "off")
      },
      Some {
        def h(st: String) = Determinism.duckHash(
          s"'$st:' || CAST(doc_id AS VARCHAR)")
        val hs = Determinism.duckHash(
          "'m4s:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
        s"""WITH draws AS (
          SELECT doc_id,
            8 + ${h("m4n")} % 40 AS ns,
            256 + ${h("m4a")} % 256 AS d1,
            128 + ${h("m4b")} % 128 AS d2,
            1 + ${h("m4c")} % 4 AS spc
          FROM documents WHERE doc_id % 7 = 0
        ), samp AS (
          SELECT doc_id, ns, d1, d2, spc, CAST(t.i AS BIGINT) AS i,
            50 + $hs % 200 AS sz
          FROM draws, unnest(range(ns)) AS t(i)
        )
        SELECT doc_id, i AS sample_idx,
          CAST(CASE WHEN i < ns // 2 THEN i * d1
            ELSE (ns // 2) * d1 + (i - ns // 2) * d2 END AS BIGINT) AS dts,
          CAST(sz AS BIGINT) AS ssize,
          CAST(i // spc AS BIGINT) AS chunk_idx,
          CAST(401 + 4 * ns + 4 * ((ns + spc - 1) // spc) +
            COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM samp"""
      })
  )
}
