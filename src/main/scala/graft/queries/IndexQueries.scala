package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.Tables
import graft.sources.{FileCorpusIndex, FileCorpusIndexConfig, RecordCache}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Persisted file-corpus index + bounded record cache demonstrations
  * (SURVEY §2.1 #6 / §2.11 #59 — the two rows previously covered only by
  * architectural replacements). Each lane runs against a deterministic
  * filesystem fixture and a DuckDB oracle that independently replays the
  * exact reference semantics: the affine index permutation, the windowed
  * grouped order (as a recursive CTE over window states), the capped
  * grouped refresh walk, and the FIFO-with-replace cache closed form.
  */
object IndexQueries extends QueryModule {

  private val FixDir = "/tmp/graft_fixtures"
  private val SrcId = "fcix"
  private val SamplerSeed = 7L

  /** Relative paths in ABSOLUTE-PATH sort order (= index order; the
    * reference sorts the walked candidates, file_corpus.rs:348-350).
    * 6 groups with skewed sizes so the grouped lanes exercise caps,
    * exhaustion, and window underfill. */
  private lazy val IdxFiles: Seq[String] =
    (1 to 12).map(i => f"big/a$i%02d.txt") ++
      (1 to 6).map(i => f"mid/m$i%02d.txt") ++
      Seq("root1.txt", "root2.txt") ++
      (1 to 4).map(i => f"small/s$i%02d.txt") ++
      Seq("tiny/2025-01-01/t01.txt", "tiny/2025-01-02/t02.txt")

  private def groupOf(rel: String): String = {
    val parts = rel.split('/')
    if (parts.length <= 1) "" else parts.dropRight(1).mkString("/")
  }

  private lazy val Total = IdxFiles.length.toLong // 26
  private val Divisor = 4
  private lazy val WSize = Total / Divisor // 6
  // the oracle's affine-permutation constants derive from Total exactly
  // like the engine's (next power of two; see IndexPermutation)
  private lazy val Domain = new graft.core.IndexPermutation(Total, 0, 0).domainSize
  private lazy val Mask = Domain - 1

  private def ensureIndexFixture(): String = {
    val root = Paths.get(FixDir, "corpusidx")
    // reset for hermeticity: a stale file from an older fixture revision
    // would desynchronize the engine's walk from the oracle's literal list
    if (Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(root)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
    IdxFiles.foreach { rel =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, s"body of $rel".getBytes("UTF-8"))
    }
    root.toString
  }

  private def fixtureIndex(s: org.apache.spark.sql.SparkSession): FileCorpusIndex = {
    val root = ensureIndexFixture()
    val fci = new FileCorpusIndex(FileCorpusIndexConfig(root, SrcId, SamplerSeed,
      indexDir = FixDir + "/fciidx", groupWindowDivisor = Divisor))
    fci.rebuild(s) // hermetic: the refresh lanes then READ the persisted parquet
    fci
  }

  /** Literal (idx, rel, grp) VALUES — the oracle's independent copy of the
    * fixture listing. */
  private lazy val duckFiles: String =
    IdxFiles.zipWithIndex.map { case (rel, i) =>
      s"(CAST($i AS BIGINT), '$rel', '${groupOf(rel)}')"
    }.mkString("files(idx, rel, grp) AS (VALUES ", ", ", ")")

  /** Oracle CTEs deriving the permutation seed + affine params from the
    * same portable-hash construction the engine uses
    * (FileCorpusIndex.orderSeed → IndexPermutation): domain 32 = next
    * power of two over 26, mask 31. */
  private lazy val duckPerm: String =
    s"""seedc AS (SELECT CAST('0x' || substr(md5('fci:$SrcId:$Total:$SamplerSeed'), 1, 8) AS BIGINT) AS s),
       prm AS (SELECT ((s | 1) & $Mask) AS a, ((s >> 1) & $Mask) AS b, s FROM seedc)"""

  /** Recursive window-state CTE replaying grouping.rs:46-139: one level
    * per window, state = per-group cumulative takes (a struct list in
    * group serve order), takes via the closed form
    * `take_g = min(c_g, max(0, window_len - prefix_sum(c)))` with
    * `c_g = min(ceil(window_len/active), remaining_g)` — exactly the
    * reference's in-order pop loop. `emitted`/`rf`/`gord` expose the full
    * grouped order as (pos, idx, rel, grp). */
  private val duckGroupedOrder: String =
    s"""gsz AS (
         SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST('0x' || substr(md5('fcig:' || CAST(s AS VARCHAR) || ':' || grp), 1, 8) AS BIGINT) AS gh
         FROM files CROSS JOIN prm GROUP BY grp, s
       ), win(w, offb, gsb, takes, offa, gsa) AS (
         SELECT -1, CAST(0 AS BIGINT), NULL::STRUCT(g VARCHAR, n BIGINT, cum BIGINT)[],
           NULL::BIGINT[], CAST(0 AS BIGINT),
           (SELECT list({'g': grp, 'n': n, 'cum': CAST(0 AS BIGINT)} ORDER BY gh, grp) FROM gsz)
         UNION ALL
         SELECT w + 1, offa, gsa, takes, offa + list_sum(takes),
           list_transform(range(1, len(gsa) + 1),
             p -> {'g': gsa[p].g, 'n': gsa[p].n, 'cum': gsa[p].cum + takes[p]})
         FROM (
           SELECT w, offa, gsa,
             list_transform(range(1, len(gsa) + 1),
               p -> least(clist[p], greatest(0, wlen - coalesce(list_sum(list_slice(clist, 1, p - 1)), 0)))) AS takes
           FROM (
             SELECT w, offa, gsa, wlen,
               list_transform(gsa, x -> least((wlen + nact - 1) // nact, x.n - x.cum)) AS clist
             FROM (
               SELECT w, offa, gsa, least(rem, $WSize) AS wlen,
                 len(list_filter(gsa, x -> x.cum < x.n)) AS nact
               FROM (SELECT w, offa, gsa,
                       list_sum(list_transform(gsa, x -> x.n - x.cum)) AS rem FROM win)
               WHERE rem > 0
             )
           )
         )
       ), emitted AS (
         SELECT gsb[p].g AS grp, gsb[p].cum AS cumb, takes[p] AS take,
           offb + coalesce(list_sum(list_slice(takes, 1, p - 1)), 0) AS posoff
         FROM (SELECT *, unnest(generate_series(1, len(takes))) AS p FROM win WHERE w >= 0)
       ), rf AS (
         SELECT idx, rel, grp,
           CAST(row_number() OVER (PARTITION BY grp ORDER BY ih, rel) - 1 AS BIGINT) AS grank
         FROM (SELECT f.*,
                 CAST('0x' || substr(md5('fcii:' || CAST(s AS VARCHAR) || ':' || f.grp || '/' || f.rel), 1, 8) AS BIGINT) AS ih
               FROM files f CROSS JOIN prm)
       ), gord AS (
         SELECT CAST(e.posoff + (rf.grank - e.cumb) AS BIGINT) AS pos, rf.idx, rf.rel, rf.grp
         FROM emitted e JOIN rf ON rf.grp = e.grp
           AND rf.grank >= e.cumb AND rf.grank < e.cumb + e.take
       )"""

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q100_file_corpus_index",
      // persisted path index + exact affine permutation paging with a
      // cursor (reference file_corpus.rs:176-248 + mod.rs:316-368): two
      // consecutive pages of 7; the cursor between them lands where the
      // reference's 256-batched reads leave the counter
      (s, dir) => {
        val fci = fixtureIndex(s)
        val (p1, c1) = fci.refreshIndexable(s, 0L, 7)
        val (p2, _) = fci.refreshIndexable(s, c1, 7)
        p1.withColumn("page", lit(0L)).unionByName(p2.withColumn("page", lit(1L)))
          .select(col("page"), col("ord"), col("idx"), col("rel"))
      },
      Some(s"""WITH $duckPerm,
          $duckFiles,
          h1 AS (SELECT t.i AS ctr, ((a * (t.i % $Domain) + b) & $Mask) AS v
                 FROM range(0, $Domain) t(i) CROSS JOIN prm),
          r1 AS (SELECT ctr, v, row_number() OVER (ORDER BY ctr) AS hit FROM h1 WHERE v < $Total),
          -- 26 < the 256 read batch, so page 1 drains a FULL sweep before
          -- noticing its limit; the stored cursor is (last counter + 1) % 26
          s2 AS (SELECT (max(ctr) + 1) % $Total AS st FROM r1),
          h2 AS (SELECT t.i AS j, ((a * ((st + t.i) % $Domain) + b) & $Mask) AS v
                 FROM range(0, $Domain) t(i) CROSS JOIN prm CROSS JOIN s2),
          r2 AS (SELECT j, v, row_number() OVER (ORDER BY j) AS hit FROM h2 WHERE v < $Total),
          u AS (
            SELECT CAST(0 AS BIGINT) AS page, CAST(hit - 1 AS BIGINT) AS ord, CAST(v AS BIGINT) AS idx
            FROM r1 WHERE hit <= 7
            UNION ALL
            SELECT CAST(1 AS BIGINT), CAST(hit - 1 AS BIGINT), CAST(v AS BIGINT)
            FROM r2 WHERE hit <= 7)
        SELECT u.page, u.ord, u.idx, f.rel FROM u JOIN files f ON u.idx = f.idx""")),

    QueryDef("q101_grouped_corpus_order",
      // the full deterministic grouped serve order (grouping.rs:46-139):
      // directory groups interleaved inside windows of total/divisor,
      // per-group items in seeded-hash order
      (s, dir) => {
        val fci = fixtureIndex(s)
        fci.groupedOrder(s)
          .select(col("pos"), col("idx"), col("rel"), col("group").as("grp"))
      },
      Some(s"""WITH RECURSIVE $duckPerm,
          $duckFiles,
          $duckGroupedOrder
        SELECT pos, idx, rel, grp FROM gord""")),

    QueryDef("q102_grouped_refresh_pick",
      // capped grouped refresh from a cursor (file_corpus.rs:509-601):
      // walk the grouped order from position 9 with wraparound, cap every
      // group at ceil(8/6)=2, serve the first 8 taken
      (s, dir) => {
        val fci = fixtureIndex(s)
        val (rows, _) = fci.refreshGrouped(s, 9L, 8)
        rows.select(col("sel"), col("pos"), col("idx"), col("rel"), col("group").as("grp"))
      },
      Some(s"""WITH RECURSIVE $duckPerm,
          $duckFiles,
          $duckGroupedOrder,
          walked AS (SELECT *, (pos - 9 + $Total) % $Total AS walk FROM gord),
          tk AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY walk) AS g2 FROM walked),
          selq AS (
            SELECT *, CAST(row_number() OVER (ORDER BY walk) AS BIGINT) AS sel
            FROM tk WHERE g2 <= (SELECT (8 + count(*) - 1) // count(*) FROM gsz))
        SELECT sel, pos, idx, rel, grp FROM selq WHERE sel <= 8""")),

    QueryDef("q103_record_cache",
      // bounded FIFO-with-replace record cache (ingestion.rs:18-187) over
      // a simulated ingest stream: orders ingested in o_orderkey order,
      // keyed by customer — re-ingests REPLACE, the cap evicts stalest;
      // final contents = top-100 customers by last-touch version
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_custkey").as("id"), col("o_orderkey").as("version"),
            col("o_orderdate").cast("string").as("odate"))
        RecordCache.finalSnapshot(o, "id", "version", 100)
      },
      Some("""WITH latest AS (
            SELECT o_custkey AS id, max(o_orderkey) AS version FROM orders GROUP BY 1
          ), r AS (
            SELECT id, version,
              CAST(row_number() OVER (ORDER BY version DESC, id) AS BIGINT) AS cache_rank
            FROM latest)
        SELECT r.id, r.version, CAST(o.o_orderdate AS VARCHAR) AS odate, r.cache_rank
        FROM r JOIN orders o ON o.o_orderkey = r.version
        WHERE r.cache_rank <= 100"""))
  )
}
