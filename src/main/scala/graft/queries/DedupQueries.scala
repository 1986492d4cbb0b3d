package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Tables}
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator demonstrations over `documents`, each with a DuckDB
  * oracle. See [[graft.operators.Dedup]] for the scale rationale.
  */
object DedupQueries extends QueryModule {

  private val Perms = 8
  private val Bands = 4
  private val RowsPerBand = 2
  private val ShingleK = 3

  // Shared DuckDB fragments (kept in lock-step with operators.Dedup).
  private val duckToks = TextFunctions.duckTokens("text")

  /** `bands AS (...), pairs AS (...)` CTEs mirroring
    * [[Dedup.lshCandidatePairs]] (exact long packing of bandKeys). */
  private def duckPairCtes: String = {
    val bandSelects = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}")
        .reduce((a, x) => s"($a * ${Dedup.MixMod} + $x)")
      s"SELECT doc_id, $b AS band, CAST($key AS BIGINT) AS key FROM sigs"
    }.mkString(" UNION ALL ")
    s"""bands AS ($bandSelects),
      pairs AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)"""
  }
  private def duckSigs(perms: Int): String = {
    val mhs = (0 until perms).map(j => s"${Dedup.duckMinhashFromHashes("hs", j)} AS mh$j").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
        s AS (SELECT doc_id, ${Dedup.duckShingles("toks", ShingleK)} AS sh FROM t WHERE len(toks) > 0),
        sh AS (SELECT doc_id, ${Dedup.duckShingleHashes("sh")} AS hs FROM s WHERE len(sh) > 0),
        sigs AS (SELECT doc_id, $mhs FROM sh)"""
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q20_dedup_exact",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"),
            Determinism.portableHash(TextFunctions.normalizeWs(col("text"))).as("content_hash"))
          .groupBy(col("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
      },
      Some(s"""SELECT ${Determinism.duckHash(TextFunctions.duckNormalizeWs("text"))} AS content_hash,
        min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS group_size
        FROM documents GROUP BY 1""")),

    QueryDef("q21_minhash_signatures",
      (s, dir) => Dedup.minhashSignatures(
        Tables.load(s, dir, "documents"), "doc_id", "text", 4, ShingleK),
      Some(s"""${duckSigs(4)} SELECT * FROM sigs""")),

    QueryDef("q22_lsh_candidate_pairs",
      (s, dir) => {
        val sigs = Dedup.minhashSignatures(
          Tables.load(s, dir, "documents"), "doc_id", "text", Perms, ShingleK).cache()
        // one pass: explode per-row band structs rather than unioning the
        // (recomputed) signature plan once per band
        val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", Bands, RowsPerBand)
        val sa = col("doc_id").as("aid") +: sigs.columns.filter(_.startsWith("mh")).toSeq.map(c => sigs(c).as(s"a_$c"))
        val sb = col("doc_id").as("bid") +: sigs.columns.filter(_.startsWith("mh")).toSeq.map(c => sigs(c).as(s"b_$c"))
        val agree = (0 until Perms).map(j =>
          when(col(s"a_mh$j") === col(s"b_mh$j"), 1L).otherwise(0L)).reduce(_ + _)
        pairs
          .join(sigs.select(sa: _*), col("a") === col("aid"))
          .join(sigs.select(sb: _*), col("b") === col("bid"))
          .select(col("a"), col("b"), agree.as("n_agree"))
      },
      Some {
        val agree = (0 until Perms).map(j =>
          s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END").mkString(" + ")
        s"""${duckSigs(Perms)},
          $duckPairCtes
          SELECT a, b, CAST($agree AS BIGINT) AS n_agree
          FROM pairs JOIN sigs sa ON a = sa.doc_id JOIN sigs sb ON b = sb.doc_id"""
      }),

    QueryDef("q93_dedup_clusters",
      // dedup RESOLUTION — the step every candidate-pair detector feeds:
      // LSH pairs (q22's edges) → connected components (min-label
      // propagation, see Dedup.connectedComponents) → canonical keep-list.
      // cluster_id = min doc_id of the component; keep = 1 on exactly the
      // canonical survivor, so `WHERE keep = 1` is the post-dedup corpus
      // and `WHERE keep = 0` is the drop-list. Singleton docs (no candidate
      // pair, including blank docs with no signature) are their own
      // cluster and survive. Every round is a keyed agg + join on longs —
      // the 100 TB path; the oracle replays reachability with a recursive
      // CTE (min over the reachable set = component min).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", Perms, ShingleK)
        val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", Bands, RowsPerBand)
        val cc = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        val sizes = cc.groupBy(col("cluster").as("cid"))
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, cc("cluster") === sizes("cid"))
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
            when(col("id") === col("cluster"), 1L).otherwise(0L).as("keep"),
            col("cluster_size"))
      },
      Some(
        s"""${duckSigs(Perms).replaceFirst("WITH ", "WITH RECURSIVE ")},
          $duckPairCtes,
          edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
          reach(u, v) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
          ),
          cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
          SELECT doc_id, cluster_id,
            CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS keep,
            CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
          FROM cl""")),

    QueryDef("q23_simhash",
      (s, dir) => Dedup.simhashSignature(
        Tables.load(s, dir, "documents"), "doc_id", "text", 16),
      Some {
        val votes = (0 until 16).map(i =>
          s"${Dedup.duckSimhashBitVote("hs", i)} AS v$i").mkString(", ")
        val sig = (0 until 16).map(i =>
          s"CASE WHEN v$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")
        s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          h AS (SELECT doc_id, list_transform(toks, tk -> ${Determinism.duckHash("'sh:' || tk")}) AS hs
                FROM t WHERE len(toks) > 0),
          v AS (SELECT doc_id, $votes FROM h)
          SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM v"""
      }),

    QueryDef("q28_simhash_neardup_pairs",
      (s, dir) => {
        // near-dups = signatures within hamming distance 1. Blocking is
        // 2-band OR-blocking (the standard k+1-bands-for-hamming-k scheme):
        // a pair differing in at most 1 bit differs in at most one of the
        // two 8-bit bands, so it MUST collide on the other band — recall is
        // guaranteed by construction. (Top-byte-only blocking silently
        // dropped pairs whose flipped bit was in the top byte.) Join stays
        // bucketed — pair space = in-bucket collisions; a tiny-vocabulary
        // corpus collapsing into few buckets is re-split by AQE skew-join.
        val sig = Dedup.simhashSignature(
          Tables.load(s, dir, "documents"), "doc_id", "text", 16).cache()
        val banded = sig.select(col("doc_id"), col("simhash"), explode(array(
            struct(lit(0).as("band"), expr("simhash div 256").as("key")),
            struct(lit(1).as("band"), expr("simhash % 256").as("key")))).as("bk"))
          .select(col("doc_id"), col("simhash"),
            col("bk.band").as("band"), col("bk.key").as("key"))
        val l = banded.as("l"); val r = banded.as("r")
        l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            expr("CAST(bit_count(l.simhash ^ r.simhash) AS BIGINT)").as("hamming"))
          .filter(col("hamming") <= 1)
          .distinct()
      },
      Some {
        val votes = (0 until 16).map(i =>
          s"${Dedup.duckSimhashBitVote("hs", i)} AS v$i").mkString(", ")
        val sig = (0 until 16).map(i =>
          s"CASE WHEN v$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")
        s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          h AS (SELECT doc_id, list_transform(toks, tk -> ${graft.core.Determinism.duckHash("'sh:' || tk")}) AS hs
                FROM t WHERE len(toks) > 0),
          v AS (SELECT doc_id, $votes FROM h),
          sg AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM v),
          b AS (
            SELECT doc_id, simhash, 0 AS band, simhash // 256 AS key FROM sg
            UNION ALL
            SELECT doc_id, simhash, 1 AS band, simhash % 256 AS key FROM sg
          )
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
            CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
          FROM b l JOIN b r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
          WHERE bit_count(xor(l.simhash, r.simhash)) <= 1"""
      }),

    QueryDef("q36_winnowing_fingerprints",
      // winnowing document fingerprints (the rolling-hash scheme behind
      // MOSS-style near-dup detection): gram hashes = the one-md5-pass
      // shingle hashes, exploded to rows BEFORE windowing (the Generate
      // node is the inlining barrier — a lambda referencing the gram array
      // would re-evaluate it per window), then each length-5 window keeps
      // its minimum via a frame-bounded running min and the per-doc
      // fingerprint SET is the sorted distinct mins. Narrow + one keyed
      // window + one aggregate — scales like the signature queries.
      (s, dir) => {
        val Wn = 5
        val grams = Tables.load(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            posexplode(Dedup.shingleHashes(Dedup.shingles(col("toks"), ShingleK))))
          .toDF("doc_id", "pos", "h")
        val wcnt = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        val wmin = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("pos")).rowsBetween(0, Wn - 1)
        grams
          .withColumn("m", count(lit(1)).over(wcnt))
          .withColumn("wmin", min(col("h")).over(wmin))
          .filter(col("pos") <= col("m") - Wn)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("long").as("n_windows"),
            sort_array(array_distinct(collect_list(col("wmin")))).as("fps"))
          .select(col("doc_id"), col("n_windows"),
            size(col("fps")).cast("long").as("n_fps"),
            Determinism.portableHash(array_join(col("fps"), " ")).as("fp_hash"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
        s AS (SELECT doc_id, ${Dedup.duckShingleHashes(Dedup.duckShingles("toks", ShingleK))} AS hs FROM t),
        g AS (SELECT doc_id, CAST(generate_subscripts(hs, 1) AS BIGINT) - 1 AS pos,
                unnest(hs) AS h, CAST(len(hs) AS BIGINT) AS m
              FROM s),
        w AS (SELECT doc_id, pos, m,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin
              FROM g),
        a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                list_sort(list_distinct(list(wmin))) AS fps
              FROM w WHERE pos <= m - 5 GROUP BY doc_id)
        SELECT doc_id, n_windows, CAST(len(fps) AS BIGINT) AS n_fps,
          ${Determinism.duckHash("array_to_string(fps, ' ')")} AS fp_hash
        FROM a""")),

    QueryDef("q24_ngram_jaccard_pairs",
      (s, dir) => {
        // shingles seen in > MaxDf docs are dropped before pairing: on a
        // skewed corpus the hot-shingle join blocks are the O(n²) failure
        // mode at scale, and ultra-common shingles carry no dedup signal
        val MaxDf = 50
        val docs = Tables.load(s, dir, "documents")
        // shingles carry only their 31-bit portable hash past the explode:
        // the distinct, the df filter, and the inverted self-join all
        // shuffle and compare fixed-width longs, never shingle strings
        val all = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(Dedup.shingles(col("toks"), ShingleK)).as("shingle"))
          .select(col("doc_id"),
            pmod(Determinism.portableHash(col("shingle")), lit(Dedup.MixMod)).as("shingle_h"))
          .distinct()
        val rare = all.groupBy(col("shingle_h")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= MaxDf).select(col("shingle_h"))
        val sh = all.join(rare, "shingle_h").cache()
        val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val l = sh.as("l"); val r = sh.as("r")
        val inter = l.join(r, col("l.shingle_h") === col("r.shingle_h") && col("l.doc_id") < col("r.doc_id"))
          .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(counts.select(col("doc_id").as("a2"), col("n_sh").as("na")), col("a") === col("a2"))
          .join(counts.select(col("doc_id").as("b2"), col("n_sh").as("nb")), col("b") === col("b2"))
          // jaccard >= 1/8 by integer cross-multiplication: 8*inter >= union
          .filter(lit(8) * col("inter") >= col("na") + col("nb") - col("inter"))
          .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
        u AS (SELECT doc_id, unnest(${Dedup.duckShingles("toks", ShingleK)}) AS shingle FROM t),
        s0 AS (SELECT DISTINCT doc_id, ${Determinism.duckHash("shingle")} % ${Dedup.MixMod} AS shingle_h FROM u),
        rare AS (SELECT shingle_h FROM s0 GROUP BY shingle_h HAVING count(*) <= 50),
        s AS (SELECT s0.doc_id, s0.shingle_h FROM s0 JOIN rare ON s0.shingle_h = rare.shingle_h),
        c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM s GROUP BY doc_id),
        i AS (SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
              FROM s l JOIN s r ON l.shingle_h = r.shingle_h AND l.doc_id < r.doc_id
              GROUP BY l.doc_id, r.doc_id)
        SELECT a, b, inter, ca.n_sh AS na, cb.n_sh AS nb
        FROM i JOIN c ca ON a = ca.doc_id JOIN c cb ON b = cb.doc_id
        WHERE 8 * inter >= ca.n_sh + cb.n_sh - inter"""))
  )
}
