package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.Tables
import graft.operators.{TripletConfig, Triplets}

/** The flagship sampler queries: triplet, pair, and text batches over the
  * `documents` corpus — the reference's three `Sampler` entry points
  * (reference: src/sampler/mod.rs:125-156) as single declarative plans,
  * fully replayed by the DuckDB oracle. See [[graft.operators.Triplets]].
  */
object TripletQueries extends QueryModule {

  private val cfg = TripletConfig()
  private val qaCfg = TripletConfig(anchorTokens = 12, recipeName = "qa_mismatch")
  private val TextDraws = 4
  private val decSampler = graft.functions.KvpPrefixSampler(0.5f, Seq(
    Seq(graft.functions.KvpField("lang", Seq("en", "de", "fr")),
      graft.functions.KvpField("src", Seq("web", "book"))),
    Seq(graft.functions.KvpField("year", Seq("2023", "2024")))))

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q80_triplet_batch",
      (s, dir) => Triplets.tripletRows(Tables.load(s, dir, "documents"), cfg),
      Some(Triplets.duckTripletSql(cfg))),

    QueryDef("q81_pair_batch",
      (s, dir) => Triplets.pairRows(Tables.load(s, dir, "documents"), cfg),
      Some(Triplets.duckPairSql(cfg))),

    QueryDef("q82_text_batch",
      (s, dir) => Triplets.textRows(Tables.load(s, dir, "documents"), cfg, TextDraws),
      Some(Triplets.duckTextSql(cfg, TextDraws))),

    QueryDef("q83_triplet_fallback_lane",
      // a sparse corpus (1 in 50 docs) forces singleton (source, split)
      // pools → those anchors take the cross-source same-split fallback
      // with the recipe suffixed _fallback_same_split
      (s, dir) => Triplets.tripletRowsWithFallback(
        Tables.load(s, dir, "documents").filter(org.apache.spark.sql.functions.expr("doc_id % 50 = 0")), cfg),
      Some(Triplets.duckFallbackSql(cfg, "doc_id % 50 = 0"))),

    QueryDef("q84_triplet_wrong_date",
      // synthetic publication date (docs carry none): hash-derived day so
      // dates decorrelate from the source assignment pattern
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.core.Determinism
        Triplets.tripletRowsWrongDate(Tables.load(s, dir, "documents"), cfg,
          concat(lit("2025-01-0"),
            (pmod(Determinism.seeded("day", col("doc_id")), lit(5)) + 1).cast("string")),
          "wrong_publication_date")
      },
      Some(Triplets.duckWrongDateSql(cfg,
        s"'2025-01-0' || CAST(${graft.core.Determinism.duckSeeded("day", "doc_id")} % 5 + 1 AS VARCHAR)",
        "wrong_publication_date"))),

    QueryDef("q85_triplet_bm25_negative",
      // the BM25 negative backend on the sampler path: negatives are the
      // top-3 rotation pick over per-pool BM25 scores of the anchor's own
      // query tokens; anchors with an empty score intersection take the
      // deterministic-random rank-pick (lane column marks which). The
      // synthetic corpus has a 31-token vocabulary so the bm25 lane
      // dominates here; the fallback lane's trigger is pinned by
      // TripletSamplerSpec on a disjoint-vocabulary corpus.
      // anchors = 1-in-5 batch subset (the reference emits batches, not
      // the full corpus); candidate pools and tf/df stats stay full
      (s, dir) => Triplets.tripletRowsBm25(
        Tables.load(s, dir, "documents"), cfg, "bm25_wrong_article",
        org.apache.spark.sql.functions.expr("doc_id % 5 = 0")),
      Some(Triplets.duckBm25Sql(cfg, "TRUE", "bm25_wrong_article",
        anchorWhere = "doc_id % 5 = 0"))),

    QueryDef("q86_triplet_date_preference",
      // WrongArticle date-preference staging: a thinned corpus (1 in 5)
      // with 2 synthetic publication dates makes all three lanes non-empty
      // — same-source+same-date pools of >=2 (lane 1), source pools whose
      // date groups are singletons (lane 2), and singleton source pools
      // that cross sources (lane 3)
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.core.Determinism
        Triplets.tripletRowsDatePreferred(
          Tables.load(s, dir, "documents").filter(expr("doc_id % 5 = 0")), cfg,
          concat(lit("2025-02-0"),
            (pmod(Determinism.seeded("day2", col("doc_id")), lit(2)) + 1).cast("string")))
      },
      Some(Triplets.duckDatePreferredSql(cfg, "doc_id % 5 = 0",
        s"'2025-02-0' || CAST(${graft.core.Determinism.duckSeeded("day2", "doc_id")} % 2 + 1 AS VARCHAR)"))),

    QueryDef("q92_weighted_triplet_batch",
      // next_triplet_batch_with_weights: 120 slots allocated across
      // sources by exact largest remainder (hash-derived weights 1..4),
      // each source contributing its first alloc anchors in seeded rank
      // order, then the WrongArticle pipeline on exactly that anchor set
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.core.Determinism
        val docs = Tables.load(s, dir, "documents")
        val weights = docs.select(col("source")).distinct()
          .select(col("source").as("group"),
            (pmod(Determinism.seeded("mixw", col("source")), lit(4)) + 1)
              .cast("long").as("w"))
        Triplets.tripletRowsWeighted(docs, cfg, weights, batch = 120L,
          split = "train", recipeName = "weighted_wrong_article")
      },
      Some(Triplets.duckWeightedSql(cfg,
        s"${graft.core.Determinism.duckSeeded("mixw", "source")} % 4 + 1",
        batch = 120L, split = "train", recipeName = "weighted_wrong_article"))),

    QueryDef("q91_triplet_negative_anchor",
      // negativeSelector = RoleAnchor — the 0.25-weight lane in every
      // source's default recipe set: the negative is the wrong record's
      // ANCHOR section (single chunk, window weight structurally 1.0)
      (s, dir) => Triplets.tripletRowsNegAnchor(
        Tables.load(s, dir, "documents"), cfg, "anchor_anchor_wrong_article"),
      Some(Triplets.duckNegAnchorSql(cfg, "anchor_anchor_wrong_article"))),

    QueryDef("q90_triplet_decorated",
      // the decorate-in-build flow: every chunk of the triplet passes
      // through the KVP prefix sampler (per-slot roll streams), the 50%
      // swap picks between DECORATED anchor/positive, and identical-text
      // rejection re-runs on decorated texts — the lifecycle order of
      // reference src/sampler/mod.rs:1264-1300, 1347-1395
      (s, dir) => Triplets.tripletRowsDecorated(
        Tables.load(s, dir, "documents"), cfg, decSampler, "decorated_wrong_article"),
      Some(Triplets.duckDecoratedTripletSql(cfg, decSampler, "decorated_wrong_article"))),

    QueryDef("q88_qa_mismatch_pairs",
      // QuestionAnswerMismatch (reference: src/sampler/mod.rs:1109-1151):
      // the anchor is the question span, the negative the answer span of a
      // DIFFERENT same-source same-split record, pairs labeled
      // wrong_qa_pairing. A longer anchor (12 tokens — questions, not
      // titles) gives the lane its own chunk layout and picks.
      (s, dir) => Triplets.pairRows(Tables.load(s, dir, "documents"),
        qaCfg, reason = "wrong_qa_pairing"),
      Some(Triplets.duckPairSql(qaCfg, reason = "wrong_qa_pairing")))
  )
}
