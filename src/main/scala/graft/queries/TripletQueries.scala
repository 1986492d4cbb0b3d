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
  private val TextDraws = 4

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q80_triplet_batch",
      (s, dir) => Triplets.tripletRows(Tables.load(s, dir, "documents"), cfg),
      Some(Triplets.duckTripletSql(cfg))),

    QueryDef("q81_pair_batch",
      (s, dir) => Triplets.pairRows(Tables.load(s, dir, "documents"), cfg),
      Some(Triplets.duckPairSql(cfg))),

    QueryDef("q82_text_batch",
      (s, dir) => Triplets.textRows(Tables.load(s, dir, "documents"), cfg, TextDraws),
      Some(Triplets.duckTextSql(cfg, TextDraws)))
  )
}
