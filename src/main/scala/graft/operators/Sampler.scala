package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One composed sampler batch: `core` is the per-draw stream BEFORE the
  * batch-local stages (rejection/dedup/pad) — keyed by the global draw
  * counter, it is invariant to how draws are grouped into batches; `rows`
  * is the delivered batch (exactly `batch` rows, slot column `i`); `state`
  * resumes the sequence. */
case class SamplerBatch(core: DataFrame, rows: DataFrame, state: SamplerState)

/** The composed batch driver — the reference's `next_triplet_batch` loop
  * (reference: src/sampler/mod.rs:868-948 cursor/epoch advance,
  * 2761-2801 ticket scheduling, 3091-3100 pad_with_reuse) re-expressed as
  * stateless draw arithmetic over [[SamplerState]] counters:
  *
  *   source defaults → ticket order → epoch-interleaved record pick →
  *   selector chunk picks → per-recipe negative-strategy dispatch
  *   (WrongArticle / WrongPublicationDate / QuestionAnswerMismatch) →
  *   identical-text rejection → seen-set dedup → pad_with_reuse →
  *   state advance.
  *
  * Every per-draw choice is a pure function of `(seed, epoch, draw)`, so
  * the global sample sequence is reproducible from the persisted counters
  * alone (resume = reload + continue) and invariant to batch size and
  * partitioning — the properties the reference pins with golden FNV
  * sequence hashes (src/sampler/tests.rs:17-50, tests/invariants.rs).
  *
  * The epoch advances MID-BATCH when the interleaved cycle completes
  * (reference advance_source_epoch): remaining slots draw from the next
  * epoch's reshuffled interleave AND reshuffled ticket plan. Records never
  * repeat within an epoch cycle (cycle-before-repeat) by construction —
  * positions are served in order off a per-epoch permutation.
  *
  * Scale shape: the only corpus-sized work per batch is the dense epoch
  * order ([[Mixing.epochOrder]] — per-source windows over (id, source)
  * pairs plus a broadcast source-stats join, no global window) and the
  * rank-pick joins over the narrow pool. The chunk restriction is an
  * `isin` PREDICATE over the batch's id list (≤ 2×batch longs), which
  * pushes below the chunk table's window/explode derivation to the record
  * scan — chunking cost per batch is ∝ batch size, not corpus size (a
  * broadcast join could not push through the Generate). Everything
  * downstream — selector windows, negative rank-pick, dedup, pad — runs
  * on batch-bounded frames. No collect of record data; the driver holds
  * only counters and the slot schedule.
  */
object Sampler {

  /** Selector → (mode, arg) for the broadcast draws frame of
    * [[Recipes.selectChunksBatch]]. TemporalOffset is CHUNK-level a
    * context-role pick — the reference selects the as-of neighbor record
    * and then its context chunk (src/sampler/mod.rs:1701-1704); the
    * record-level swap is [[temporalDays]] + [[temporalNeighbors]] inside
    * [[nextBatch]]. */
  def selectorDesc(s: Selector): (String, String) = s match {
    case Selector.RoleAnchor => ("role", "anchor")
    case Selector.RoleContext => ("role", "context")
    case Selector.Paragraph(i) => ("para", i.toString)
    case Selector.Random => ("random", "")
    case Selector.TemporalOffset(_) => ("role", "context")
  }

  /** Day offset of a temporal selector; None for chunk-level selectors. */
  def temporalDays(s: Selector): Option[Int] = s match {
    case Selector.TemporalOffset(d) => Some(d)
    case _ => None
  }

  /** The as-of neighbor pick of `Selector::TemporalOffset` (reference
    * select_temporal_neighbor, src/sampler/mod.rs:950-976): for each record
    * in `forIds`, the pool candidate minimizing |sec − (record.sec +
    * days·86400)| among same-`source` candidates — or same leading-taxonomy
    * when the pool carries a `tax` column (the reference's source-or-key
    * disjunction) — with the q61/q64 deterministic tiebreak
    * (|Δsec|·1e7 + id) replacing the reference's map-order tie. Split
    * isolation is structural: the composed driver's pool is per-split, so
    * a neighbor can never cross splits (the contract src/config.rs:131-137
    * re-checks inside the engine; here the pool IS the split).
    *
    * Scale shape: the left side is semi-joined down to the batch's records
    * (broadcast of a batch-bounded id frame), so per-batch cost is
    * batch-rows × the record's source/taxonomy group — the bounded-group
    * pairwise form (q61); unbounded-cardinality callers use the q60
    * union+window as-of instead. The OR-disjunction is a UNION of two
    * equi-joins (never a theta join). */
  def temporalNeighbors(pool: DataFrame, days: Int, forIds: DataFrame): DataFrame = {
    require(pool.columns.contains("sec"),
      "TemporalOffset recipes need a `sec` (epoch seconds) column in the pool")
    val hasTax = pool.columns.contains("tax")
    def side(idAs: String, pre: String) = {
      val cs = Seq(col("id").as(idAs), col("source").as(pre + "source"),
        col("sec").as(pre + "sec")) ++
        (if (hasTax) Seq(col("tax").as(pre + "tax")) else Nil)
      pool.select(cs: _*)
    }
    val left = side("record_id", "a_")
      .join(broadcast(forIds.select(col("record_id")).distinct()), Seq("record_id"))
    val cand = side("nbid", "n_")
    val pairCols = Seq("record_id", "nbid", "a_sec", "n_sec").map(col)
    val bySrc = left.join(cand,
      col("a_source") === col("n_source") && col("record_id") =!= col("nbid"))
      .select(pairCols: _*)
    val pairs =
      if (!hasTax) bySrc
      else bySrc.unionByName(left.join(cand,
          col("a_tax") === col("n_tax") && col("record_id") =!= col("nbid"))
        .select(pairCols: _*)).dropDuplicates("record_id", "nbid")
    pairs
      .withColumn("selkey",
        abs(col("n_sec") - (col("a_sec") + lit(days * 86400L))) * lit(10000000L) + col("nbid"))
      .groupBy(col("record_id"))
      .agg(min_by(col("nbid"), col("selkey")).as("nbid"))
  }

  /** Produce the next batch of `batch` triplets.
    *
    * Each slot's negative RECORD is picked by its recipe's declared
    * [[NegativeStrategy]] — the reference's per-slot strategy dispatch
    * (reference: src/sampler/mod.rs:1329-1405 dispatch, strategy pools
    * 994-1151):
    *   - `WrongArticle`: same-source skip-the-anchor rank pick
    *     (hash stream `neg:`);
    *   - `QuestionAnswerMismatch`: the same pool shape but its own hash
    *     stream (`negq:`) — a different record whose answer/context gets
    *     paired against this anchor's question;
    *   - `WrongPublicationDate`: two-level pick — a date group of the same
    *     source OTHER than the anchor's (`negd:`), then a record inside it
    *     (`negr:`). Requires a `date` column in `pool`; slots whose source
    *     has a single date group drop (pad_with_reuse fills the batch).
    * Every delivered row carries the strategy's `reason` tag.
    *
    * @param chunks chunk table (columns of [[graft.core.RecordChunk]]):
    *               record_id, section_idx, role, view_kind, window_index,
    *               overlap, wtext
    * @param pool   record pool: `id`, `source` (one row per record), plus
    *               an optional `date` column (string) when any recipe
    *               declares `WrongPublicationDate`
    * @param recipes resolved recipe set (configured or source defaults —
    *               apply [[Recipes.resolve]]/[[Recipes.withAutoInjected]]
    *               upstream)
    * @param st     counters: `draw` (global, never resets — drives recipe
    *               rotation and every hash pick), `cursor` (position in the
    *               epoch's interleave, resets on epoch advance),
    *               `pool_size` (epoch-stable pool count, computed once and
    *               persisted — drop it via [[SamplerState]] on source
    *               refresh so the next batch re-counts)
    * @param decoration optional `(sampler, maxWindowTokens)`: decorate every
    *               picked chunk with a KVP metadata prefix under the token
    *               budget ([[Decoration.decorateColumn]]) before hashing —
    *               the reference decorates inside the batch loop with a
    *               per-(record, draw) key (src/sampler/mod.rs:1470-1508);
    *               here the key is `dec:<slot>:<record_id>:<draw>` so the
    *               three slots roll independent prefixes, exactly like the
    *               decorated lane ([[Triplets.tripletRowsDecorated]])
    */
  def nextBatch(spark: SparkSession, chunks: DataFrame, pool: DataFrame,
      recipes: Seq[TripletRecipe], st: SamplerState, batch: Int,
      decoration: Option[(graft.functions.KvpPrefixSampler, Int)] = None): SamplerBatch = {
    import spark.implicits._
    require(batch > 0, "batch must be > 0")
    val byName = recipes.map(r => r.name -> r).toMap
    // the pool size is epoch-stable: count once, then serve every later
    // batch from the persisted counter (a per-batch count() is corpus-scan
    // work at 100 TB). Callers invalidate with `counters - "pool_size"`
    // when the pool population changes (source refresh).
    val poolSize = {
      val cached = st.counter("pool_size")
      if (cached > 0L) cached else pool.count()
    }
    require(poolSize > 0, "empty record pool")
    val drawBase = st.counter("draw")

    // ---- slot schedule: driver-side counter arithmetic only ----
    var e = st.epoch
    var cur = st.counter("cursor")
    var plan = Recipes.ticketOrder(recipes, st.seed, e)
    val slotsB = Seq.newBuilder[(Long, Long, Long, String)] // (draw, epoch, pos, recipe)
    var i = 0
    while (i < batch) {
      val draw = drawBase + i
      slotsB += ((draw, e, cur, Recipes.pick(plan, 0L, draw)))
      cur += 1
      if (cur == poolSize) { // cycle complete: mid-batch epoch advance
        cur = 0L; e += 1
        plan = Recipes.ticketOrder(recipes, st.seed, e)
      }
      i += 1
    }
    val slots = slotsB.result()

    // ---- record pick: per-epoch interleave joined on position ----
    // Each composed frame from here on is BATCH-sized and feeds several
    // downstream consumers; localCheckpoint() materializes it eagerly so
    // every subsequent job plans over a tiny leaf instead of replaying
    // (and re-optimizing, and re-describing to the SQL listener) the whole
    // upstream tree. Without the cuts the final plan duplicates the pick
    // subtree ~6x and a 6-batch golden run spends ~100 s/batch just
    // BUILDING plan strings (ExplainUtils on every AQE stage update).
    // Values are unaffected — every column is a pure (seed, epoch, draw)
    // function; only lineage is cut.
    val slotRec = slots.groupBy(_._2).toSeq.sortBy(_._1).map { case (ep, ss) =>
      val sdf = ss.map(s => (s._1, s._3, s._4, byName(s._4).negative.reason))
        .toDF("draw", "pos", "recipe", "reason")
      Mixing.epochOrder(pool, ep).join(broadcast(sdf), "pos")
        .select(col("draw"), lit(ep).as("epoch"), col("recipe"), col("reason"),
          col("id").as("record_id"), col("source"))
    }.reduce(_ unionByName _).localCheckpoint()

    // ---- chunk-pick metadata (driver-side; used by both the negative
    // backends below and the selector picks) ----
    val slotMeta = slots.map { case (draw, _, _, name) =>
      val r = byName(name)
      val (am, aa) = selectorDesc(r.anchor)
      val (pm, pa) = selectorDesc(r.positive)
      val (nm, na) = selectorDesc(r.negativeSelector)
      (draw, am, aa, pm, pa, nm, na, r.allowSameAnchorPositive)
    }.toDF("draw", "a_mode", "a_arg", "p_mode", "p_arg", "n_mode", "n_arg", "allow_same")
    // ---- chunk-source records per slot: temporal selectors swap in the
    // as-of neighbor (reference select_chunk, src/sampler/mod.rs:1701-1704:
    // TemporalOffset resolves the neighbor record, then picks its CONTEXT
    // chunk; no same-pool neighbor → the slot drops and pad_with_reuse
    // fills the batch — the contract's "skip rather than contaminate",
    // src/config.rs:131-137). Non-temporal slot sets return the base frame
    // untouched, so recipe sets without temporal selectors plan exactly as
    // before. Temporal lanes are checkpointed: their upstream is a
    // pool-scale neighbor join that several consumers replay otherwise.
    def chunkRecords(sel: TripletRecipe => Selector, base: DataFrame): DataFrame = {
      val dayOf = recipes.map(r => r.name -> temporalDays(sel(r)))
      val temporal = dayOf.collect { case (n, Some(d)) => (n, d) }
      if (temporal.isEmpty) base.select(col("draw"), col("record_id"))
      else {
        val plainNames = dayOf.collect { case (n, None) => n }
        val lanes = temporal.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, rs) =>
          val forIds = base.filter(col("recipe").isin(rs.map(_._1): _*))
            .select(col("draw"), col("record_id"))
          forIds.join(temporalNeighbors(pool, d, forIds), Seq("record_id"))
            .select(col("draw"), col("nbid").as("record_id"))
        }
        val plain =
          if (plainNames.isEmpty) Nil
          else Seq(base.filter(col("recipe").isin(plainNames: _*))
            .select(col("draw"), col("record_id")))
        (plain ++ lanes).reduce(_ unionByName _).localCheckpoint()
      }
    }

    // ---- negative record: per-recipe strategy × backend dispatch ----
    val srcRank = pool
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("id"))).cast("long") - 1)
      .withColumn("nsrc", count(lit(1)).over(
        Window.partitionBy(col("source"))).cast("long"))
    def drawKey(prefix: String) = Determinism.portableHash(
      concat(lit(s"$prefix:${st.seed}:"), col("draw").cast("string"), lit(":"),
        col("record_id").cast("string")))
    val negOut = Seq("draw", "epoch", "recipe", "reason", "record_id", "nid").map(col)
    // same source, skip-the-anchor rank pick (WrongArticle / QA-mismatch;
    // the strategies differ by hash stream and downstream reason tag)
    def skipPick(anchors: DataFrame, prefix: String): DataFrame = anchors
      .join(srcRank.select(col("id").as("record_id"), col("rn").as("a_rn"), col("nsrc")),
        Seq("record_id"))
      .withColumn("p0", pmod(drawKey(prefix), greatest(col("nsrc") - 1, lit(1L))))
      // a source with a single record yields rank 1 → no match → slot drops
      .withColumn("n_rn", when(col("p0") >= col("a_rn"), col("p0") + 1).otherwise(col("p0")))
      .join(srcRank.select(col("source"), col("rn").as("n_rn"), col("id").as("nid")),
        Seq("source", "n_rn"))
      .select(negOut: _*)
    // same source, DIFFERENT date group: hash-pick a date rank skipping the
    // anchor's, then a record rank inside the target group — three
    // equi-joins, date/source isolation structural (the q84 lane's shape,
    // keyed by the composed driver's (seed, draw, record) stream)
    def wrongDatePick(anchors: DataFrame): DataFrame = {
      require(pool.columns.contains("date"),
        "WrongPublicationDate recipes need a `date` column in the pool")
      val wSrc = Window.partitionBy(col("source"))
      val dG = pool.groupBy(col("source"), col("date")).agg(count(lit(1)).cast("long").as("dct"))
        .withColumn("drnk", row_number().over(wSrc.orderBy(col("date"))).cast("long") - 1)
        .withColumn("dcnt", count(lit(1)).over(wSrc).cast("long"))
      val dRank = pool.withColumn("rn2", row_number().over(
        Window.partitionBy(col("source"), col("date")).orderBy(col("id"))).cast("long") - 1)
      anchors
        .join(pool.select(col("id").as("record_id"), col("date").as("a_date")), Seq("record_id"))
        .join(dG.select(col("source"), col("date").as("a_date"),
          col("drnk").as("a_drnk"), col("dcnt")), Seq("source", "a_date"))
        .filter(col("dcnt") >= 2)
        .withColumn("d0", pmod(drawKey("negd"), greatest(col("dcnt") - 1, lit(1L))))
        .withColumn("t_drnk", when(col("d0") >= col("a_drnk"), col("d0") + 1).otherwise(col("d0")))
        .join(dG.select(col("source"), col("date").as("t_date"),
          col("drnk").as("t_drnk"), col("dct").as("t_dct")), Seq("source", "t_drnk"))
        .withColumn("rpick", pmod(drawKey("negr"), col("t_dct")))
        .join(dRank.select(col("source"), col("date").as("t_date"),
          col("rn2").as("rpick"), col("id").as("nid")), Seq("source", "t_date", "rpick"))
        .select(negOut: _*)
    }
    /** DefaultBackend lanes: the seeded rank pick per strategy present. */
    def strategyPick(anchors: DataFrame, strategies: Seq[NegativeStrategy]): Seq[DataFrame] =
      strategies.map {
        case NegativeStrategy.WrongArticle =>
          skipPick(anchors.filter(col("reason") === NegativeStrategy.WrongArticle.reason), "neg")
        case NegativeStrategy.QuestionAnswerMismatch =>
          skipPick(anchors.filter(
            col("reason") === NegativeStrategy.QuestionAnswerMismatch.reason), "negq")
        case NegativeStrategy.WrongPublicationDate =>
          wrongDatePick(anchors.filter(
            col("reason") === NegativeStrategy.WrongPublicationDate.reason))
      }
    def strategiesOf(backend: NegativeBackend): Seq[NegativeStrategy] =
      slots.map(s => byName(s._4)).filter(_.negativeBackend == backend)
        .map(_.negative).distinct
    val bmNames = recipes.filter(_.negativeBackend == NegativeBackend.Bm25).map(_.name)

    /** Bm25Backend lanes (reference: bm25_backend.rs:120-174): re-rank the
      * strategy pool by the BM25 score of the anchor's SELECTED chunk text
      * against each candidate's `btoks`, rotate through the top-3 by the
      * (seed, draw, anchor) hash stream — the stateless twin of the
      * reference's per-(anchor, split) cursor — and fall back to the
      * DefaultBackend pick for slots whose scored intersection is empty.
      *
      * Scale shape: candidates/tf/stats are semi-joined to the BATCH's
      * anchor sources (broadcast of a batch-bounded source list), so
      * per-batch scoring cost is ∝ the involved source groups — the same
      * pool the reference scores per anchor. The anchor⋈candidate product
      * passes through ONE (source, term) join after df/dl/avgdl fold into
      * the tf table (the q85 lane's shape). A long-lived deployment would
      * cache the per-source tf table across batches; per-batch derivation
      * keeps this function pure. The anchor-text pick re-evaluates the
      * same pure chunk-pick the final a-slot evaluates, over a chunk scan
      * restricted to the bm25 anchors' records. */
    def bm25Lanes(): Seq[DataFrame] = {
      require(pool.columns.contains("btoks"),
        "BM25-backend recipes need a `btoks` token-array column in the pool")
      val bmSlots = slotRec.filter(col("recipe").isin(bmNames: _*))
      val bmARecs = chunkRecords(_.anchor, bmSlots)
      val bmAIds = bmARecs.select(col("record_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val bmChunks = chunks.filter(col("record_id").isin(bmAIds: _*)).localCheckpoint()
      val bmDraws = slotMeta
        .join(broadcast(bmSlots.select(col("draw"))), "draw")
        .select(col("draw"), col("a_mode").as("mode"), col("a_arg").as("arg"))
      val qterms = Recipes.selectChunksBatch(bmChunks, bmDraws, "a")
        .join(bmARecs, Seq("draw", "record_id"))
        .select(col("draw"), explode(array_distinct(
          graft.functions.TextFunctions.tokens(col("wtext")))).as("term"))
      val srcs = bmSlots.select(col("source")).distinct()
      val cand = pool.join(broadcast(srcs), "source")
      val tf = cand.select(col("source"), col("id").as("cand"),
          size(col("btoks")).cast("long").as("dl"), explode(col("btoks")).as("term"))
        .groupBy(col("source"), col("cand"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val stats = cand.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(size(col("btoks"))).as("sum_dl"))
      // df is a keyed window over tf (one row per (cand, term) ⇒ the
      // per-term count IS the document frequency); exact-integer e6 floor
      // per term, as everywhere (graft.operators.Bm25 scaladoc)
      val wterm = tf
        .withColumn("df", count(lit(1)).over(
          Window.partitionBy(col("source"), col("term"))).cast("long"))
        .join(broadcast(stats), "source")
        .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
        .withColumn("idf",
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        .withColumn("tfpart",
          (col("tf") * lit(Bm25.K1 + 1)) /
            (col("tf") + lit(Bm25.K1) * (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl"))))
        .select(col("source"), col("term"), col("cand"),
          floor(lit(1000000.0) * col("idf") * col("tfpart")).cast("long").as("term_e6"))
      val scoredAll = bmSlots.select(col("draw"), col("record_id"), col("source"), col("reason"))
        .join(qterms, "draw")
        .join(wterm, Seq("source", "term"))
        .filter(col("cand") =!= col("record_id"))
      // wrong-date slots additionally require a different date group —
      // the strategy pool predicate applies BEFORE the re-rank
      val wdReason = NegativeStrategy.WrongPublicationDate.reason
      val scoredF =
        if (!strategiesOf(NegativeBackend.Bm25).contains(NegativeStrategy.WrongPublicationDate))
          scoredAll
        else scoredAll
          .join(pool.select(col("id").as("record_id"), col("date").as("a_date")), "record_id")
          .join(pool.select(col("id").as("cand"), col("date").as("c_date")), "cand")
          .filter(col("reason") =!= wdReason || col("a_date") =!= col("c_date"))
      val scored = scoredF.groupBy(col("draw"), col("record_id"), col("cand"))
        .agg(sum(col("term_e6")).as("score_e6"))
      val top3 = scored
        .withColumn("brnk", row_number().over(Window.partitionBy(col("draw"))
          .orderBy(col("score_e6").desc, col("cand"))).cast("long"))
        .filter(col("brnk") <= 3)
        .withColumn("c3", count(lit(1)).over(Window.partitionBy(col("draw"))).cast("long"))
      // one scoring subtree for the whole batch: `picked` feeds the hit
      // lane's join AND the fallback lane's anti-join (no cross-branch CSE)
      val picked = top3
        .filter(col("brnk") - 1 === pmod(drawKey("negb"), col("c3")))
        .select(col("draw"), col("cand").as("nid"))
        .localCheckpoint()
      val hit = bmSlots.join(picked, "draw").select(negOut: _*)
      val rest = bmSlots.join(picked.select(col("draw")), Seq("draw"), "left_anti")
      Seq(hit) ++ strategyPick(rest, strategiesOf(NegativeBackend.Bm25))
    }

    val negRec =
      (strategyPick(
          if (bmNames.isEmpty) slotRec else slotRec.filter(!col("recipe").isin(bmNames: _*)),
          strategiesOf(NegativeBackend.Default)) ++
        (if (bmNames.isEmpty) Nil else bm25Lanes()))
      .reduce(_ unionByName _).localCheckpoint()

    // ---- chunk picks: selector windows on the batch-restricted table ----
    // batch id restriction as an isin PREDICATE, not a join: a broadcast
    // join sits above the chunk table's window/explode derivation and
    // cannot push through the Generate, so every batch would re-chunk the
    // whole corpus. The id list is batch-bounded (≤ 3×batch longs — slot
    // schedule scale, which the driver already holds), and as a filter it
    // pushes below the derivation to the record scan: per-batch chunking
    // cost is ∝ batch size, not corpus size.
    val aRecs = chunkRecords(_.anchor, slotRec)
    val pRecs = chunkRecords(_.positive, slotRec)
    val nRecs = chunkRecords(_.negativeSelector,
      negRec.select(col("draw"), col("recipe"), col("nid").as("record_id")))
    val ids = aRecs.select(col("record_id"))
      .union(pRecs.select(col("record_id")))
      .union(nRecs.select(col("record_id")))
      .distinct().collect().map(_.getLong(0)).toSeq
    val chunksR = chunks.filter(col("record_id").isin(ids: _*)).localCheckpoint()
    // the delivered text hash: raw chunk text, or the decorated text when a
    // KVP sampler is configured (decoration is a pure (record, draw)
    // function, so the composed stream stays batch/partition invariant)
    def slotText(slot: String): Column = decoration match {
      case None => col("wtext")
      case Some((smp, maxTok)) =>
        Decoration.decorateColumn(smp,
          concat(lit(s"dec:$slot:"), col("record_id").cast("string"),
            lit(":"), col("draw").cast("string")),
          split(col("wtext"), " "), maxTok).getField("text")
    }
    def pickFor(slot: String, modeCol: String, argCol: String, recs: DataFrame) =
      Recipes.selectChunksBatch(chunksR,
          slotMeta.select(col("draw"), col(modeCol).as("mode"), col(argCol).as("arg")), slot)
        .join(recs, Seq("draw", "record_id"))
        // `draw` is unique per slot, so after the restrict join it alone
        // keys the pick — and for temporal slots the chunk-source record
        // (the neighbor) is NOT the slot's scheduled record, so the core
        // join below is on draw, never on record_id
        .select(col("draw"),
          col("window_index").cast("long").as(s"${slot}_widx"),
          Determinism.portableHash(slotText(slot)).as(s"${slot}_hash"))
    val aPick = pickFor("a", "a_mode", "a_arg", aRecs)
    val pPick = pickFor("p", "p_mode", "p_arg", pRecs)
    val nPick = pickFor("n", "n_mode", "n_arg", nRecs)

    val core = negRec
      .join(aPick, Seq("draw"))
      .join(pPick, Seq("draw"))
      .join(nPick, Seq("draw"))
      .join(broadcast(slotMeta.select(col("draw"), col("allow_same"))), Seq("draw"))
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"),
        col("a_widx"), col("a_hash"), col("p_widx"), col("p_hash"),
        col("nid"), col("n_hash"), col("reason"), col("allow_same"))
      .localCheckpoint()

    // ---- batch-local stages: rejection → seen-set dedup → pad ----
    val rejected = core.filter(col("allow_same") || col("a_hash") =!= col("p_hash"))
    val seenW = Window.partitionBy(col("record_id"), col("a_widx"), col("p_widx"), col("nid"))
      .orderBy(col("draw"))
    val deduped = rejected
      .withColumn("rk", row_number().over(seenW)).filter(col("rk") === 1)
      .drop("rk", "allow_same")
    val rows = Mixing.padToBatch(spark,
        deduped.select(col("draw").as("id")), batch, s"pad:${st.seed}:$drawBase")
      .join(deduped.withColumnRenamed("draw", "id"), Seq("id"))
      .withColumnRenamed("id", "draw").withColumnRenamed("i", "slot")

    val st2 = st.copy(epoch = e, counters = st.counters
      .updated("draw", drawBase + batch).updated("cursor", cur)
      .updated("pool_size", poolSize))
    SamplerBatch(core.drop("allow_same"), rows, st2)
  }
}
