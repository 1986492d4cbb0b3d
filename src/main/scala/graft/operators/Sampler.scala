package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One composed sampler batch: `core` is the per-draw stream BEFORE the
  * batch-local stages (rejection/dedup/pad) — keyed by the global draw
  * counter, it is invariant to how draws are grouped into batches; `rows`
  * is the delivered batch (exactly `batch` rows, slot column `i`); `state`
  * resumes the sequence.
  *
  * `rows` is LAZY: the pad-to-batch stage schedules its own count action,
  * so consumers of the core stream alone (analytics over the pre-pad
  * draws — every composed oracle query) never pay the padding jobs. First
  * access builds the plan once; values are identical to the former eager
  * field (the pad is a pure function of the deduped stream + counters). */
final class SamplerBatch(val core: DataFrame, mkRows: () => DataFrame,
    val state: SamplerState, statsCore: Option[DataFrame] = None) {
  lazy val rows: DataFrame = mkRows()

  /** The reference's `extended-metrics` per-batch counter report
    * (bm25_backend.rs:156-172: bm25-selected vs rank-fallback draws,
    * cross-split fallback counts) over THIS batch's already-drawn core
    * rows: one (recipe, reason, lane) aggregation — `lane` is the
    * resolved negative tier (src/sd/wd/fb or bm25), cross-split
    * fallbacks carry the `_fallback_same_split` recipe suffix. Lazy and
    * optional, exactly like the reference's feature gate: a trainer that
    * never asks pays nothing. The PAIR lane reports through its triplet
    * core (`statsCore` — each pair draw derives from exactly one triplet
    * draw, so the negative-tier counters are the triplet core's); text
    * cores carry no negative lane. Semantics oracle-pinned by q142. */
  lazy val laneStats: DataFrame = {
    val src = statsCore.getOrElse(core)
    require(src.columns.contains("lane"),
      "laneStats is the triplet driver's report (text cores carry no negative lane)")
    import org.apache.spark.sql.functions.{col, count, lit}
    src.groupBy(col("recipe"), col("reason"), col("lane"))
      .agg(count(lit(1)).cast("long").as("n"))
  }
}
object SamplerBatch {
  def apply(core: DataFrame, mkRows: () => DataFrame, state: SamplerState): SamplerBatch =
    new SamplerBatch(core, mkRows, state)
  def apply(core: DataFrame, mkRows: () => DataFrame, state: SamplerState,
      statsCore: Option[DataFrame]): SamplerBatch =
    new SamplerBatch(core, mkRows, state, statsCore)
}

/** Running extended-metrics totals across a sampler session — the
  * reference's counters are LIFETIME sums, not per-batch snapshots
  * (bm25_backend.rs:156-172 increments running totals as batches are
  * drawn). A trainer `add`s each [[SamplerBatch]] it consumed and reads
  * `totals` at any point; per-batch reports are (recipe, reason, lane)-
  * bounded handfuls of rows, so accumulation is a driver-side fold over
  * already-drawn data — no corpus work, no re-draw. Additivity (two
  * resumed half-batches sum to the one-shot batch's report) follows from
  * the stateless-draw law q143 pins; MetricsSpec asserts it directly. */
final class ExtendedMetrics {
  private val acc =
    scala.collection.mutable.Map.empty[(String, String, String), Long]
  /** Fold one drawn batch's lane report into the running totals. The
    * lane-report collect is a full Spark job, so it runs OUTSIDE the
    * monitor — a concurrent `totals` reader (or another `add`) must not
    * block for the duration of a job; only the driver-side fold of the
    * already-collected handful of rows is serialized. */
  def add(b: SamplerBatch): this.type = {
    val rows = b.laneStats.collect()
    synchronized {
      rows.foreach { r =>
        val k = (r.getString(0), r.getString(1), r.getString(2))
        acc(k) = acc.getOrElse(k, 0L) + r.getLong(3)
      }
    }
    this
  }
  /** Lifetime totals keyed by (recipe, reason, lane). */
  def totals: Map[(String, String, String), Long] = synchronized(acc.toMap)
}

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

  /** Materialize a BATCH-BOUNDED frame as a driver-local relation: the
    * values come from the same Spark plan (one collect — the same job an
    * eager localCheckpoint would run), but downstream consumers see a
    * LocalRelation, so broadcasting it costs no job, local projections of
    * it collect without scheduling one, and joins plan against exact
    * sizes. Lineage is cut exactly like localCheckpoint. Applied ONLY to
    * ≤ few×batch-row frames (the slot-schedule scale the driver already
    * holds — the counters-and-schedule contract); corpus-scale frames
    * (pool, rank sidecar, chunk tables) stay executor-side checkpoints. */
  private def localRelation(spark: SparkSession, df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** The as-of neighbor pick of `Selector::TemporalOffset` (reference
    * select_temporal_neighbor, src/sampler/mod.rs:950-976): for each record
    * in `forIds`, the pool candidate minimizing |sec − (record.sec +
    * days·86400)| among same-`source` candidates — or same leading-taxonomy
    * when the pool carries a `tax` column (the reference's source-or-key
    * disjunction) — with the q61/q64 deterministic tiebreak (smaller id
    * on equal |Δsec|) replacing the reference's map-order tie. Split
    * isolation is structural: the composed driver's pool is per-split, so
    * a neighbor can never cross splits (the contract src/config.rs:131-137
    * re-checks inside the engine; here the pool IS the split).
    *
    * Scale shape: the left side is semi-joined down to the batch's records
    * (broadcast of a batch-bounded id frame), so per-batch cost is
    * batch-rows × the record's source/taxonomy group — the bounded-group
    * pairwise form (q61); unbounded-cardinality callers use the q60
    * union+window as-of instead. The OR-disjunction is a UNION of two
    * DISJOINT equi-joins (never a theta join). Per batch this streams the
    * narrow (id, source, sec[, tax]) pool projection once as the
    * candidate side — already 40× the reference's serving shape, which
    * probes its whole in-memory pool PER DRAW (select_temporal_neighbor,
    * src/sampler/mod.rs:950-976) — and a refresh-staged
    * [[temporalNeighborsFull]] map (the chunk/rank-index treatment)
    * takes it to O(batch). The argmin key is the LEXICOGRAPHIC pair
    * (|Δsec|, id) — a struct ordering, not the former |Δsec|·1e7 + id
    * scalar, whose id term could outweigh a 1-second |Δ| gap once ids
    * pass 1e7 (a latent wrong-neighbor hazard at corpus scale, and the
    * obstacle to an O(n log n) staged build; the DuckDB twins replay the
    * same pair via list comparison). */
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
    // no distinct on the broadcast side: duplicate record_ids only
    // duplicate intermediate pairs, and the final min_by groupBy (and the
    // tax path's dropDuplicates) collapse them — values unchanged, and a
    // batch-local caller's broadcast stays a pure LocalRelation (no
    // aggregate job inside the broadcast subtree)
    val left = side("record_id", "a_")
      .join(broadcast(forIds.select(col("record_id"))), Seq("record_id"))
    val cand = side("nbid", "n_")
    val pairCols = Seq("record_id", "nbid", "a_sec", "n_sec").map(col)
    val bySrc = left.join(cand,
      col("a_source") === col("n_source") && col("record_id") =!= col("nbid"))
      .select(pairCols: _*)
    // the two arms are DISJOINT by construction — the tax arm keeps only
    // cross-source pairs (a same-source same-tax candidate already came
    // out of the source arm) — so the union IS the set union and the
    // former dropDuplicates exchange is deleted from the per-batch plan
    val pairs =
      if (!hasTax) bySrc
      else bySrc.unionByName(left.join(cand,
          col("a_tax") === col("n_tax") && col("a_source") =!= col("n_source") &&
            col("record_id") =!= col("nbid"))
        .select(pairCols: _*))
    pairs
      .withColumn("selkey", struct(
        abs(col("n_sec") - (col("a_sec") + lit(days * 86400L))).as("d"),
        col("nbid").as("i")))
      .groupBy(col("record_id"))
      .agg(min_by(col("nbid"), col("selkey")).as("nbid"))
  }

  /** [[temporalNeighbors]] for EVERY pool record — the refresh-time
    * staged form (the chunk/rank-index treatment applied to the as-of
    * neighbor map, persisted by
    * [[graft.queries.ComposedIndexQueries.neighborIndex]]). O(n log n)
    * per arm instead of the pairwise Σ|group|²: rank the DISTINCT
    * candidate seconds per group, find each target's last candidate-sec
    * at-or-below its target time with ONE ordered window over the
    * interleaved union (the q60 as-of idiom), then probe ranks
    * r−1 … r+2 carrying the two smallest ids per sec. That candidate
    * superset always contains the argmin: the lexicographic
    * (|Δsec|, id) key compares |Δsec| first, so a farther sec can never
    * beat a nearer one on the same side (this is exactly why the scalar
    * 1e7-key had to go), the nearest eligible sec per side is at rank
    * r / r+1 — or r−1 / r+2 when self-exclusion empties it, and
    * self-exclusion removes at most ONE id from at most ONE sec, so two
    * ids per sec suffice. Pinned equal to the pairwise form over
    * adversarial fixtures (ties, self-nearest, singleton groups,
    * negative offsets) by StateAndRecipesSpec. Returns (record_id,
    * nbid); records with no eligible neighbor are absent — the serving
    * join then drops their slots (skip-not-contaminate). */
  def temporalNeighborsFull(pool: DataFrame, days: Int): DataFrame = {
    require(pool.columns.contains("sec"),
      "TemporalOffset recipes need a `sec` (epoch seconds) column in the pool")
    val offset = days * 86400L
    def arm(key: String): DataFrame = {
      val cands = pool.select(col(key).as("k"), col("sec").as("csec"), col("id"))
      val first = cands.groupBy(col("k"), col("csec")).agg(min(col("id")).as("id1"))
      val second = cands.join(first, Seq("k", "csec"))
        .filter(col("id") =!= col("id1"))
        .groupBy(col("k"), col("csec")).agg(min(col("id")).as("id2"))
      val secTbl = first.join(second, Seq("k", "csec"), "left")
        .withColumn("prnk", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("csec"))))
      // rank lookup by interleaved union: candidate rows sort BEFORE
      // target rows at equal time (tag), so a candidate exactly AT the
      // target time lands on the ≤ side, matching abs() semantics
      val candSide = secTbl.select(col("k"), col("csec").as("t"), lit(0).as("tag"),
        col("prnk"), lit(null).cast("long").as("record_id"))
      val tgtSide = pool.select(col(key).as("k"), (col("sec") + lit(offset)).as("t"),
        lit(1).as("tag"), lit(null).cast("int").as("prnk"), col("id").as("record_id"))
      val runW = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = candSide.unionByName(tgtSide)
        .withColumn("r", last(col("prnk"), ignoreNulls = true).over(runW))
        .filter(col("tag") === 1)
        .select(col("k"), col("record_id"), col("t").as("tsec"),
          coalesce(col("r"), lit(0)).as("r"))
      ranked
        .withColumn("prnk", explode(expr("sequence(r - 1, r + 2)")))
        .join(secTbl, Seq("k", "prnk"))
        .select(col("record_id"), col("tsec"), col("csec"),
          explode(array(col("id1"), col("id2"))).as("nbid"))
        .filter(col("nbid").isNotNull && col("nbid") =!= col("record_id"))
        .select(col("record_id"), col("nbid"),
          struct(abs(col("csec") - col("tsec")).as("d"), col("nbid").as("i")).as("selkey"))
    }
    // arm overlap is harmless here (min of mins over subsets whose union
    // is the eligible set), so the tax arm keeps same-source candidates
    val arms = if (pool.columns.contains("tax")) Seq("source", "tax") else Seq("source")
    arms.map(arm).reduce(_ unionByName _)
      .groupBy(col("record_id"))
      .agg(min_by(col("nbid"), col("selkey")).as("nbid"))
  }

  /** Neighbor lookup for one temporal lane: the staged map when the
    * caller passed one for this offset (per-batch cost = an id-pruned
    * read of the record_id-sorted index — zero pool-scale work),
    * otherwise the in-plan batch join. `forIds` is a LocalRelation
    * projection, so the id collect schedules no job. */
  private def neighborsFor(pool: DataFrame, d: Int, forIds: DataFrame,
      neighborIndex: Map[Int, DataFrame]): DataFrame =
    neighborIndex.get(d) match {
      case Some(ix) =>
        val ids = forIds.select(col("record_id")).collect()
          .map(_.getLong(0)).distinct.toSeq
        ix.filter(col("record_id").isin(ids: _*))
      case None => temporalNeighbors(pool, d, forIds)
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
    *     (`negr:`). Requires a `date` column in `pool`.
    * When `pool` carries a `date` column, `WrongArticle` prefers
    * same-source same-DATE candidates (tier 1, stream `nega:`) before the
    * plain same-source pick — the reference's date preference
    * (src/sampler/mod.rs:996-1032). Every strategy whose primary pool is
    * empty (singleton source, or single date group for wrong-date) falls
    * back to the cross-source same-split two-level pick (`negs:`/`negc:`)
    * with the recipe name suffixed `_fallback_same_split`
    * (src/sampler/mod.rs:1097-1151, 1391-1395). Every delivered row
    * carries the strategy's `reason` tag.
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
  /** Epoch-stable pool size: count once, then serve every later batch
    * from the persisted counter (a per-batch count() is corpus-scan work
    * at 100 TB). Callers invalidate with `counters - "pool_size"` when
    * the pool population changes (source refresh). */
  private def poolSizeOf(pool: DataFrame, st: SamplerState): Long = {
    val cached = st.counter("pool_size")
    val n = if (cached > 0L) cached else pool.count()
    require(n > 0, "empty record pool")
    n
  }

  /** Slot schedule: driver-side counter arithmetic only — (draw, epoch,
    * pos, recipe) per slot, with the mid-batch epoch advance when the
    * interleave cycle completes. `planFor` yields the (re-shuffled) ticket
    * plan of an epoch. Returns (slots, endEpoch, endCursor). */
  /** The state a `batch`-draw [[nextBatch]] call will RETURN, computed
    * without running it: the cursor/epoch walk is pure counter
    * arithmetic over `poolSize` (the persisted per-source stats sum for
    * a staged pool — zero Spark jobs). This is what lets a serving loop
    * produce several batches CONCURRENTLY with in-order delivery
    * ([[BatchPrefetcher]] `parallelism`): batch i+1's state never waits
    * on batch i's jobs, only on this arithmetic. Pinned equal to the
    * chained `nextBatch(...).state` sequence by StateAndRecipesSpec. */
  def advanceState(st: SamplerState, batch: Int, poolSize: Long): SamplerState = {
    val (_, e, cur) = scheduleSlots(st, batch, poolSize, _ => Seq(""))
    st.copy(epoch = e, counters = st.counters
      .updated("draw", st.counter("draw") + batch).updated("cursor", cur)
      .updated("pool_size", poolSize))
  }

  private def scheduleSlots(st: SamplerState, batch: Int, poolSize: Long,
      planFor: Long => Seq[String]): (Seq[(Long, Long, Long, String)], Long, Long) = {
    val drawBase = st.counter("draw")
    var e = st.epoch
    var cur = st.counter("cursor")
    var plan = planFor(e)
    val slotsB = Seq.newBuilder[(Long, Long, Long, String)]
    var i = 0
    while (i < batch) {
      val draw = drawBase + i
      slotsB += ((draw, e, cur, Recipes.pick(plan, 0L, draw)))
      cur += 1
      if (cur == poolSize) { // cycle complete: mid-batch epoch advance
        cur = 0L; e += 1
        plan = planFor(e)
      }
      i += 1
    }
    (slotsB.result(), e, cur)
  }

  /** The pool-rank sidecar's derivation (the PLAN — callers checkpoint
    * or persist): per-source ranks (rn, nsrc), per-(source, date) ranks
    * and date-group attrs for dated pools (rn2/dgs/drnk/dcnt), and the
    * seeded fallback source order (srnk/scnt) folded in per row. ONE
    * corpus pass over narrow columns — no text. [[composed]] derives it
    * in-plan per batch (the pure-function default); a long-lived
    * deployment builds it once per pool REFRESH through
    * [[PoolRankIndex]] and passes the loaded table as `rankIndex`
    * (reference pool staging, src/sampler/mod.rs:994-1151 — staged per
    * refresh, not per batch). `srcCounts` is the caller's per-source
    * stats collect (the epochPick identity — jvmHash ≡ the seeded
    * column hash). */
  /** The seeded fallback source order as (source, srnk, nsrc) — the ONE
    * derivation both the sidecar build ([[rankSidecar]]'s srnk/scnt
    * columns, persisted at refresh) and the serving-time fallback
    * resolution (strategyPick's exact-key probe) must share: a staged
    * deployment resolves REFRESH-time srnk values through SERVING-time
    * order, so the two copies drifting apart would silently retarget
    * every fallback draw. */
  private[operators] def fallbackOrder(srcCounts: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    val cnt = srcCounts.toMap
    srcCounts.map(_._1)
      .sortBy(src => (Determinism.jvmHash(s"fsord:$src"), src)).zipWithIndex
      .map { case (src, i) => (src, i.toLong, cnt(src)) }
  }

  def rankSidecar(pool: DataFrame, srcCounts: Seq[(String, Long)]): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    val hasDate = pool.columns.contains("date")
    val wSrc = Window.partitionBy(col("source"))
    val base0 = pool
      .withColumn("rn", row_number().over(wSrc.orderBy(col("id"))).cast("long") - 1)
      .withColumn("nsrc", count(lit(1)).over(wSrc).cast("long"))
      // the EPOCH-0 interleave rank (Mixing.epochPick's per-source
      // seeded order for epoch 0, identical orderBy + tiebreak): a pure
      // pool function, so it stages with the sidecar and the first
      // epoch's batches — the overwhelming share of a long pool's
      // serving life (epoch advances only after a full pool cycle) —
      // skip the per-batch rank window entirely; later epochs derive
      // their reshuffled order in-plan as before
      .withColumn("er0", row_number().over(wSrc.orderBy(
        Determinism.seeded("ro:0", col("id")), col("id"))).cast("long") - 1)
    // per-row date-group attrs replace the former dG side table:
    //   drnk — the record's date-group rank within its source
    //          (dense_rank over rows ≡ row_number over distinct dates);
    //   dcnt — the source's date-group count (max drnk + 1)
    val base =
      if (!hasDate) base0
      else {
        val wSD = Window.partitionBy(col("source"), col("date"))
        base0
          .withColumn("rn2", row_number().over(wSD.orderBy(col("id"))).cast("long") - 1)
          .withColumn("dgs", count(lit(1)).over(wSD).cast("long"))
          .withColumn("drnk", (dense_rank().over(wSrc.orderBy(col("date"))) - 1).cast("long"))
          .withColumn("dcnt", max(col("drnk")).over(wSrc).cast("long") + 1)
      }
    // seeded fallback source order, folded in per-row (replaces the sG
    // side table) — a driver-side sort of the already-collected source
    // stats, shipped as a LocalRelation so the broadcast costs no job
    val sOrd = fallbackOrder(srcCounts)
      .map { case (src, srnk, _) => (src, srnk, srcCounts.size.toLong) }
      .toDF("source", "srnk", "scnt")
    val cols0 = Seq(col("id"), col("source"), col("rn"), col("nsrc"),
      col("er0"), col("srnk"), col("scnt")) ++
      (if (hasDate) Seq(col("date"), col("rn2"), col("dgs"), col("drnk"), col("dcnt"))
       else Nil)
    base.join(broadcast(sOrd), Seq("source")).select(cols0: _*)
  }

  def nextBatch(spark: SparkSession, chunks: DataFrame, pool: DataFrame,
      recipes: Seq[TripletRecipe], st: SamplerState, batch: Int,
      decoration: Option[(graft.functions.KvpPrefixSampler, Int)] = None,
      bm25Index: Option[Bm25PoolIndex] = None,
      rankIndex: Option[DataFrame] = None,
      srcStats: Option[Seq[(String, Long)]] = None,
      neighborIndex: Map[Int, DataFrame] = Map.empty): SamplerBatch = {
    val (core, deduped, st2) =
      composed(spark, chunks, pool, recipes, st, batch, decoration, bm25Index,
        rankIndex, srcStats, neighborIndex)
    def rows = Mixing.padToBatch(spark,
        deduped.select(col("draw").as("id")), batch, s"pad:${st.seed}:${st.counter("draw")}")
      .join(deduped.withColumnRenamed("draw", "id"), Seq("id"))
      .withColumnRenamed("id", "draw").withColumnRenamed("i", "slot")
    SamplerBatch(core.drop("allow_same"), () => rows, st2)
  }

  /** The shared composed-triplet stream: returns (core, deduped, state) —
    * `core` is the pre-rejection per-draw stream (with `allow_same`),
    * `deduped` the post-rejection post-seen-set stream the entry points
    * pad from. */
  private def composed(spark: SparkSession, chunks: DataFrame, poolArg: DataFrame,
      recipes: Seq[TripletRecipe], st: SamplerState, batch: Int,
      decoration: Option[(graft.functions.KvpPrefixSampler, Int)] = None,
      bm25Index: Option[Bm25PoolIndex] = None,
      rankIndex: Option[DataFrame] = None,
      srcStats: Option[Seq[(String, Long)]] = None,
      neighborIndex: Map[Int, DataFrame] = Map.empty)
      : (DataFrame, DataFrame, SamplerState) = {
    import spark.implicits._
    require(batch > 0, "batch must be > 0")
    // diagnostic only (SPARK_GRAFT_PHASE_TIMING=1): force each composed
    // stage and print its incremental wall; a no-op pass-through otherwise
    val phaseTiming = sys.env.contains("SPARK_GRAFT_PHASE_TIMING")
    var phaseT0 = System.nanoTime()
    def lap(name: String)(df: DataFrame): DataFrame = {
      if (phaseTiming) {
        val n = df.count()
        val t = System.nanoTime()
        println(f"PHASE $name%-12s ${(t - phaseT0) / 1e9}%6.3f s (n=$n)")
        phaseT0 = t
      }
      df
    }
    val byName = recipes.map(r => r.name -> r).toMap
    // Materialize a BATCH-BOUNDED frame as a driver-local relation: the
    // values come from the same Spark plan (one collect — the same job an
    // eager checkpoint would run), but downstream consumers see a
    // LocalRelation, so broadcasting it costs no job, local projections
    // of it collect without a job, and AQE plans joins against exact
    // sizes. Lineage is cut exactly like localCheckpoint. Applied ONLY to
    // ≤ few×batch-row frames (the slot schedule scale the driver already
    // holds) — corpus-scale frames (pool, rank sidecar, chunk tables)
    // stay executor-side checkpoints.
    def localize(df: DataFrame): DataFrame = localRelation(spark, df)
    // ONE pool materialization per batch: every downstream phase (epoch
    // pick, rank sidecar, temporal lanes, bm25 postings) reads the
    // checkpointed narrow pool instead of re-running the caller's
    // scan+filter lineage (often a corpus tokenize) once per phase. Lazy:
    // it lands inside the first job that touches it.
    val pool = poolArg.localCheckpoint(eager = false)
    // one per-source stats collect serves pool size, every epoch pick,
    // and the fallback source order (#sources-bounded — the same table
    // the reference keeps in memory per pool). A staged deployment passes
    // `srcStats` — the PoolRankIndex-persisted stats (derived at index
    // BUILD, values identical by construction) — and the per-batch pool
    // scan disappears entirely.
    val srcCounts: Seq[(String, Long)] = srcStats.map(_.sortBy(_._1)).getOrElse(
      pool.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1))
    val poolSize = {
      val cached = st.counter("pool_size")
      val n = if (cached > 0L) cached else srcCounts.map(_._2).sum
      require(n > 0, "empty record pool")
      n
    }
    val drawBase = st.counter("draw")
    val (slots, e, cur) =
      scheduleSlots(st, batch, poolSize, ep => Recipes.ticketOrder(recipes, st.seed, ep))

    // ---- pool-rank sidecar (defined early; consumed by the negative
    // dispatch below) ----
    // ONE corpus pass ([[rankSidecar]]) builds per-source ranks and the
    // dated-pool group attrs — checkpointed so the former seven
    // strategy×tier lanes collapse into a single keyed plan reading a
    // tiny materialized table instead of re-planning the corpus window
    // subtree once per lane (the round-9 composed-sampler latency
    // directive). A long-lived deployment passes `rankIndex` — the
    // [[PoolRankIndex]]-persisted sidecar, derived once per pool
    // REFRESH, not per batch (values bit-identical: the index IS this
    // derivation persisted); the pure-function default derives it
    // in-plan and cuts lineage.
    val hasDate = pool.columns.contains("date")
    rankIndex.foreach(ix => require(ix.columns.contains("date") == hasDate,
      "rank index / pool schema mismatch: the index must be built from " +
        "the same pool (date column presence differs)"))
    val rankTbl = rankIndex.getOrElse(
      lap("rankTbl")(rankSidecar(pool, srcCounts).localCheckpoint(eager = false)))
    if (rankIndex.nonEmpty && srcStats.isEmpty) {
      // persisted sidecar WITHOUT its persisted stats: the fallback tier
      // resolves its (srnk → source, rn) target against the SERVING-TIME
      // srcCounts while the sidecar's srnk/scnt were baked at build — a
      // pool that drifted since the index build would silently drop (or
      // retarget) fallback draws through the inner (t_source, t_rn)
      // join. One #sources-bounded aggregate over the sidecar fails
      // loudly instead; staged deployments pass srcStats (the same
      // persisted generation) and never pay this scan.
      val idxCounts = rankTbl.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
      require(idxCounts == srcCounts,
        s"rank index / pool drift: per-source counts differ between the " +
          s"persisted sidecar (${idxCounts.take(3)}…) and the serving pool " +
          s"(${srcCounts.take(3)}…); rebuild the index or pass its srcStats")
    }
    // Overlap (DERIVATION path only): the sidecar depends only on `pool`,
    // whose blocks the srcCounts collect above already materialized —
    // force it on a background thread so its window stages run
    // CONCURRENTLY with the slot-schedule jobs below instead of
    // serializing inside the negative dispatch's job. Values are
    // unaffected (the frame is deterministic and checkpoint blocks dedupe
    // per partition); the join before the dispatch only bounds duplicated
    // compute, never correctness. An INDEX-backed rankTbl is already a
    // flat parquet leaf — forcing it would schedule a pool-scale read
    // into nothing every batch, so the thread only runs when deriving.
    val rankForce: Option[Thread] = if (rankIndex.nonEmpty) None else Some {
      val t = new Thread(
        () => try rankTbl.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
          catch { case _: Throwable => () },
        "graft-rank-sidecar-force")
      t.setDaemon(true)
      t.start()
      t
    }

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
    val slotRec = localize(slots.groupBy(_._2).toSeq.sortBy(_._1).map { case (ep, ss) =>
      val sdf = ss.map(s => (s._1, s._3, s._4, byName(s._4).negative.reason))
        .toDF("draw", "pos", "recipe", "reason")
      // bounded-position pick: invert the dense order analytically instead
      // of materializing a corpus-wide position column per batch. On the
      // staged path, epoch 0's per-source seeded rank is the sidecar's
      // persisted `er0` column — the per-batch rank window disappears
      // for the entire first epoch (derivation-path batches keep the
      // window: reading the lazily-checkpointed in-plan sidecar here
      // would serialize slotRec behind its materialization)
      val pre = if (ep == 0)
        rankIndex.filter(_.columns.contains("er0"))
          .map(_.select(col("source"), col("er0").as("r"), col("id")))
      else None
      Mixing.epochPick(pool, ep, ss.map(_._3), Some(srcCounts), pre)
        .join(broadcast(sdf), "pos")
        .select(col("draw"), lit(ep).as("epoch"), col("recipe"), col("reason"),
          col("id").as("record_id"), col("source"))
    }.reduce(_ unionByName _))
    lap("slotRec")(slotRec)

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
    // (hasTemporal, plan): the chunk-source record per (draw) for one
    // slot's selector set — the PLAN only; callers localize (and fuse
    // several slots into one collect when any lane is temporal)
    def chunkRecordsPlan(sel: TripletRecipe => Selector, base: DataFrame)
        : (Boolean, DataFrame) = {
      // fallback rows carry the `_fallback_same_split`-suffixed recipe
      // name (crossSplitPick) — match both forms
      def forms(ns: Seq[String]) = ns ++ ns.map(_ + Recipes.FallbackSuffix)
      val dayOf = recipes.map(r => r.name -> temporalDays(sel(r)))
      val temporal = dayOf.collect { case (n, Some(d)) => (n, d) }
      if (temporal.isEmpty) (false, base.select(col("draw"), col("record_id")))
      else {
        val plainNames = dayOf.collect { case (n, None) => n }
        val lanes = temporal.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, rs) =>
          val forIds = base.filter(col("recipe").isin(forms(rs.map(_._1)): _*))
            .select(col("draw"), col("record_id"))
          forIds.join(neighborsFor(pool, d, forIds, neighborIndex), Seq("record_id"))
            .select(col("draw"), col("nbid").as("record_id"))
        }
        val plain =
          if (plainNames.isEmpty) Nil
          else Seq(base.filter(col("recipe").isin(forms(plainNames): _*))
            .select(col("draw"), col("record_id")))
        (true, (plain ++ lanes).reduce(_ unionByName _))
      }
    }
    def chunkRecords(sel: TripletRecipe => Selector, base: DataFrame): DataFrame = {
      val (temporal, plan) = chunkRecordsPlan(sel, base)
      if (temporal) localize(plan) else plan
    }

    // ---- negative record: fused strategy × tier dispatch over the
    // rank sidecar defined (and force-started) above ----
    def drawKey(prefix: String) = Determinism.portableHash(
      concat(lit(s"$prefix:${st.seed}:"), col("draw").cast("string"), lit(":"),
        col("record_id").cast("string")))
    // same strings as drawKey, with the stream prefix as a per-row COLUMN
    def drawKeyOf(stream: Column) = Determinism.portableHash(
      concat(stream, lit(s":${st.seed}:"), col("draw").cast("string"), lit(":"),
        col("record_id").cast("string")))
    // `lane` (the resolved tier: src/sd/wd/fb, or bm25) rides along for
    // the extended-metrics report (reference bm25_backend.rs:156-172) —
    // a pure relabeling of rows that already existed, so every digest
    // and oracle that selects named columns is untouched
    val negOut = Seq("draw", "epoch", "recipe", "reason", "record_id", "nid").map(col) :+
      col("tier").as("lane")
    // the fallback lane's (srnk → source, count) resolution table — the
    // SAME derivation rankSidecar folds into the persisted sidecar
    // ([[fallbackOrder]]), built once per batch (strategyPick can run
    // twice — Default and BM25 backends) as a #sources-row LocalRelation
    lazy val fbOrd = {
      import spark.implicits._
      fallbackOrder(srcCounts)
        .map { case (src, srnk, n) => (srnk, src, n) }
        .toDF("t_srnk", "t_source", "t_nsrc")
    }
    val waR = NegativeStrategy.WrongArticle.reason
    val qaR = NegativeStrategy.QuestionAnswerMismatch.reason
    val wdR = NegativeStrategy.WrongPublicationDate.reason
    /** All DefaultBackend strategy×tier lanes as ONE keyed plan
      * (reference pool staging, src/sampler/mod.rs:994-1151): each anchor
      * row picks its tier —
      *   WrongArticle → same-source same-DATE skip-the-anchor (`nega`,
      *     dated pools with a ≥2 date group) → same-source (`neg`) →
      *     fallback;
      *   QuestionAnswerMismatch → same-source (`negq`) → fallback;
      *   WrongPublicationDate → other-date-group two-level
      *     (`negd`/`negr`) → fallback;
      *   fallback = cross-source same-split two-level (`negs`/`negc`),
      *     recipe suffixed `_fallback_same_split`; slots whose pool holds
      *     no other source drop (src/sampler/mod.rs:1097-1151, 1391-1395)
      * — then each tier resolves through ONE direct keyed lookup into the
      * enriched sidecar: src by (source, rn), sd by (source, date, rn2),
      * wd by (source, drnk) + the in-group rank filter (the filter reads
      * the TARGET row's own group size — the match is bounded by one
      * date-group, and the group sizes are not known driver-side), fb by
      * the exact (source, rn) key (the srnk→source order and per-source
      * counts ARE driver-side, so the target rank resolves before the
      * sidecar join — one matched row per draw). Hash
      * streams, tier predicates, and delivered values are bit-identical
      * to the per-lane dispatch (golden matrix + q57/q58/q59/q66 oracles
      * pin this). */
    def strategyPick(anchors: DataFrame, strategies: Seq[NegativeStrategy]): DataFrame = {
      if (strategies.contains(NegativeStrategy.WrongPublicationDate))
        require(hasDate,
          "WrongPublicationDate recipes need a `date` column in the pool")
      val metaCols = Seq(col("id").as("record_id"), col("rn").as("a_rn"), col("nsrc"),
        col("srnk"), col("scnt")) ++
        (if (hasDate) Seq(col("date").as("a_date"), col("rn2").as("a_rn2"), col("dgs"),
          col("drnk").as("a_drnk"), col("dcnt"))
         else Nil)
      val m = anchors.join(rankTbl.select(metaCols: _*), Seq("record_id"))
      val waTier =
        if (hasDate)
          when(col("dgs") >= 2, lit("sd"))
            .when(col("nsrc") >= 2, lit("src")).otherwise(lit("fb"))
        else when(col("nsrc") >= 2, lit("src")).otherwise(lit("fb"))
      val tierCol = {
        val base = when(col("reason") === waR, waTier)
          .when(col("reason") === qaR,
            when(col("nsrc") >= 2, lit("src")).otherwise(lit("fb")))
        if (hasDate)
          base.when(col("reason") === wdR,
            when(col("dcnt") >= 2, lit("wd")).otherwise(lit("fb")))
        else base
      }
      val t0 = m.withColumn("tier", tierCol)
        .filter(col("tier") =!= "fb" || col("scnt") >= 2)
      val t1 =
        if (!hasDate) t0
        else t0
          .withColumn("p0sd", pmod(drawKey("nega"), greatest(col("dgs") - 1, lit(1L))))
          .withColumn("n_rn2",
            when(col("p0sd") >= col("a_rn2"), col("p0sd") + 1).otherwise(col("p0sd")))
          .withColumn("d0", pmod(drawKey("negd"), greatest(col("dcnt") - 1, lit(1L))))
          .withColumn("t_drnk", when(col("tier") === "wd",
            when(col("d0") >= col("a_drnk"), col("d0") + 1).otherwise(col("d0"))))
      val t = t1
        .withColumn("p0s", pmod(
          drawKeyOf(when(col("reason") === qaR, lit("negq")).otherwise(lit("neg"))),
          greatest(col("nsrc") - 1, lit(1L))))
        .withColumn("n_rn",
          when(col("p0s") >= col("a_rn"), col("p0s") + 1).otherwise(col("p0s")))
        .withColumn("s0", pmod(drawKey("negs"), greatest(col("scnt") - 1, lit(1L))))
        .withColumn("t_srnk", when(col("tier") === "fb",
          when(col("s0") >= col("srnk"), col("s0") + 1).otherwise(col("s0"))))
        .withColumn("recipe", when(col("tier") === "fb",
          concat(col("recipe"), lit(Recipes.FallbackSuffix))).otherwise(col("recipe")))
      // per-tier resolution lookups (each a broadcast-side batch frame
      // against the checkpointed sidecar)
      val srcKeyed = t.filter(col("tier") === "src")
        .join(rankTbl.select(col("source"), col("rn").as("n_rn"), col("id").as("nid")),
          Seq("source", "n_rn"))
        .select(negOut: _*)
      // fallback: the target source is the t_srnk-ranked one; the record
      // inside it is `pmod(negc-key, ccnt)`. Both the srnk→source order
      // and the per-source counts are pure functions of `srcCounts`
      // (exactly the values rankSidecar folds into the sidecar), so the
      // target's (source, rn) key resolves against a #sources-row
      // broadcast BEFORE the sidecar join — one matched row per fb draw,
      // not one per record of the target source (which at corpus scale
      // made the fb lane's join output grow with source size).
      val fbKeyed = t.filter(col("tier") === "fb")
        .join(broadcast(fbOrd), Seq("t_srnk"))
        .withColumn("t_rn", pmod(drawKey("negc"), col("t_nsrc")))
        .join(rankTbl.select(col("source").as("t_source"), col("rn").as("t_rn"),
          col("id").as("nid")), Seq("t_source", "t_rn"))
        .select(negOut: _*)
      val srcSide = srcKeyed.unionByName(fbKeyed)
      if (!hasDate) srcSide
      else {
        val sdKeyed = t.filter(col("tier") === "sd")
          .join(rankTbl.select(col("source"), col("date").as("a_date"),
            col("rn2").as("n_rn2"), col("id").as("nid")),
            Seq("source", "a_date", "n_rn2"))
          .select(negOut: _*)
        // wrong-date: target group by (source, drnk); the record inside it
        // is `pmod(negr-key, dct)` where dct (== the target group's dgs)
        // is read off the target rows
        val wdKeyed = t.filter(col("tier") === "wd")
          .join(rankTbl.select(col("source"), col("drnk").as("t_drnk"),
            col("rn2").as("t_rn2"), col("dgs").as("t_dgs"), col("id").as("nid")),
            Seq("source", "t_drnk"))
          .filter(col("t_rn2") === pmod(drawKey("negr"), col("t_dgs")))
          .select(negOut: _*)
        srcSide.unionByName(sdKeyed).unionByName(wdKeyed)
      }
    }
    def strategiesOf(backend: NegativeBackend): Seq[NegativeStrategy] =
      slots.map(s => byName(s._4)).filter(_.negativeBackend == backend)
        .map(_.negative).distinct
    val bmNames = recipes.filter(_.negativeBackend == NegativeBackend.Bm25).map(_.name)

    // ---- BM25 scoring sidecar (slot-INDEPENDENT): postings → weighted
    // per-(source, term, cand) e6 term scores. Everything here is a pure
    // function of the pool and the batch's source set — no dependency on
    // which chunk each slot picked — so it is checkpointed and FORCED on a
    // background thread right after the slot schedule: the tokenize + df
    // window chain (the lane's most expensive stages) overlaps the rank
    // sidecar and the a/p pick chain instead of serializing inside the
    // negative dispatch's job. At deployment scale this table IS the
    // persisted [[Bm25PoolIndex]] (derived per pool refresh, not per
    // batch); the pure-function default derives it in-plan per batch.
    val wtermPre: Option[DataFrame] = if (bmNames.isEmpty) None else Some {
      require(bm25Index.nonEmpty || pool.columns.contains("btoks"),
        "BM25-backend recipes need a `btoks` token-array column in the pool " +
          "(or a prebuilt Bm25PoolIndex)")
      // batch-bounded source list, deduped on the driver (slotRec is a
      // LocalRelation — no job): the restriction lands as an isin PUSHDOWN
      // on the derived-postings path and a LocalRelation broadcast on the
      // persisted-index path
      val srcList = slotRec.filter(col("recipe").isin(bmNames: _*))
        .select(col("source")).collect().map(_.getString(0)).distinct.toSeq
      // Three tiers, bit-identical by construction (one formula —
      // [[Bm25PoolIndex.weightedTerms]] — pinned in InvariantsSpec):
      //   1. staged wterm in the prebuilt index: the whole df/idf/tf-part
      //      pass ran at BUILD time; the batch path is a source-filtered
      //      parquet read (row-group pruned) — zero pool-scale work;
      //   2. raw prebuilt postings (pre-staging generation): weight
      //      per batch over the persisted tf table;
      //   3. no index: derive postings from the source-restricted pool,
      //      then weight (the pure-function default).
      bm25Index.flatMap(_.wterm) match {
        case Some(w) =>
          // no checkpoint and no background force: the staged table is a
          // flat parquet leaf already — the scoring join streams it with
          // the source filter pruning row groups; a checkpoint would only
          // re-materialize a pool-scale table into the block store per
          // batch (A/B'd wall-neutral locally, strictly worse at scale)
          w.filter(col("source").isin(srcList: _*))
        case None =>
          val srcs = srcList.toDF("source")
          val (tf, stats) = bm25Index match {
            case Some(ix) =>
              (ix.postings.join(broadcast(srcs), "source"),
                ix.srcStats.join(broadcast(srcs), "source"))
            case None =>
              val ix = Bm25PoolIndex.fromPool(pool.filter(col("source").isin(srcList: _*)))
              (ix.postings, ix.srcStats)
          }
          val w = Bm25PoolIndex.weightedTerms(tf, stats).localCheckpoint(eager = false)
          // derivation path: force the checkpoint on a background thread
          // so the tokenize/window chain overlaps the a/p pick jobs
          val t = new Thread(
            () => try w.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
              catch { case _: Throwable => () },
            "graft-bm25-wterm-force")
          t.setDaemon(true); t.start()
          w
      }
    }

    /** Bm25Backend lanes (reference: bm25_backend.rs:120-174): re-rank the
      * strategy pool by the BM25 score of the anchor's SELECTED chunk text
      * against each candidate's `btoks`, rotate through the top-3 by the
      * (seed, draw, anchor) hash stream — the stateless twin of the
      * reference's per-(anchor, split) cursor — and fall back to the
      * DefaultBackend pick for slots whose scored intersection is empty.
      *
      * Scale shape: candidates/tf/stats are semi-joined to the BATCH's
      * anchor sources, and the whole weighted-term table is the
      * pre-forced checkpoint above. The anchor⋈candidate product passes
      * through ONE (source, term) join (the q85 lane's shape). The
      * anchor-text pick re-runs the final a-slot's pure pick (stream
      * `sel:a:` — bit-identical text) over the a/p chain's ALREADY
      * MATERIALIZED batch-restricted chunk checkpoint, so the re-pick
      * costs one narrow window over a tiny leaf, not a second chunk
      * derivation. */
    def bm25Lanes(qtermsPre: (DataFrame, Seq[String])): DataFrame = {
      val bmSlots = slotRec.filter(col("recipe").isin(bmNames: _*))
      val (qterms, termList) = qtermsPre
      val wterm = wtermPre.get.filter(col("term").isin(termList: _*))
      val scoredAll = broadcast(
          bmSlots.select(col("draw"), col("record_id"), col("source"), col("reason"))
            .join(qterms, "draw"))
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
      // top-3 + rotation as ONE aggregation — ascending struct sort on
      // (-score, cand) ≡ the former (score desc, cand) rank window, the
      // rotation modulus is the array size ≡ the former count window, and
      // an empty intersection simply produces no row. Replaces two window
      // exchanges + a filter with a single shuffle on the already-grouped
      // keys.
      val picked = scored.groupBy(col("draw"), col("record_id"))
        .agg(slice(array_sort(collect_list(
          struct((-col("score_e6")).as("ns"), col("cand")))), 1, 3).as("t3"))
        .select(col("draw"), element_at(col("t3"),
          (pmod(drawKey("negb"), size(col("t3")).cast("long")) + 1).cast("int"))
          .getField("cand").as("nid"))
      // BM25 hit lane and the empty-intersection default fallback as ONE
      // plan: both left-join the LocalRelation slot frame, so the scoring
      // chain and the keyed default pick execute CONCURRENTLY inside the
      // single negRec job (formerly: materialize picked → anti-join →
      // strategyPick(rest), a sequential second job) and the scoring
      // subtree is referenced exactly once — no mid-lane materialization.
      // strategyPick is per-row pure (keyed sidecar lookups), so running
      // it over hit slots too and discarding those rows changes no value.
      val dflt = strategyPick(bmSlots, strategiesOf(NegativeBackend.Bm25))
        .select(col("draw"), col("recipe").as("d_recipe"), col("nid").as("d_nid"),
          col("lane").as("d_lane"))
      bmSlots
        .join(picked.withColumnRenamed("nid", "b_nid"), Seq("draw"), "left")
        .join(dflt, Seq("draw"), "left")
        .filter(col("b_nid").isNotNull || col("d_nid").isNotNull)
        .select(col("draw"), col("epoch"),
          when(col("b_nid").isNotNull, col("recipe")).otherwise(col("d_recipe")).as("recipe"),
          col("reason"), col("record_id"),
          coalesce(col("b_nid"), col("d_nid")).as("nid"),
          when(col("b_nid").isNotNull, lit("bm25")).otherwise(col("d_lane")).as("lane"))
    }

    // the delivered text hash: raw chunk text, or the decorated text when a
    // KVP sampler is configured (decoration is a pure (record, draw)
    // function, so the composed stream stays batch/partition invariant)
    val slotText: Column = decoration match {
      case None => col("wtext")
      case Some((smp, maxTok)) =>
        Decoration.decorateColumn(smp,
          concat(lit("dec:"), col("slot"), lit(":"), col("record_id").cast("string"),
            lit(":"), col("draw").cast("string")),
          split(col("wtext"), " "), maxTok).getField("text")
    }

    // ---- the ENTIRE anchor + positive pick chain, run CONCURRENTLY with
    // the negative dispatch below: chunk-source records (temporal neighbor
    // swap) → batch-restricted chunk checkpoint → ONE fused a/p window
    // pick → localized per-draw pivot. The a/p lanes read only pool +
    // slotRec (both materialized), never the negative lane, so a second
    // thread overlaps their pool-scale neighbor joins AND the chunk
    // derivation/window stages with the dispatch's job instead of
    // serializing after it. Only the n-slot pick has to wait for the
    // negative dispatch — it runs on the main thread below over its own
    // (negative-record) restriction. Values are untouched: the pick
    // streams (`sel:a:`/`sel:p:`) are pure (draw, record) functions and
    // the split pivot aggregates the same per-slot rows the former fused
    // three-slot pivot did.
    val apMelt = slots.map { case (draw, _, _, name) =>
      val r = byName(name)
      val (am, aa) = selectorDesc(r.anchor)
      val (pm, pa) = selectorDesc(r.positive)
      (draw, am, aa, pm, pa)
    }.flatMap { case (draw, am, aa, pm, pa) =>
      Seq((draw, "a", am, aa), (draw, "p", pm, pa))
    }.toDF("draw", "slot", "mode", "arg")
    // Two futures on ONE thread: `apPrepTask` (chunk-source records +
    // the batch-restricted chunk checkpoint plan) completes without any
    // job for non-temporal recipe sets — so the bm25 scoring lane, which
    // needs only the PREP (anchor records + chunksAP), no longer waits
    // behind the a/p window-pick collect; that collect (`apPicksTask`)
    // overlaps the negative dispatch's job instead.
    val apPrepTask = new java.util.concurrent.FutureTask(() => {
      val (aTmp, aPlan) = chunkRecordsPlan(_.anchor, slotRec)
      val (pTmp, pPlan) = chunkRecordsPlan(_.positive, slotRec)
      // ONE collect covers both slots when any lane is temporal (the two
      // neighbor-join plans union and materialize together); non-temporal
      // sets are pure LocalRelation projections — no job
      val (aRecs, pRecs) =
        if (!aTmp && !pTmp) (aPlan, pPlan)
        else {
          val ap = localize(
            aPlan.withColumn("sl", lit("a")).unionByName(pPlan.withColumn("sl", lit("p"))))
          (ap.filter(col("sl") === "a").drop("sl"), ap.filter(col("sl") === "p").drop("sl"))
        }
      // both rec frames are LocalRelations, so these collects run
      // driver-side without scheduling a job; dedupe in Scala rather than
      // a distinct() whose Aggregate would schedule one
      val ids = (aRecs.select(col("record_id")).collect() ++
          pRecs.select(col("record_id")).collect())
        .map(_.getLong(0)).distinct.toSeq
      // batch id restriction as an isin PREDICATE, not a join (pushes
      // below the chunk table's window/explode derivation — see the
      // n-lane comment below). Lazy: an eager checkpoint here was A/B'd
      // WORSE — it stalls the bm25 lane (which needs only this PLAN)
      // behind the materialization job; the duplicate-derivation race
      // between the a/p pick job and the scoring job is bounded by the
      // block store's per-partition dedupe.
      val chunksAP = chunks.filter(col("record_id").isin(ids: _*))
        .localCheckpoint(eager = false)
      (aRecs, pRecs, chunksAP)
    })
    val apPicksTask = new java.util.concurrent.FutureTask(() => {
      val (aRecs, pRecs, chunksAP) = apPrepTask.get()
      val apRows = aRecs.withColumn("slot", lit("a"))
        .unionByName(pRecs.withColumn("slot", lit("p")))
      val sel = Recipes.selectChunksBatchSlots(chunksAP,
          apRows.join(broadcast(apMelt), Seq("draw", "slot")))
        .select(col("slot"), col("draw"),
          col("window_index").cast("long").as("widx"),
          Determinism.portableHash(slotText).as("thash"))
      localize(sel.groupBy(col("draw")).agg(
        max(when(col("slot") === "a", col("widx"))).as("a_widx"),
        max(when(col("slot") === "a", col("thash"))).as("a_hash"),
        max(when(col("slot") === "p", col("widx"))).as("p_widx"),
        max(when(col("slot") === "p", col("thash"))).as("p_hash")))
    })
    // qterms for the bm25 scoring lane, on the SAME background thread
    // right after the prep (and BEFORE the a/p pick collect — the
    // negative dispatch needs qterms on its critical path, the core
    // join needs apPicks only later): one narrow window over the
    // batch-restricted chunk leaf, materialized as a LocalRelation. The
    // batch's DISTINCT TERM SET then becomes an isin PREDICATE on the
    // weighted-term side — on the staged-index tier that pushes into the
    // wterm parquet scan (sorted by (source, term), so row groups
    // prune), on the derived tiers it shrinks the scoring join's input
    // from every term the batch's sources ever used to the ~hundreds the
    // batch actually asks about. This is the reference's per-term
    // postings probe (bm25_backend.rs:120-174 probes its HashMap per
    // query term) re-expressed as scan pruning; term weights are
    // per-(source,term) constants fixed at build/derive time, so
    // dropping never-joined terms cannot move a score. Formerly this
    // collect ran serially inside the negative dispatch; moving it here
    // overlaps it with the slot schedule / sidecar work on the main
    // thread — values untouched (the qterms frame is a pure function of
    // the prep outputs).
    val qtermsTask = new java.util.concurrent.FutureTask(() => {
      val (aRecsAll, _, chunksAP) = apPrepTask.get()
      val bmSlots = slotRec.filter(col("recipe").isin(bmNames: _*))
      val bmARecs = aRecsAll.join(broadcast(bmSlots.select(col("draw"))), Seq("draw"))
      val bmDraws = bmARecs.withColumn("slot", lit("a"))
        .join(broadcast(slotMeta.select(col("draw"),
          col("a_mode").as("mode"), col("a_arg").as("arg"))), Seq("draw"))
      val qterms = localize(Recipes.selectChunksBatchSlots(chunksAP, bmDraws)
        .select(col("draw"), explode(array_distinct(
          graft.functions.TextFunctions.tokens(col("wtext")))).as("term")))
      val termList = qterms.select(col("term")).collect()
        .map(_.getString(0)).distinct.toSeq
      (qterms, termList)
    })
    locally {
      val t = new Thread(() => {
        apPrepTask.run()
        if (bmNames.nonEmpty) qtermsTask.run()
        apPicksTask.run()
      }, "graft-ap-pick-chain")
      t.setDaemon(true); t.start()
    }

    val negRec = {
      // bound duplicated compute: let the background sidecar force finish
      // before the dispatch job reads it (values identical either way)
      rankForce.foreach(_.join())
      val dflt = strategyPick(
        if (bmNames.isEmpty) slotRec else slotRec.filter(!col("recipe").isin(bmNames: _*)),
        strategiesOf(NegativeBackend.Default))
      lap("negRec")(localize(
        if (bmNames.isEmpty) dflt else dflt.unionByName(bm25Lanes(qtermsTask.get()))))
    }

    // ---- n-slot pick: the only selector window that has to FOLLOW the
    // negative dispatch (its chunk-source records are the picked
    // negatives). Same shape as the a/p chain above: isin PREDICATE
    // restriction (a broadcast join sits above the chunk table's
    // window/explode derivation and cannot push through the Generate, so
    // every batch would re-chunk the whole corpus; the id list is
    // batch-bounded and as a filter it pushes below the derivation to the
    // record scan — per-batch chunking cost ∝ batch size, not corpus
    // size), then the fused window pick (stream `sel:n:`).
    val nRecs = chunkRecords(_.negativeSelector,
      negRec.select(col("draw"), col("recipe"), col("nid").as("record_id")))
    val nIds = nRecs.select(col("record_id")).collect()
      .map(_.getLong(0)).distinct.toSeq
    if (phaseTiming) lap("nIds")(spark.emptyDataFrame)
    val chunksN = lap("chunksN")(
      chunks.filter(col("record_id").isin(nIds: _*)).localCheckpoint(eager = false))
    val nMelt = slots.map { case (draw, _, _, name) =>
      val (nm, na) = selectorDesc(byName(name).negativeSelector)
      (draw, "n", nm, na)
    }.toDF("draw", "slot", "mode", "arg")
    // `draw` is unique per slot, so after the record restriction it alone
    // keys the pick — and for temporal slots the chunk-source record (the
    // neighbor) is NOT the slot's scheduled record, so the core join below
    // is on draw, never on record_id. ≤1 pick row survives per draw, so
    // the projection needs no pivot.
    val nPick = Recipes.selectChunksBatchSlots(chunksN,
        nRecs.withColumn("slot", lit("n")).join(broadcast(nMelt), Seq("draw", "slot")))
      .select(col("draw"), Determinism.portableHash(slotText).as("n_hash"))

    // the a/p pivot from the background chain; its null filter + the
    // inner join on the n pick reproduce the former fused-pivot
    // semantics — a draw whose ANY slot found no eligible chunk drops
    // from the core stream
    val apPicks = apPicksTask.get()
    val core = negRec
      .join(apPicks, Seq("draw"))
      .join(nPick, Seq("draw"))
      .join(broadcast(slotMeta.select(col("draw"), col("allow_same"))), Seq("draw"))
      .filter(col("a_hash").isNotNull && col("p_hash").isNotNull &&
        col("n_hash").isNotNull)
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"),
        col("a_widx"), col("a_hash"), col("p_widx"), col("p_hash"),
        col("nid"), col("n_hash"), col("reason"), col("allow_same"), col("lane"))
    val coreL = localize(core)
    lap("core")(coreL)

    // ---- batch-local stages: rejection → seen-set dedup (pad is the
    // entry point's job — triplet and pair batches pad different grains) --
    val rejected = coreL.filter(col("allow_same") || col("a_hash") =!= col("p_hash"))
    val seenW = Window.partitionBy(col("record_id"), col("a_widx"), col("p_widx"), col("nid"))
      .orderBy(col("draw"))
    val deduped = rejected
      .withColumn("rk", row_number().over(seenW)).filter(col("rk") === 1)
      .drop("rk", "allow_same")

    val st2 = st.copy(epoch = e, counters = st.counters
      .updated("draw", drawBase + batch).updated("cursor", cur)
      .updated("pool_size", poolSize))
    (coreL, deduped, st2)
  }

  /** The composed pair batch (reference `next_pair_batch`,
    * src/sampler/mod.rs:2011-2110): each composed triplet yields TWO
    * labeled pairs — (anchor, positive, label=positive, reason NULL) and
    * (anchor, negative, label=negative, reason = the strategy tag) — so a
    * `batch`-pair request drives ⌈batch/2⌉ triplet draws through the SAME
    * counters as [[nextBatch]] (shared cursor/epoch/draw: the entry points
    * continue one global sequence, and resume covers them all). `core` is
    * the post-rejection pair stream keyed by (draw, pair index);
    * `rows` pads to exactly `batch` pairs. */
  def nextPairBatch(spark: SparkSession, chunks: DataFrame, pool: DataFrame,
      recipes: Seq[TripletRecipe], st: SamplerState, batch: Int,
      decoration: Option[(graft.functions.KvpPrefixSampler, Int)] = None,
      rankIndex: Option[DataFrame] = None,
      srcStats: Option[Seq[(String, Long)]] = None,
      neighborIndex: Map[Int, DataFrame] = Map.empty): SamplerBatch = {
    val nTrip = (batch + 1) / 2
    val (core, deduped, st2) = composed(spark, chunks, pool, recipes, st, nTrip,
      decoration, None, rankIndex, srcStats, neighborIndex)
    def pairsOf(df: DataFrame): DataFrame = df
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"),
        col("nid"), col("a_hash"), col("reason").as("strategy"),
        explode(array(
          struct(lit(0L).as("pidx"), lit("positive").as("label"),
            col("p_hash").as("r_hash"), lit(null).cast("string").as("reason")),
          struct(lit(1L).as("pidx"), lit("negative").as("label"),
            col("n_hash").as("r_hash"), col("reason").as("reason")))).as("pr"))
      .select(col("draw"), (col("draw") * 2 + col("pr.pidx")).as("pair_id"),
        col("epoch"), col("recipe"), col("record_id"), col("nid"),
        col("pr.label").as("label"), col("a_hash").as("l_hash"),
        col("pr.r_hash").as("r_hash"), col("pr.reason").as("reason"))
    val tripCore = core.filter(col("allow_same") || col("a_hash") =!= col("p_hash"))
      .drop("allow_same")
    val pairCore = pairsOf(tripCore)
    def rows = {
      val pairDeduped = pairsOf(deduped)
      Mixing.padToBatch(spark,
          pairDeduped.select(col("pair_id").as("id")), batch,
          s"padp:${st.seed}:${st.counter("draw")}")
        .join(pairDeduped.withColumnRenamed("pair_id", "id"), Seq("id"))
        .withColumnRenamed("id", "pair_id").withColumnRenamed("i", "slot")
    }
    // extended metrics ride the TRIPLET core the pairs derive from (one
    // negative dispatch per triplet draw, regardless of the 2-row pair
    // explosion)
    SamplerBatch(pairCore, () => rows, st2, Some(tripCore))
  }

  /** The composed text batch (reference `next_text_batch`,
    * src/sampler/mod.rs:2210-2364): text recipes scheduled by their own
    * ticket plan ([[Recipes.textTicketOrder]] — the analogue of the
    * separate `text_recipe_rr_idx`) over the SAME epoch-interleaved record
    * order and counters as the triplet entry points; one selector chunk
    * pick per draw (hash stream `sel:t:`), seen-set dedup by the chunk key
    * (record, section, window) keeping the earliest draw, pad to `batch`.
    * Temporal selectors swap in the as-of neighbor exactly like
    * [[nextBatch]]'s anchor lane. No negative dispatch ⇒ no rank sidecar
    * is derived here, so there is no `rankIndex` parameter: a staged
    * deployment serves the POOL from the persisted [[PoolRankIndex]]
    * (its (id, source) columns) and passes it as `poolArg`. */
  def nextTextBatch(spark: SparkSession, chunks: DataFrame, poolArg: DataFrame,
      textRecipes: Seq[TextRecipe], st: SamplerState, batch: Int,
      decoration: Option[(graft.functions.KvpPrefixSampler, Int)] = None,
      srcStats: Option[Seq[(String, Long)]] = None,
      neighborIndex: Map[Int, DataFrame] = Map.empty): SamplerBatch = {
    import spark.implicits._
    require(batch > 0, "batch must be > 0")
    val byName = textRecipes.map(r => r.name -> r).toMap
    def localize(df: DataFrame): DataFrame = localRelation(spark, df)
    val pool = poolArg.localCheckpoint(eager = false) // one materialization (see composed)
    val srcCounts: Seq[(String, Long)] = srcStats.map(_.sortBy(_._1)).getOrElse(
      pool.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1))
    val poolSize = {
      val cached = st.counter("pool_size")
      val n = if (cached > 0L) cached else srcCounts.map(_._2).sum
      require(n > 0, "empty record pool")
      n
    }
    val drawBase = st.counter("draw")
    val (slots, e, cur) = scheduleSlots(st, batch, poolSize,
      ep => Recipes.textTicketOrder(textRecipes, st.seed, ep))
    val slotRec = localize(slots.groupBy(_._2).toSeq.sortBy(_._1).map { case (ep, ss) =>
      val sdf = ss.map(s => (s._1, s._3, s._4)).toDF("draw", "pos", "recipe")
      Mixing.epochPick(pool, ep, ss.map(_._3), Some(srcCounts)).join(broadcast(sdf), "pos")
        .select(col("draw"), lit(ep).as("epoch"), col("recipe"),
          col("id").as("record_id"), col("source"))
    }.reduce(_ unionByName _))
    val slotMeta = slots.map { case (draw, _, _, name) =>
      val (m, a) = selectorDesc(byName(name).selector)
      (draw, m, a)
    }.toDF("draw", "mode", "arg")
    // temporal selectors: the chunk-source record is the as-of neighbor
    val tRecs = {
      val dayOf = textRecipes.map(r => r.name -> temporalDays(r.selector))
      val temporal = dayOf.collect { case (n, Some(d)) => (n, d) }
      if (temporal.isEmpty) slotRec.select(col("draw"), col("record_id"))
      else {
        val plainNames = dayOf.collect { case (n, None) => n }
        val lanes = temporal.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, rs) =>
          val forIds = slotRec.filter(col("recipe").isin(rs.map(_._1): _*))
            .select(col("draw"), col("record_id"))
          forIds.join(neighborsFor(pool, d, forIds, neighborIndex), Seq("record_id"))
            .select(col("draw"), col("nbid").as("record_id"))
        }
        val plain =
          if (plainNames.isEmpty) Nil
          else Seq(slotRec.filter(col("recipe").isin(plainNames: _*))
            .select(col("draw"), col("record_id")))
        localize((plain ++ lanes).reduce(_ unionByName _))
      }
    }
    val ids = tRecs.select(col("record_id")).collect().map(_.getLong(0)).distinct.toSeq
    val chunksR = chunks.filter(col("record_id").isin(ids: _*)).localCheckpoint(eager = false)
    val tText: Column = decoration match {
      case None => col("wtext")
      case Some((smp, maxTok)) =>
        Decoration.decorateColumn(smp,
          concat(lit("dec:t:"), col("record_id").cast("string"),
            lit(":"), col("draw").cast("string")),
          split(col("wtext"), " "), maxTok).getField("text")
    }
    // the fused slot path (stream `sel:t:`) — record restriction in the
    // eligibility join, pick bit-identical to selectChunksBatch + join
    val pick = Recipes.selectChunksBatchSlots(chunksR,
        tRecs.withColumn("slot", lit("t")).join(broadcast(slotMeta), Seq("draw")))
      .select(col("draw"), col("record_id").as("chunk_record"),
        col("section_idx").cast("long").as("t_sidx"),
        col("window_index").cast("long").as("t_widx"),
        Determinism.portableHash(tText).as("t_hash"))
    val core = localize(slotRec
      .join(pick, Seq("draw"))
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"),
        col("chunk_record"), col("t_sidx"), col("t_widx"), col("t_hash")))
    // seen-set dedup by the chunk key, earliest draw wins (reference
    // chunk_key dedup, src/sampler/mod.rs:2288-2292)
    val seenW = Window.partitionBy(col("chunk_record"), col("t_sidx"), col("t_widx"))
      .orderBy(col("draw"))
    val deduped = core.withColumn("rk", row_number().over(seenW)).filter(col("rk") === 1)
      .drop("rk")
    def rows = Mixing.padToBatch(spark,
        deduped.select(col("draw").as("id")), batch, s"padt:${st.seed}:$drawBase")
      .join(deduped.withColumnRenamed("draw", "id"), Seq("id"))
      .withColumnRenamed("id", "draw").withColumnRenamed("i", "slot")
    val st2 = st.copy(epoch = e, counters = st.counters
      .updated("draw", drawBase + batch).updated("cursor", cur)
      .updated("pool_size", poolSize))
    SamplerBatch(core, () => rows, st2)
  }
}
