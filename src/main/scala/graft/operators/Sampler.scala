package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   selector chunk picks → wrong-article negative → identical-text
  *   rejection → seen-set dedup → pad_with_reuse → state advance.
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
  * chunk restriction join (broadcast of a batch-sized id list onto the
  * chunk table scan). Everything downstream — selector windows, negative
  * rank-pick, dedup, pad — runs on batch-bounded frames. No collect of
  * record data; the driver holds only counters and the slot schedule.
  */
object Sampler {

  /** Selector → (mode, arg) for the broadcast draws frame of
    * [[Recipes.selectChunksBatch]]. */
  def selectorDesc(s: Selector): (String, String) = s match {
    case Selector.RoleAnchor => ("role", "anchor")
    case Selector.RoleContext => ("role", "context")
    case Selector.Paragraph(i) => ("para", i.toString)
    case Selector.Random => ("random", "")
    case Selector.TemporalOffset(_) =>
      throw new IllegalArgumentException("TemporalOffset is record-level, not chunk-level")
  }

  /** Produce the next batch of `batch` triplets.
    *
    * @param chunks chunk table (columns of [[graft.core.RecordChunk]]):
    *               record_id, section_idx, role, view_kind, window_index,
    *               overlap, wtext
    * @param pool   record pool: `id`, `source` (one row per record)
    * @param recipes resolved recipe set (configured or source defaults —
    *               apply [[Recipes.resolve]]/[[Recipes.withAutoInjected]]
    *               upstream)
    * @param st     counters: `draw` (global, never resets — drives recipe
    *               rotation and every hash pick), `cursor` (position in the
    *               epoch's interleave, resets on epoch advance)
    */
  def nextBatch(spark: SparkSession, chunks: DataFrame, pool: DataFrame,
      recipes: Seq[TripletRecipe], st: SamplerState, batch: Int): SamplerBatch = {
    import spark.implicits._
    require(batch > 0, "batch must be > 0")
    val byName = recipes.map(r => r.name -> r).toMap
    val poolSize = pool.count()
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
      val sdf = ss.map(s => (s._1, s._3, s._4)).toDF("draw", "pos", "recipe")
      Mixing.epochOrder(pool, ep).join(broadcast(sdf), "pos")
        .select(col("draw"), lit(ep).as("epoch"), col("recipe"),
          col("id").as("record_id"), col("source"))
    }.reduce(_ unionByName _).localCheckpoint()

    // ---- negative record: same source, skip-the-anchor rank pick ----
    val srcRank = pool
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("id"))).cast("long") - 1)
      .withColumn("nsrc", count(lit(1)).over(
        Window.partitionBy(col("source"))).cast("long"))
    val negRec = slotRec
      .join(srcRank.select(col("id").as("record_id"), col("rn").as("a_rn"), col("nsrc")),
        Seq("record_id"))
      .withColumn("p0", pmod(Determinism.portableHash(
          concat(lit(s"neg:${st.seed}:"), col("draw").cast("string"), lit(":"),
            col("record_id").cast("string"))),
        greatest(col("nsrc") - 1, lit(1L))))
      // a source with a single record yields rank 1 → no match → slot drops
      .withColumn("n_rn", when(col("p0") >= col("a_rn"), col("p0") + 1).otherwise(col("p0")))
      .join(srcRank.select(col("source"), col("rn").as("n_rn"), col("id").as("nid")),
        Seq("source", "n_rn"))
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"), col("nid"))
      .localCheckpoint()

    // ---- chunk picks: selector windows on the batch-restricted table ----
    val slotMeta = slots.map { case (draw, _, _, name) =>
      val r = byName(name)
      val (am, aa) = selectorDesc(r.anchor)
      val (pm, pa) = selectorDesc(r.positive)
      val (nm, na) = selectorDesc(r.negativeSelector)
      (draw, am, aa, pm, pa, nm, na, r.allowSameAnchorPositive)
    }.toDF("draw", "a_mode", "a_arg", "p_mode", "p_arg", "n_mode", "n_arg", "allow_same")
    val ids = slotRec.select(col("record_id")).union(negRec.select(col("nid"))).distinct()
    val chunksR = chunks.join(broadcast(ids), Seq("record_id")).localCheckpoint()
    def pickFor(slot: String, modeCol: String, argCol: String, recs: DataFrame) =
      Recipes.selectChunksBatch(chunksR,
          slotMeta.select(col("draw"), col(modeCol).as("mode"), col(argCol).as("arg")), slot)
        .join(recs, Seq("draw", "record_id"))
        .select(col("draw"), col("record_id"),
          col("window_index").cast("long").as(s"${slot}_widx"),
          Determinism.portableHash(col("wtext")).as(s"${slot}_hash"))
    val aRecs = slotRec.select(col("draw"), col("record_id"))
    val nRecs = negRec.select(col("draw"), col("nid").as("record_id"))
    val aPick = pickFor("a", "a_mode", "a_arg", aRecs)
    val pPick = pickFor("p", "p_mode", "p_arg", aRecs)
    val nPick = pickFor("n", "n_mode", "n_arg", nRecs)
      .withColumnRenamed("record_id", "nid")

    val core = negRec
      .join(aPick, Seq("draw", "record_id"))
      .join(pPick, Seq("draw", "record_id"))
      .join(nPick, Seq("draw", "nid"))
      .join(broadcast(slotMeta.select(col("draw"), col("allow_same"))), Seq("draw"))
      .select(col("draw"), col("epoch"), col("recipe"), col("record_id"),
        col("a_widx"), col("a_hash"), col("p_widx"), col("p_hash"),
        col("nid"), col("n_hash"), col("allow_same"))
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
      .updated("draw", drawBase + batch).updated("cursor", cur))
    SamplerBatch(core.drop("allow_same"), rows, st2)
  }
}
