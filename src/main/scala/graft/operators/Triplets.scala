package graft.operators

import graft.core.{Determinism, Splits, SplitRatios}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic triplet/pair/text sampling — the reference's flagship
  * capability (reference: src/sampler/mod.rs:125-156, 2460-2626) re-thought
  * for distributed execution.
  *
  * The reference walks mutable cursors through a single-process record pool
  * (sequential phase 1/3, rayon phase 2). Here every choice is a pure
  * function of `(seed, stable id)` so the whole batch is ONE declarative
  * plan:
  *
  *   - anchor section  = head tokens of the document (role=Anchor);
  *     positive        = hash-picked sliding window of the context section
  *     (same record — the reference's same-record A/P draw,
  *     src/sampler/mod.rs:1162-1211);
  *   - negative (WrongArticle, src/sampler/mod.rs:994-1053) = a different
  *     record of the SAME source and SAME split. Selection is a rank-pick:
  *     candidates get a per-(source,split) dense rank by seeded hash
  *     (`row_number` window), the anchor picks `hash(neg:id) mod (gs-1)`
  *     with a +1 skip over its own rank, and a single equi-join on
  *     (source, split, rank) fetches it. That is O(n) with one shuffle —
  *     NOT an O(n²) theta-join — and survives 100 TB; split isolation is
  *     structural (join key includes split);
  *   - 50% anchor/positive swap kills positional shortcuts
  *     (reference: src/sampler/mod.rs:1329-1405): seeded coin per anchor;
  *   - identical-text rejection (src/sampler/mod.rs:1372-1387);
  *   - weight = recipe_weight × mean(anchor_w, positive_w, negative_w),
  *     window weight `max(floor, 1/(idx+1))` (src/sampler/mod.rs:106-122),
  *     emitted at exact e6 integer scale.
  *
  * Every step has a DuckDB mirror (duckTripletCtes) so the oracle replays
  * the full pipeline.
  */
case class TripletConfig(
    seed: String = "42",
    windowTokens: Int = 32,
    overlap: Int = 8,
    anchorTokens: Int = 8,
    minTokens: Int = 12,
    ratios: SplitRatios = SplitRatios.Default,
    recipeName: String = "role_anchor_context_wrong_article",
    /** Recipe's static instruction, copied verbatim onto every sample
      * (reference: src/config.rs:170, src/sampler/mod.rs:1403). */
    instruction: Option[String] = None) {
  def stride: Int = math.max(windowTokens - overlap, 1)
}

object Triplets {

  /** End-to-end bridge from typed source records
    * ([[graft.core.DataRecord]], i.e. anything CsvSource / FileSource /
    * HfSourceList / InMemorySource produced) into the sampler: the first
    * Anchor-role section is the anchor text, the first Context-role
    * section the chunkable body — the record's own section boundary is
    * preserved (no re-splitting). String ids hash identically to numeric
    * ones (`seeded` casts to string). */
  def recordTriplets(records: org.apache.spark.sql.Dataset[graft.core.DataRecord],
      cfg: TripletConfig): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val corpus = records.flatMap { r =>
      for {
        a <- r.sections.find(_.role == graft.core.SectionRole.Anchor)
        c <- r.sections.find(_.role == graft.core.SectionRole.Context)
      } yield (r.id, r.source, a.text, c.text)
    }.toDF("doc_id", "source", "atext", "ctext")
    val prepared = prepareSections(corpus, cfg)
    projectRows(finish(joinWrongArticle(prepared, cfg.seed), cfg), lit(cfg.recipeName))
  }

  /** Prep from explicit anchor/context texts: split label, normalized
    * anchor, context tokens, window count `k` per the chunker layout. */
  def prepareSections(corpus: DataFrame, cfg: TripletConfig): DataFrame =
    corpus.select(col("doc_id"), col("source"),
        Splits.splitCol(col("doc_id"), cfg.seed, cfg.ratios).as("split"),
        TextFunctions.normalizeWs(col("atext")).as("atext"),
        TextFunctions.tokens(col("ctext")).as("ctoks"))
      .withColumn("cn", size(col("ctoks")))
      .filter(length(col("atext")) > 0 && col("cn") > 0)
      .withColumn("span", least(lit(cfg.windowTokens), col("cn")))
      .withColumn("k", when(col("cn") <= cfg.windowTokens, lit(1))
        .otherwise(floor((col("cn") - col("span") + lit(cfg.stride - 1)) / lit(cfg.stride)).cast("int") + 1))

  /** Record prep from a single text column: head tokens become the anchor
    * section, the rest the context (the table-corpus path). */
  def prepare(docs: DataFrame, cfg: TripletConfig): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs.select(col("doc_id"), col("source"),
        Splits.splitCol(col("doc_id"), cfg.seed, cfg.ratios).as("split"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= cfg.minTokens)
      .withColumn("atoks", expr(s"slice(toks, 1, ${cfg.anchorTokens})"))
      .withColumn("ctoks", expr(s"slice(toks, ${cfg.anchorTokens + 1}, n - ${cfg.anchorTokens})"))
      .withColumn("atext", array_join(col("atoks"), " "))
      .withColumn("cn", size(col("ctoks")))
      // a record whose context (answer/body) is empty can serve as neither
      // positive nor negative — it never enters the pool (only reachable
      // when anchorTokens >= minTokens; also keeps the DuckDB mirror exact:
      // list_slice out of range is NULL there, empty array here)
      .filter(col("cn") > 0)
      .withColumn("span", least(lit(cfg.windowTokens), col("cn")))
      .withColumn("k", when(col("cn") <= cfg.windowTokens, lit(1))
        .otherwise(floor((col("cn") - col("span") + lit(cfg.stride - 1)) / lit(cfg.stride)).cast("int") + 1))
      .drop("toks", "atoks", "n")
  }

  /** Seeded rank + pool size within (source, split) — the shared pool
    * shape every negative lane picks from. */
  private def rankBySourceSplit(prepared: DataFrame, seed: String): DataFrame =
    prepared
      .withColumn("rnk", row_number().over(Window.partitionBy(col("source"), col("split"))
        .orderBy(Determinism.seeded(s"ord:$seed", col("doc_id")), col("doc_id"))).cast("long") - 1)
      .withColumn("gs", count(lit(1)).over(
        Window.partitionBy(col("source"), col("split"))).cast("long"))

  /** Negative-candidate projection of a ranked pool. */
  private def negSide(ranked: DataFrame): DataFrame =
    ranked.select(col("doc_id").as("nid"), col("source").as("nsource"),
      col("split").as("nsplit"), col("ctoks").as("nctoks"), col("cn").as("ncn"),
      col("span").as("nspan"), col("k").as("nk"), col("rnk").as("nrnk"))

  /** Same-source same-split rank-pick: each anchor picks
    * `hash(neg:id) mod (gs-1)` with a +1 skip over its own rank; one
    * equi-join on (source, split, rank) fetches the negative. `anchors`
    * must be a subset of `ranked` (carries rnk/gs). */
  private def sameSourceJoin(ranked: DataFrame, anchors: DataFrame, seed: String): DataFrame = {
    val anch = anchors
      // greatest(..., 1) never changes a surviving row (anchors carry
      // gs >= 2) — it guards ANSI mode against Catalyst evaluating the
      // projection speculatively on rows a pushed-down filter will drop
      .withColumn("pick0", pmod(Determinism.seeded(s"neg:$seed", col("doc_id")),
        greatest(col("gs") - 1, lit(1L))))
      .withColumn("pick", when(col("pick0") >= col("rnk"), col("pick0") + 1).otherwise(col("pick0")))
      .select(col("doc_id").as("aid"), col("source"), col("split"), col("atext"),
        col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
        col("k").as("ak"), col("pick"))
    anch.join(negSide(ranked),
      col("source") === col("nsource") && col("split") === col("nsplit") &&
        col("nrnk") === col("pick"))
  }

  /** Cross-source same-split pick, two-level (split→source→record): the
    * anchor hash-picks a source rank (excluding its own source), then a
    * record rank inside that source's (source, split) pool. Ranks live at
    * source cardinality (broadcast-sized) and inside single-source pools —
    * no record-grained window keyed only by `split`, which would collapse
    * the corpus into #splits partitions at scale. */
  private def crossSourceJoin(ranked: DataFrame, anchors: DataFrame, seed: String): DataFrame = {
    val srcs = ranked.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).cast("long").as("ccnt"))
      .withColumn("srnk", row_number().over(Window.partitionBy(col("split"))
        .orderBy(Determinism.seeded(s"fsord:$seed", col("source")), col("source"))).cast("long") - 1)
      .withColumn("scnt", count(lit(1)).over(Window.partitionBy(col("split"))).cast("long"))
    val anch = anchors
      .join(broadcast(srcs.select(col("split"), col("source"), col("srnk"), col("scnt"))),
        Seq("split", "source"))
      .filter(col("scnt") >= 2)
      .withColumn("spick0", pmod(Determinism.seeded(s"fsrc:$seed", col("doc_id")),
        greatest(col("scnt") - 1, lit(1L))))
      .withColumn("spick", when(col("spick0") >= col("srnk"), col("spick0") + 1).otherwise(col("spick0")))
      .select(col("doc_id").as("aid"), col("source"), col("split"), col("atext"),
        col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
        col("k").as("ak"), col("spick"))
    val tgt = srcs.select(col("split").as("tsplit"), col("source").as("tsource"),
      col("srnk").as("tsrnk"), col("ccnt").as("tccnt"))
    anch.join(broadcast(tgt), col("split") === col("tsplit") && col("tsrnk") === col("spick"))
      .withColumn("rpick", pmod(Determinism.seeded(s"frec:$seed", col("aid")), col("tccnt")))
      .join(negSide(ranked),
        col("split") === col("nsplit") && col("tsource") === col("nsource") &&
          col("nrnk") === col("rpick"))
  }

  /** WrongArticle rank-pick join over a prepared pool. */
  private def joinWrongArticle(prepared: DataFrame, seed: String): DataFrame = {
    val ranked = rankBySourceSplit(prepared, seed).cache()
    sameSourceJoin(ranked, ranked.filter(col("gs") >= 2), seed)
  }

  /** Standard triplet-row projection with swap applied; `extra` columns
    * (e.g. a lane marker) are carried through verbatim. */
  private def projectRows(df: DataFrame, recipe: Column, extra: Seq[String] = Nil): DataFrame =
    df.select(Seq(
      col("aid"), col("nid"), col("split"), recipe.as("recipe"),
      when(col("swapped"), Determinism.portableHash(col("ptext")))
        .otherwise(Determinism.portableHash(col("atext"))).as("a_hash"),
      when(col("swapped"), Determinism.portableHash(col("atext")))
        .otherwise(Determinism.portableHash(col("ptext"))).as("p_hash"),
      Determinism.portableHash(col("ntext")).as("n_hash"),
      col("swapped"), col("pidx"), col("nidx"), col("weight_e6")) ++ extra.map(col): _*)

  /** Full triplet table (pre-projection; carries texts for downstream).
    * The ranked pool inside [[joinWrongArticle]] is materialized once —
    * the distributed analogue of the reference's synced record pool. */
  def triplets(docs: DataFrame, cfg: TripletConfig): DataFrame =
    finish(joinWrongArticle(prepare(docs, cfg), cfg.seed), cfg)

  /** Chunk picks, swap, weights, and rejection — shared by every negative
    * strategy; expects the anchor↔negative joined shape. */
  private def finish(joined: DataFrame, cfg: TripletConfig): DataFrame = {
    val st = cfg.stride
    joined
      .withColumn("pidx", pmod(Determinism.seeded(s"pos:${cfg.seed}", col("aid")), col("ak")))
      .withColumn("nidx", pmod(Determinism.seeded(s"negc:${cfg.seed}",
        concat(col("aid").cast("string"), lit(":"), col("nid").cast("string"))), col("nk")))
      .withColumn("ptext", array_join(
        expr(s"slice(actoks, pidx * $st + 1, least(aspan, acn - pidx * $st))"), " "))
      .withColumn("ntext", array_join(
        expr(s"slice(nctoks, nidx * $st + 1, least(nspan, ncn - nidx * $st))"), " "))
      .withColumn("swapped", pmod(Determinism.seeded(s"swap:${cfg.seed}", col("aid")), lit(2)) === 0)
      .withColumn("pw_e6", greatest(lit(100000L), floor(lit(1000000) / (col("pidx") + 1)).cast("long")))
      .withColumn("nw_e6", greatest(lit(100000L), floor(lit(1000000) / (col("nidx") + 1)).cast("long")))
      .withColumn("weight_e6",
        floor((lit(1000000L) + col("pw_e6") + col("nw_e6")) / lit(3.0)).cast("long"))
      .filter(col("atext") =!= col("ptext") &&
        col("ntext") =!= col("atext") && col("ntext") =!= col("ptext"))
  }

  /** Projected triplet rows with swap applied; text carried as portable
    * content hashes (the texts themselves stay available upstream). An
    * `instruction` column is appended when the recipe configures one. */
  def tripletRows(docs: DataFrame, cfg: TripletConfig): DataFrame = {
    val base = projectRows(triplets(docs, cfg), lit(cfg.recipeName))
    cfg.instruction.fold(base)(i => base.withColumn("instruction", lit(i)))
  }

  /** Weighted-mixing triplet batch — the reference's
    * `next_triplet_batch_with_weights` (reference: src/sampler/mod.rs
    * batch entry points 125-156; per-source weights README "Weighted
    * Sampling"): `batch` slots are allocated across sources by exact
    * largest-remainder ([[Mixing.weightedAllocation]] — the deterministic
    * counterpart of the reference's smooth weighted round-robin drain),
    * each source contributes its first `alloc` anchors in seeded rank
    * order, and the WrongArticle pipeline runs on exactly that anchor set.
    * Sources absent from `weights` simply get no slots; a source whose
    * pool is smaller than its allocation contributes its whole pool (the
    * reference retries/refreshes there — exhaustion is the caller-side
    * [[Exhaustion.withRetry]] loop).
    *
    * Scale shape: the allocation table is #sources rows (broadcast); the
    * anchor cut is one per-source keyed window over the pool. */
  def tripletRowsWeighted(docs: DataFrame, cfg: TripletConfig, weights: DataFrame,
      batch: Long, split: String, recipeName: String): DataFrame = {
    val ranked = rankBySourceSplit(prepare(docs, cfg), cfg.seed)
      .filter(col("split") === split).cache()
    val alloc = Mixing.weightedAllocation(weights, batch)
    val anchors = ranked.filter(col("gs") >= 2)
      .withColumn("arank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(Determinism.seeded(s"wmix:${cfg.seed}", col("doc_id")), col("doc_id"))).cast("long") - 1)
      .join(broadcast(alloc.select(col("group").as("source"), col("alloc"))), Seq("source"))
      .filter(col("arank") < col("alloc"))
    projectRows(finish(sameSourceJoin(ranked, anchors, cfg.seed), cfg), lit(recipeName))
  }

  /** DuckDB mirror of [[tripletRowsWeighted]]; `weightSql` must compute
    * the integer weight from a `source` column (the same derivation the
    * Spark caller feeds in as the weights table). */
  def duckWeightedSql(cfg: TripletConfig, weightSql: String, batch: Long,
      split: String, recipeName: String): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""${duckPoolCtes(cfg)}, grp AS (
        -- weights derive from the corpus' source set (the caller-side
        -- weights table), NOT the per-split pool: a source with no pool
        -- rows still consumes its slots on both engines
        SELECT source AS grp, CAST(($weightSql) AS BIGINT) AS w
        FROM (SELECT DISTINCT source FROM documents) s
      ), a0 AS (
        SELECT grp, w, CAST(sum(w) OVER () AS BIGINT) AS tw FROM grp
      ), a1 AS (
        SELECT *, ($batch * w) // tw AS flo, ($batch * w) % tw AS rem FROM a0
      ), a2 AS (
        SELECT *, CAST($batch - sum(flo) OVER () AS BIGINT) AS short,
          CAST(row_number() OVER (ORDER BY rem DESC, grp) AS BIGINT) AS rr
        FROM a1
      ), alc AS (
        SELECT grp, flo + CASE WHEN rr <= short THEN 1 ELSE 0 END AS alloc FROM a2
      ), anchw AS (
        SELECT a.*, CAST(row_number() OVER (PARTITION BY a.source
          ORDER BY ${h("wmix", "a.doc_id")}, a.doc_id) AS BIGINT) - 1 AS arank
        FROM anch a WHERE a.split = '$split'
      ), joinedW AS (
        SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
          a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
          n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
        FROM anchw a
        JOIN alc ON a.source = alc.grp
        JOIN ranked n ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
        WHERE a.arank < alc.alloc
      )${duckTailCtes(cfg, "joinedW", "_w")}
      ${duckProjectSql(s"'$recipeName'", "tripf_w")}"""
  }

  /** WrongArticle with `negativeSelector = RoleAnchor` — the 0.25-weight
    * lane every source's default recipe set carries (reference:
    * csv_source.rs:368-409 `csv_anchor_anchor_wrong_article`,
    * file_source.rs / huggingface_source.rs twins; selector contract
    * src/config.rs:201-215): the negative text is the negative RECORD's
    * anchor section, not one of its context windows. The anchor section is
    * a single chunk, so the negative's window index is structurally 0 and
    * its window weight 1.0 (e6 integer 1000000). Same pool, same rank-pick
    * seeds as the context-negative pipeline — only the negative-side
    * projection changes. */
  def tripletRowsNegAnchor(docs: DataFrame, cfg: TripletConfig, recipeName: String): DataFrame = {
    val st = cfg.stride
    val ranked = rankBySourceSplit(prepare(docs, cfg), cfg.seed).cache()
    val anch = ranked.filter(col("gs") >= 2)
      .withColumn("pick0", pmod(Determinism.seeded(s"neg:${cfg.seed}", col("doc_id")),
        greatest(col("gs") - 1, lit(1L))))
      .withColumn("pick", when(col("pick0") >= col("rnk"), col("pick0") + 1).otherwise(col("pick0")))
      .select(col("doc_id").as("aid"), col("source"), col("split"), col("atext"),
        col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
        col("k").as("ak"), col("pick"))
    val negA = ranked.select(col("doc_id").as("nid"), col("source").as("nsource"),
      col("split").as("nsplit"), col("atext").as("natext"), col("rnk").as("nrnk"))
    val joined = anch.join(negA,
        col("source") === col("nsource") && col("split") === col("nsplit") &&
          col("nrnk") === col("pick"))
      .withColumn("pidx", pmod(Determinism.seeded(s"pos:${cfg.seed}", col("aid")), col("ak")))
      .withColumn("nidx", lit(0L))
      .withColumn("ptext", array_join(
        expr(s"slice(actoks, pidx * $st + 1, least(aspan, acn - pidx * $st))"), " "))
      .withColumn("ntext", col("natext"))
      .withColumn("swapped", pmod(Determinism.seeded(s"swap:${cfg.seed}", col("aid")), lit(2)) === 0)
      .withColumn("pw_e6", greatest(lit(100000L), floor(lit(1000000) / (col("pidx") + 1)).cast("long")))
      .withColumn("weight_e6",
        floor((lit(1000000L) + col("pw_e6") + lit(1000000L)) / lit(3.0)).cast("long"))
      .filter(col("atext") =!= col("ptext") &&
        col("ntext") =!= col("atext") && col("ntext") =!= col("ptext"))
    projectRows(joined, lit(recipeName))
  }

  /** DuckDB mirror of [[tripletRowsNegAnchor]]. */
  def duckNegAnchorSql(cfg: TripletConfig, recipeName: String): String = {
    val st = cfg.stride
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    val dh = Determinism.duckHash _
    s"""${duckPoolCtes(cfg)}, joinedA AS (
        SELECT a.doc_id AS aid, a.split AS split, a.atext AS atext,
          a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
          n.doc_id AS nid, n.atext AS natext
        FROM anch a JOIN ranked n
          ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
      ), selA AS (
        SELECT *, ${h("pos", "aid")} % ak AS pidx FROM joinedA
      ), tripA AS (
        SELECT aid, nid, split, atext, pidx, natext AS ntext,
          array_to_string(list_slice(actoks, pidx * $st + 1, pidx * $st + LEAST(aspan, acn - pidx * $st)), ' ') AS ptext,
          (${h("swap", "aid")} % 2 = 0) AS swapped,
          GREATEST(100000, 1000000 // (pidx + 1)) AS pw_e6
        FROM selA
      )
      SELECT aid, nid, split, '$recipeName' AS recipe,
        CASE WHEN swapped THEN ${dh("ptext")} ELSE ${dh("atext")} END AS a_hash,
        CASE WHEN swapped THEN ${dh("atext")} ELSE ${dh("ptext")} END AS p_hash,
        ${dh("ntext")} AS n_hash,
        swapped, CAST(pidx AS BIGINT) AS pidx, CAST(0 AS BIGINT) AS nidx,
        CAST(floor((1000000 + pw_e6 + 1000000) / 3.0) AS BIGINT) AS weight_e6
      FROM tripA
      WHERE atext <> ptext AND ntext <> atext AND ntext <> ptext"""
  }

  /** Decorated triplet rows — the reference's decorate-in-build flow
    * (reference: src/sampler/mod.rs:1264-1300 decorates anchor+positive,
    * 1347-1365 decorates the negative, then swap and identical-text
    * rejection run on the DECORATED texts): all three chunks pass through
    * [[Decoration.decorateColumn]], the 50% swap picks between decorated
    * anchor/positive, and a second rejection filters decorated collisions.
    * Roll streams key on the pre-swap slot + record ids (`dec:a:<aid>`,
    * `dec:p:<aid>`, `dec:n:<aid>:<nid>`) — the stateless analogue of the
    * reference's triplet-local RNG. Narrow post-join work: decoration adds
    * zero shuffles to the base plan. */
  def tripletRowsDecorated(docs: DataFrame, cfg: TripletConfig,
      sampler: graft.functions.KvpPrefixSampler, recipeName: String): DataFrame = {
    val t = triplets(docs, cfg)
    def dec(slot: String, text: Column, key: Column) =
      Decoration.decorateColumn(sampler, concat(lit(s"dec:$slot:"), key),
        split(text, " "), cfg.windowTokens)
    t.withColumn("da", dec("a", col("atext"), col("aid").cast("string")))
      .withColumn("dp", dec("p", col("ptext"), col("aid").cast("string")))
      .withColumn("dn", dec("n", col("ntext"),
        concat(col("aid").cast("string"), lit(":"), col("nid").cast("string"))))
      .filter(col("da.text") =!= col("dp.text") &&
        col("dn.text") =!= col("da.text") && col("dn.text") =!= col("dp.text"))
      .select(
        col("aid"), col("nid"), col("split"), lit(recipeName).as("recipe"),
        when(col("swapped"), Determinism.portableHash(col("dp.text")))
          .otherwise(Determinism.portableHash(col("da.text"))).as("a_hash"),
        when(col("swapped"), Determinism.portableHash(col("da.text")))
          .otherwise(Determinism.portableHash(col("dp.text"))).as("p_hash"),
        Determinism.portableHash(col("dn.text")).as("n_hash"),
        when(col("swapped"), col("dp.decorated")).otherwise(col("da.decorated")).as("a_dec"),
        when(col("swapped"), col("da.decorated")).otherwise(col("dp.decorated")).as("p_dec"),
        col("dn.decorated").as("n_dec"),
        col("swapped"), col("weight_e6"))
  }

  /** DuckDB mirror of [[tripletRowsDecorated]]. */
  def duckDecoratedTripletSql(cfg: TripletConfig,
      sampler: graft.functions.KvpPrefixSampler, recipeName: String): String = {
    val dh = Determinism.duckHash _
    val W = cfg.windowTokens
    def pfx(slot: String, key: String) =
      Decoration.duckDecorateSql(sampler, s"'dec:$slot:' || $key")
    s"""${duckTripletCtes(cfg)}, d0 AS (
        SELECT *,
          (${pfx("a", "CAST(aid AS VARCHAR)")}) AS apfx,
          (${pfx("p", "CAST(aid AS VARCHAR)")}) AS ppfx,
          (${pfx("n", "CAST(aid AS VARCHAR) || ':' || CAST(nid AS VARCHAR)")}) AS npfx
        FROM tripf
      ), d1 AS (
        SELECT *,
          ${Decoration.duckDecoratedTextSql("apfx", "atext", W)} AS datext,
          ${Decoration.duckDecoratedTextSql("ppfx", "ptext", W)} AS dptext,
          ${Decoration.duckDecoratedTextSql("npfx", "ntext", W)} AS dntext
        FROM d0
      )
      SELECT aid, nid, split, '$recipeName' AS recipe,
        CASE WHEN swapped THEN ${dh("dptext")} ELSE ${dh("datext")} END AS a_hash,
        CASE WHEN swapped THEN ${dh("datext")} ELSE ${dh("dptext")} END AS p_hash,
        ${dh("dntext")} AS n_hash,
        CASE WHEN swapped THEN ppfx ELSE apfx END IS NOT NULL AS a_dec,
        CASE WHEN swapped THEN apfx ELSE ppfx END IS NOT NULL AS p_dec,
        npfx IS NOT NULL AS n_dec,
        swapped, weight_e6
      FROM d1
      WHERE datext <> dptext AND dntext <> datext AND dntext <> dptext"""
  }

  /** Pair derivation: each triplet yields a positive and a negative pair
    * (reference: src/sampler/mod.rs:2062-2101). `reason` carries the
    * negative strategy's label — `wrong_article`, `wrong_qa_pairing`
    * (QuestionAnswerMismatch, src/sampler/mod.rs:1109-1151: same
    * same-source same-split pool, QA semantics), etc. */
  def pairRows(docs: DataFrame, cfg: TripletConfig,
      reason: String = "wrong_article"): DataFrame = {
    val t = tripletRows(docs, cfg)
    val pos = t.select(col("aid"), col("nid"), col("split"), lit("positive").as("label"),
      col("a_hash").as("l_hash"), col("p_hash").as("r_hash"),
      lit(reason).as("reason"), col("weight_e6"))
    val neg = t.select(col("aid"), col("nid"), col("split"), lit("negative").as("label"),
      col("a_hash").as("l_hash"), col("n_hash").as("r_hash"),
      lit(reason).as("reason"), col("weight_e6"))
    pos.unionByName(neg)
  }

  /** Text samples: `draws` hash-picked context windows per record, deduped
    * by (record, window) keeping the earliest draw
    * (reference text path: src/sampler/mod.rs:2210-2364, dedup 3080-3089). */
  def textRows(docs: DataFrame, cfg: TripletConfig, draws: Int): DataFrame =
    textRowsRange(docs, cfg, 0, draws)

  /** Draw-range form: because draws are stateless counters, a run resumed
    * at draw `from` continues the exact uninterrupted sequence — this is
    * the restart-resume contract (see operators.SamplerState). */
  def textRowsRange(docs: DataFrame, cfg: TripletConfig, fromDraw: Long, untilDraw: Long): DataFrame = {
    val st = cfg.stride
    val drawn = prepare(docs, cfg)
      .withColumn("draw0", explode(sequence(lit(fromDraw), lit(untilDraw - 1))))
      .withColumn("draw", col("draw0").cast("long")).drop("draw0")
      .withColumn("widx", pmod(Determinism.seeded(s"txt:${cfg.seed}",
        concat(col("doc_id").cast("string"), lit(":"), col("draw").cast("string"))), col("k")))
    val dedup = drawn.groupBy(col("doc_id"), col("split"), col("widx"),
        col("ctoks"), col("cn"), col("span"))
      .agg(min(col("draw")).as("draw"))
    dedup
      .withColumn("wtext", array_join(
        expr(s"slice(ctoks, widx * $st + 1, least(span, cn - widx * $st))"), " "))
      .select(col("doc_id"), col("split"), col("draw"),
        col("widx").cast("long").as("widx"),
        Determinism.portableHash(col("wtext")).as("whash"),
        greatest(lit(100000L), floor(lit(1000000) / (col("widx") + 1)).cast("long")).as("weight_e6"))
  }

  /** BM25 hard negatives wired into the sampler — the reference's
    * `NegativeBackend::choose` (reference:
    * src/sampler/backends/bm25_backend.rs:131-172, trait contract
    * backends/mod.rs:37-102): each anchor queries its own (source, split)
    * candidate pool with its anchor-section tokens; the negative is the
    * stateless top-3 rotation pick over exact-integer BM25 scores
    * (rank = `hash(bmpick:aid) mod min(3, pool)`, mirroring
    * BM25_HARD_NEGATIVE_ROTATION_TOP_K); anchors whose query shares no
    * term with any candidate fall back to the deterministic-random
    * rank-pick. A `lane` column marks `bm25` vs `random_fallback`.
    *
    * Scale shape: tf/df/stats are per-(source, split) shuffled aggregates
    * over the already-tokenized context arrays (dl = cn, no re-scan); the
    * query↔tf join shuffles on (source, split, term) so the pair space is
    * in-pool term collisions, never a cross join; top-3 is a keyed window
    * on the anchor id. */
  def tripletRowsBm25(docs: DataFrame, cfg: TripletConfig, recipeName: String,
      anchorFilter: Column = lit(true)): DataFrame = {
    // anchors are a batch subset (the reference emits batch_size triplets
    // per call, never the full corpus); candidates/tf/df stay full-pool
    val ranked = rankBySourceSplit(prepare(docs, cfg), cfg.seed).cache()
    // carry dl (= cn, constant per doc) through the term aggregation so no
    // later join has to fetch it back from the pool
    val tf = ranked.select(col("source"), col("split"), col("doc_id"),
        col("cn").as("dl"), explode(col("ctoks")).as("term"))
      .groupBy(col("source"), col("split"), col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // per-pool stats have #pools rows — broadcast-sized at any corpus scale
    val stats = ranked.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cn")).as("sum_dl"))
    val qterms = ranked.filter(col("gs") >= 2 && anchorFilter)
      .select(col("doc_id").as("aid"), col("source"), col("split"),
        explode(array_distinct(TextFunctions.tokens(col("atext")))).as("term"))
    // Per-(candidate, term) partial weight idf·tfpart is anchor-independent:
    // fold df/dl/avgdl into the tf table FIRST (|tf| rows ≈ docs × distinct
    // terms/doc), so the anchor⋈candidate product — the only genuinely
    // quadratic stream — passes through a single join, not four. df is a
    // keyed window over tf (one row per (doc, term) ⇒ the per-term count IS
    // the document frequency) — no separate groupBy + re-join.
    val wterm = tf
      .withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("source"), col("split"), col("term"))).cast("long"))
      .join(broadcast(stats), Seq("source", "split"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("tfpart",
        (col("tf") * lit(Bm25.K1 + 1)) /
          (col("tf") + lit(Bm25.K1) * (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl"))))
      .select(col("source"), col("split"), col("term"), col("doc_id").as("cand"),
        floor(lit(1000000.0) * col("idf") * col("tfpart")).cast("long").as("term_e6"))
    val scored = qterms
      .join(wterm, Seq("source", "split", "term"))
      .filter(col("cand") =!= col("aid"))
      .groupBy(col("aid"), col("cand"))
      .agg(sum(col("term_e6")).as("score_e6"))
    val top3 = scored
      .withColumn("brnk", row_number().over(Window.partitionBy(col("aid"))
        .orderBy(col("score_e6").desc, col("cand"))).cast("long"))
      .filter(col("brnk") <= 3)
      .withColumn("c3", count(lit(1)).over(Window.partitionBy(col("aid"))).cast("long"))
    val picked = top3
      .filter(col("brnk") - 1 === pmod(Determinism.seeded(s"bmpick:${cfg.seed}", col("aid")), col("c3")))
      .select(col("aid").as("baid"), col("cand").as("bnid"))
      // one scoring subtree for the whole query: `picked` feeds the bm25
      // lane's join AND the fallback lane's anti-join, and Spark does no
      // cross-branch CSE — without this cut the anchor×candidate scored
      // stream (the expensive part) is recomputed once per lane.
      // localCheckpoint materializes the batch-sized (aid, nid) table once;
      // both lanes read the materialized leaf.
      .localCheckpoint()
    val anchSel = ranked.filter(col("gs") >= 2 && anchorFilter)
      .select(col("doc_id").as("aid"), col("source"), col("split"), col("atext"),
        col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
        col("k").as("ak"))
    val bm = finish(anchSel
        .join(picked, col("aid") === col("baid"))
        .join(negSide(ranked).drop("nrnk"), col("bnid") === col("nid") &&
          col("source") === col("nsource") && col("split") === col("nsplit")), cfg)
      .withColumn("lane", lit("bm25"))
    val fb = finish(sameSourceJoin(ranked,
        ranked.filter(col("gs") >= 2 && anchorFilter)
          .join(picked, col("doc_id") === col("baid"), "left_anti"), cfg.seed), cfg)
      .withColumn("lane", lit("random_fallback"))
    Seq(bm, fb)
      .map(d => projectRows(d.withColumn("recipe", lit(recipeName)), col("recipe"), Seq("lane")))
      .reduce(_.unionByName(_))
  }

  /** WrongPublicationDate negatives (reference: src/sampler/mod.rs:1054-1108):
    * same source+split, *different* publication date. Two-level rank-pick:
    * hash-pick a date group other than the anchor's, then hash-pick a
    * record inside it — three equi-joins, no theta join, split/date
    * isolation structural. `dateExpr` derives the date key from a document
    * row (the synthetic corpus has no real dates, so callers supply one). */
  def tripletsWrongDate(docs: DataFrame, cfg: TripletConfig, dateExpr: Column): DataFrame = {
    val p = prepare(docs, cfg)
    val withDate = docs.withColumn("pub_date", dateExpr.cast("string"))
      .select(col("doc_id").as("did"), col("pub_date"))
    val base = p.join(withDate, col("doc_id") === col("did")).drop("did").cache()
    val wDate = Window.partitionBy(col("source"), col("split"), col("pub_date"))
    val dates = base.select(col("source"), col("split"), col("pub_date")).distinct()
      .withColumn("drnk", row_number().over(Window.partitionBy(col("source"), col("split"))
        .orderBy(Determinism.seeded(s"dord:${cfg.seed}", col("pub_date")), col("pub_date"))).cast("long") - 1)
      .withColumn("dcnt", count(lit(1)).over(Window.partitionBy(col("source"), col("split"))).cast("long"))
    val cranked = base
      .withColumn("crnk", row_number().over(wDate
        .orderBy(Determinism.seeded(s"cord:${cfg.seed}", col("doc_id")), col("doc_id"))).cast("long") - 1)
      .withColumn("ccnt", count(lit(1)).over(wDate).cast("long"))
    val anch = base.join(dates, Seq("source", "split", "pub_date"))
      .filter(col("dcnt") >= 2)
      .withColumn("dpick0", pmod(Determinism.seeded(s"dpick:${cfg.seed}", col("doc_id")),
        greatest(col("dcnt") - 1, lit(1L))))
      .withColumn("dpick", when(col("dpick0") >= col("drnk"), col("dpick0") + 1).otherwise(col("dpick0")))
      .select(col("doc_id").as("aid"), col("source"), col("split"), col("atext"),
        col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
        col("k").as("ak"), col("dpick"))
    val tgt = dates.select(col("source").as("tsource"), col("split").as("tsplit"),
      col("pub_date").as("tdate"), col("drnk").as("tdrnk"))
    val withTarget = anch.join(tgt,
      col("source") === col("tsource") && col("split") === col("tsplit") &&
        col("tdrnk") === col("dpick"))
    // the record pick lands on the ANCHOR side before the final join: the
    // target group's size comes from a #groups-sized aggregate (== the
    // ccnt window), so `crnk === cpick` is a full equi-key. With the pick
    // as a cross-side pmod (ccnt on the right), the planner could only
    // equi-join on (source, split, date) — a per-date-group cartesian
    // whose row count is Σ|anch_g|·|cand_g| at any scale.
    val gsz = base.groupBy(col("source"), col("split"), col("pub_date"))
      .agg(count(lit(1)).cast("long").as("gccnt"))
    val withPick = withTarget
      .join(gsz.select(col("source"), col("split"), col("pub_date").as("tdate"),
        col("gccnt")), Seq("source", "split", "tdate"))
      .withColumn("cpick",
        pmod(Determinism.seeded(s"cpick:${cfg.seed}", col("aid")), col("gccnt")))
    val negSide = cranked.select(col("doc_id").as("nid"), col("source").as("nsource"),
      col("split").as("nsplit"), col("pub_date").as("ndate"),
      col("ctoks").as("nctoks"), col("cn").as("ncn"), col("span").as("nspan"),
      col("k").as("nk"), col("crnk"))
    val joined = withPick.join(negSide,
      col("source") === col("nsource") && col("split") === col("nsplit") &&
        col("tdate") === col("ndate") && col("crnk") === col("cpick"))
    finish(joined, cfg)
  }

  /** [[tripletsWrongDate]] projected as triplet rows. */
  def tripletRowsWrongDate(docs: DataFrame, cfg: TripletConfig, dateExpr: Column,
      recipeName: String): DataFrame =
    projectRows(tripletsWrongDate(docs, cfg, dateExpr), lit(recipeName))

  /** Cross-source same-split fallback lane: anchors whose (source, split)
    * pool is a singleton draw their negative from another source of the
    * same split via the two-level [[crossSourceJoin]] pick; the recipe
    * name gains the `_fallback_same_split` suffix
    * (reference: src/sampler/mod.rs:994-1053, 1391-1395). */
  def tripletRowsWithFallback(docs: DataFrame, cfg: TripletConfig): DataFrame = {
    val ranked = rankBySourceSplit(prepare(docs, cfg), cfg.seed).cache()
    val main = finish(sameSourceJoin(ranked, ranked.filter(col("gs") >= 2), cfg.seed), cfg)
      .withColumn("recipe", lit(cfg.recipeName))
    val fallback = finish(crossSourceJoin(ranked, ranked.filter(col("gs") < 2), cfg.seed), cfg)
      .withColumn("recipe", lit(cfg.recipeName + Recipes.FallbackSuffix))
    projectRows(main, col("recipe")).unionByName(projectRows(fallback, col("recipe")))
  }

  /** WrongArticle with the reference's date-preference staging
    * (reference: src/sampler/mod.rs:994-1053, 1391-1395): stage 1 draws
    * the negative among same-source same-split SAME-publication-date
    * candidates; anchors whose date pool is a singleton fall to stage 2
    * (same source, any date); anchors whose whole (source, split) pool is
    * a singleton take the cross-source same-split lane (recipe suffixed
    * `_fallback_same_split`). A `lane` column marks the stage each triplet
    * came from. All three lanes are rank-picks — keyed windows + equi-joins,
    * no theta join. */
  def tripletRowsDatePreferred(docs: DataFrame, cfg: TripletConfig, dateExpr: Column): DataFrame = {
    val withDate = docs.select(col("doc_id").as("did"), dateExpr.cast("string").as("pub_date"))
    val prepared = prepare(docs, cfg).join(withDate, col("doc_id") === col("did")).drop("did")
    val wD = Window.partitionBy(col("source"), col("split"), col("pub_date"))
    val ranked = rankBySourceSplit(prepared, cfg.seed)
      .withColumn("drnk", row_number().over(wD
        .orderBy(Determinism.seeded(s"dord2:${cfg.seed}", col("doc_id")), col("doc_id"))).cast("long") - 1)
      .withColumn("dgs", count(lit(1)).over(wD).cast("long"))
      .cache()
    val sameDate = {
      val anch = ranked.filter(col("dgs") >= 2)
        .withColumn("pick0", pmod(Determinism.seeded(s"dneg:${cfg.seed}", col("doc_id")),
          greatest(col("dgs") - 1, lit(1L))))
        .withColumn("pick", when(col("pick0") >= col("drnk"), col("pick0") + 1).otherwise(col("pick0")))
        .select(col("doc_id").as("aid"), col("source"), col("split"), col("pub_date"), col("atext"),
          col("ctoks").as("actoks"), col("cn").as("acn"), col("span").as("aspan"),
          col("k").as("ak"), col("pick"))
      val ns = ranked.select(col("doc_id").as("nid"), col("source").as("nsource"),
        col("split").as("nsplit"), col("pub_date").as("ndate"), col("ctoks").as("nctoks"),
        col("cn").as("ncn"), col("span").as("nspan"), col("k").as("nk"), col("drnk").as("ndrnk"))
      finish(anch.join(ns,
        col("source") === col("nsource") && col("split") === col("nsplit") &&
          col("pub_date") === col("ndate") && col("ndrnk") === col("pick")), cfg)
        .withColumn("lane", lit("same_date"))
        .withColumn("recipe", lit(cfg.recipeName))
    }
    val anyDate = finish(sameSourceJoin(ranked, ranked.filter(col("dgs") < 2 && col("gs") >= 2), cfg.seed), cfg)
      .withColumn("lane", lit("any_date"))
      .withColumn("recipe", lit(cfg.recipeName))
    val fallback = finish(crossSourceJoin(ranked, ranked.filter(col("gs") < 2), cfg.seed), cfg)
      .withColumn("lane", lit("fallback_same_split"))
      .withColumn("recipe", lit(cfg.recipeName + Recipes.FallbackSuffix))
    Seq(sameDate, anyDate, fallback)
      .map(d => projectRows(d, col("recipe"), Seq("lane")))
      .reduce(_.unionByName(_))
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Shared CTE prefix: corpus prep through the anchor rank-pick (`anch`). */
  def duckPoolCtes(cfg: TripletConfig): String = {
    val st = cfg.stride
    val W = cfg.windowTokens
    val at = cfg.anchorTokens
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""WITH recs AS (
      SELECT doc_id, source, ${Splits.duckSplitSql("doc_id", cfg.seed, cfg.ratios)} AS split,
        ${TextFunctions.duckTokens("text")} AS toks
      FROM documents
    ), prepared AS (
      SELECT doc_id, source, split,
        array_to_string(list_slice(toks, 1, $at), ' ') AS atext,
        list_slice(toks, ${at + 1}, len(toks)) AS ctoks,
        len(toks) - $at AS cn,
        LEAST($W, len(toks) - $at) AS span,
        CASE WHEN len(toks) - $at <= $W THEN 1
             ELSE CAST(floor((len(toks) - $at - LEAST($W, len(toks) - $at) + ${st - 1}) / $st.0) AS INT) + 1 END AS k
      FROM recs WHERE len(toks) >= ${cfg.minTokens} AND len(toks) > $at
    ), ranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY source, split ORDER BY ${h("ord", "doc_id")}, doc_id) AS BIGINT) - 1 AS rnk,
        CAST(count(*) OVER (PARTITION BY source, split) AS BIGINT) AS gs
      FROM prepared
    ), anch AS (
      SELECT *,
        CASE WHEN ${h("neg", "doc_id")} % (gs - 1) >= rnk
             THEN ${h("neg", "doc_id")} % (gs - 1) + 1
             ELSE ${h("neg", "doc_id")} % (gs - 1) END AS pick
      FROM ranked WHERE gs >= 2
    )"""
  }

  /** Full CTE chain computing the `tripf` relation in DuckDB. */
  def duckTripletCtes(cfg: TripletConfig): String = {
    val st = cfg.stride
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""${duckPoolCtes(cfg)}, joined AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch a JOIN ranked n
        ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
    ), sel AS (
      SELECT *,
        ${h("pos", "aid")} % ak AS pidx,
        ${h("negc", "CAST(aid AS VARCHAR) || ':' || CAST(nid AS VARCHAR)")} % nk AS nidx
      FROM joined
    ), trip AS (
      SELECT aid, nid, split, atext, pidx, nidx,
        array_to_string(list_slice(actoks, pidx * $st + 1, pidx * $st + LEAST(aspan, acn - pidx * $st)), ' ') AS ptext,
        array_to_string(list_slice(nctoks, nidx * $st + 1, nidx * $st + LEAST(nspan, ncn - nidx * $st)), ' ') AS ntext,
        (${h("swap", "aid")} % 2 = 0) AS swapped,
        GREATEST(100000, 1000000 // (pidx + 1)) AS pw_e6,
        GREATEST(100000, 1000000 // (nidx + 1)) AS nw_e6
      FROM sel
    ), tripf AS (
      SELECT *, CAST(floor((1000000 + pw_e6 + nw_e6) / 3.0) AS BIGINT) AS weight_e6
      FROM trip
      WHERE atext <> ptext AND ntext <> atext AND ntext <> ptext
    )"""
  }

  def duckTripletSql(cfg: TripletConfig): String = {
    val dh = Determinism.duckHash _
    s"""${duckTripletCtes(cfg)}
      SELECT aid, nid, split, '${cfg.recipeName}' AS recipe,
        CASE WHEN swapped THEN ${dh("ptext")} ELSE ${dh("atext")} END AS a_hash,
        CASE WHEN swapped THEN ${dh("atext")} ELSE ${dh("ptext")} END AS p_hash,
        ${dh("ntext")} AS n_hash,
        swapped, CAST(pidx AS BIGINT) AS pidx, CAST(nidx AS BIGINT) AS nidx, weight_e6
      FROM tripf"""
  }

  def duckPairSql(cfg: TripletConfig, reason: String = "wrong_article"): String = {
    val dh = Determinism.duckHash _
    s"""${duckTripletCtes(cfg)}, t AS (
        SELECT aid, nid, split,
          CASE WHEN swapped THEN ${dh("ptext")} ELSE ${dh("atext")} END AS a_hash,
          CASE WHEN swapped THEN ${dh("atext")} ELSE ${dh("ptext")} END AS p_hash,
          ${dh("ntext")} AS n_hash, weight_e6
        FROM tripf)
      SELECT aid, nid, split, 'positive' AS label, a_hash AS l_hash, p_hash AS r_hash,
        '$reason' AS reason, weight_e6 FROM t
      UNION ALL
      SELECT aid, nid, split, 'negative' AS label, a_hash AS l_hash, n_hash AS r_hash,
        '$reason' AS reason, weight_e6 FROM t"""
  }

  def duckTextSql(cfg: TripletConfig, draws: Int): String = {
    val st = cfg.stride
    s"""${duckTripletCtes(cfg)}, drawn AS (
        SELECT doc_id, split, ctoks, cn, span, k,
          unnest(generate_series(0, ${draws - 1})) AS draw
        FROM prepared
      ), picked AS (
        SELECT doc_id, split, ctoks, cn, span, CAST(draw AS BIGINT) AS draw,
          ${Determinism.duckSeeded(s"txt:${cfg.seed}", "CAST(doc_id AS VARCHAR) || ':' || CAST(draw AS VARCHAR)")} % k AS widx
        FROM drawn
      ), dd AS (
        SELECT doc_id, split, widx, ctoks, cn, span, CAST(min(draw) AS BIGINT) AS draw
        FROM picked GROUP BY doc_id, split, widx, ctoks, cn, span
      )
      SELECT doc_id, split, draw, CAST(widx AS BIGINT) AS widx,
        ${Determinism.duckHash(s"array_to_string(list_slice(ctoks, widx * $st + 1, widx * $st + LEAST(span, cn - widx * $st)), ' ')")} AS whash,
        GREATEST(100000, 1000000 // (widx + 1)) AS weight_e6
      FROM dd"""
  }

  // --- composable fragments for the strategy variants ---

  private def duckPreparedCtes(cfg: TripletConfig, where: String, dateExpr: Option[String]): String = {
    val st = cfg.stride
    val W = cfg.windowTokens
    val at = cfg.anchorTokens
    val dateIn = dateExpr.map(e => s", CAST(($e) AS VARCHAR) AS pub_date").getOrElse("")
    val dateOut = dateExpr.map(_ => ", pub_date").getOrElse("")
    s"""WITH recs AS (
      SELECT doc_id, source, ${Splits.duckSplitSql("doc_id", cfg.seed, cfg.ratios)} AS split,
        ${TextFunctions.duckTokens("text")} AS toks$dateIn
      FROM documents WHERE $where
    ), prepared AS (
      SELECT doc_id, source, split$dateOut,
        array_to_string(list_slice(toks, 1, $at), ' ') AS atext,
        list_slice(toks, ${at + 1}, len(toks)) AS ctoks,
        len(toks) - $at AS cn,
        LEAST($W, len(toks) - $at) AS span,
        CASE WHEN len(toks) - $at <= $W THEN 1
             ELSE CAST(floor((len(toks) - $at - LEAST($W, len(toks) - $at) + ${st - 1}) / $st.0) AS INT) + 1 END AS k
      FROM recs WHERE len(toks) >= ${cfg.minTokens} AND len(toks) > $at
    )"""
  }

  private def duckTailCtes(cfg: TripletConfig, joinedName: String, sfx: String): String = {
    val st = cfg.stride
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s""", sel$sfx AS (
      SELECT *,
        ${h("pos", "aid")} % ak AS pidx,
        ${h("negc", "CAST(aid AS VARCHAR) || ':' || CAST(nid AS VARCHAR)")} % nk AS nidx
      FROM $joinedName
    ), trip$sfx AS (
      SELECT aid, nid, split, atext, pidx, nidx,
        array_to_string(list_slice(actoks, pidx * $st + 1, pidx * $st + LEAST(aspan, acn - pidx * $st)), ' ') AS ptext,
        array_to_string(list_slice(nctoks, nidx * $st + 1, nidx * $st + LEAST(nspan, ncn - nidx * $st)), ' ') AS ntext,
        (${h("swap", "aid")} % 2 = 0) AS swapped,
        GREATEST(100000, 1000000 // (pidx + 1)) AS pw_e6,
        GREATEST(100000, 1000000 // (nidx + 1)) AS nw_e6
      FROM sel$sfx
    ), tripf$sfx AS (
      SELECT *, CAST(floor((1000000 + pw_e6 + nw_e6) / 3.0) AS BIGINT) AS weight_e6
      FROM trip$sfx
      WHERE atext <> ptext AND ntext <> atext AND ntext <> ptext
    )"""
  }

  private def duckProjectSql(recipeSql: String, tripfName: String, extraSql: String = ""): String = {
    val dh = Determinism.duckHash _
    s"""SELECT aid, nid, split, $recipeSql AS recipe,
        CASE WHEN swapped THEN ${dh("ptext")} ELSE ${dh("atext")} END AS a_hash,
        CASE WHEN swapped THEN ${dh("atext")} ELSE ${dh("ptext")} END AS p_hash,
        ${dh("ntext")} AS n_hash,
        swapped, CAST(pidx AS BIGINT) AS pidx, CAST(nidx AS BIGINT) AS nidx, weight_e6$extraSql
      FROM $tripfName"""
  }

  /** Mirror of [[crossSourceJoin]]: two-level split→source→record pick for
    * anchors satisfying `anchorWhere` (over alias `r`). Expects a `ranked`
    * CTE with rnk/gs; emits `srcs`, `anch_f`, `joined_f`. */
  private def duckCrossLaneCtes(cfg: TripletConfig, anchorWhere: String): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s""", srcs0 AS (
      SELECT split, source, CAST(count(*) AS BIGINT) AS ccnt FROM ranked GROUP BY split, source
    ), srcs AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY split ORDER BY ${h("fsord", "source")}, source) AS BIGINT) - 1 AS srnk,
        CAST(count(*) OVER (PARTITION BY split) AS BIGINT) AS scnt
      FROM srcs0
    ), anch_f AS (
      SELECT r.*, s.srnk, s.scnt,
        CASE WHEN ${h("fsrc", "r.doc_id")} % (s.scnt - 1) >= s.srnk
             THEN ${h("fsrc", "r.doc_id")} % (s.scnt - 1) + 1
             ELSE ${h("fsrc", "r.doc_id")} % (s.scnt - 1) END AS spick
      FROM ranked r JOIN srcs s ON r.split = s.split AND r.source = s.source
      WHERE $anchorWhere AND s.scnt >= 2
    ), joined_f AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch_f a
      JOIN srcs t ON t.split = a.split AND t.srnk = a.spick
      JOIN ranked n ON n.split = a.split AND n.source = t.source
        AND n.rnk = ${h("frec", "a.doc_id")} % t.ccnt
    )"""
  }

  /** Oracle for [[tripletsWrongDate]] projected as triplet rows. */
  def duckWrongDateSql(cfg: TripletConfig, dateExpr: String, recipeName: String): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""${duckPreparedCtes(cfg, "TRUE", Some(dateExpr))}, dates AS (
      SELECT source, split, pub_date,
        CAST(row_number() OVER (PARTITION BY source, split ORDER BY ${h("dord", "pub_date")}, pub_date) AS BIGINT) - 1 AS drnk,
        CAST(count(*) OVER (PARTITION BY source, split) AS BIGINT) AS dcnt
      FROM (SELECT DISTINCT source, split, pub_date FROM prepared)
    ), cranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY source, split, pub_date ORDER BY ${h("cord", "doc_id")}, doc_id) AS BIGINT) - 1 AS crnk,
        CAST(count(*) OVER (PARTITION BY source, split, pub_date) AS BIGINT) AS ccnt
      FROM prepared
    ), anch AS (
      SELECT p.*, d.drnk, d.dcnt,
        CASE WHEN ${h("dpick", "p.doc_id")} % (d.dcnt - 1) >= d.drnk
             THEN ${h("dpick", "p.doc_id")} % (d.dcnt - 1) + 1
             ELSE ${h("dpick", "p.doc_id")} % (d.dcnt - 1) END AS dpick
      FROM prepared p JOIN dates d
        ON p.source = d.source AND p.split = d.split AND p.pub_date = d.pub_date
      WHERE d.dcnt >= 2
    ), joined AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch a
      JOIN dates t ON a.source = t.source AND a.split = t.split AND t.drnk = a.dpick
      JOIN cranked n ON n.source = a.source AND n.split = a.split AND n.pub_date = t.pub_date
        AND n.crnk = ${h("cpick", "a.doc_id")} % n.ccnt
    )${duckTailCtes(cfg, "joined", "")}
    ${duckProjectSql(s"'$recipeName'", "tripf")}"""
  }

  /** Oracle for [[tripletRowsWithFallback]] over a filtered corpus. */
  def duckFallbackSql(cfg: TripletConfig, where: String): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""${duckPreparedCtes(cfg, where, None)}, ranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY source, split ORDER BY ${h("ord", "doc_id")}, doc_id) AS BIGINT) - 1 AS rnk,
        CAST(count(*) OVER (PARTITION BY source, split) AS BIGINT) AS gs
      FROM prepared
    ), anch_m AS (
      SELECT *,
        CASE WHEN ${h("neg", "doc_id")} % (gs - 1) >= rnk
             THEN ${h("neg", "doc_id")} % (gs - 1) + 1
             ELSE ${h("neg", "doc_id")} % (gs - 1) END AS pick
      FROM ranked WHERE gs >= 2
    ), joined_m AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch_m a JOIN ranked n
        ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
    )${duckTailCtes(cfg, "joined_m", "_m")}${duckCrossLaneCtes(cfg, "r.gs < 2")}${duckTailCtes(cfg, "joined_f", "_f")}
    ${duckProjectSql(s"'${cfg.recipeName}'", "tripf_m")}
    UNION ALL
    ${duckProjectSql(s"'${cfg.recipeName}${Recipes.FallbackSuffix}'", "tripf_f")}"""
  }

  /** Oracle for [[tripletRowsBm25]] over a filtered corpus. */
  def duckBm25Sql(cfg: TripletConfig, where: String, recipeName: String,
      anchorWhere: String = "TRUE"): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    val K1 = Bm25.K1; val B = Bm25.B
    s"""${duckPreparedCtes(cfg, where, None)}, ranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY source, split ORDER BY ${h("ord", "doc_id")}, doc_id) AS BIGINT) - 1 AS rnk,
        CAST(count(*) OVER (PARTITION BY source, split) AS BIGINT) AS gs
      FROM prepared
    ), tfq AS (
      SELECT source, split, doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT source, split, doc_id, unnest(ctoks) AS term FROM ranked) u
      GROUP BY source, split, doc_id, term
    ), stats AS (
      SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(cn) AS BIGINT) AS sum_dl
      FROM ranked GROUP BY source, split
    ), dfq AS (
      SELECT source, split, term, CAST(count(*) AS BIGINT) AS df
      FROM tfq GROUP BY source, split, term
    ), qt AS (
      SELECT doc_id AS aid, source, split,
        unnest(list_distinct(${TextFunctions.duckTokens("atext")})) AS term
      FROM ranked WHERE gs >= 2 AND ($anchorWhere)
    ), sc AS (
      SELECT q.aid, t.doc_id AS cand,
        CAST(floor(1000000.0 *
          ((s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
          ((t.tf * ${K1 + 1}) / (t.tf + $K1 * (${1 - B} + $B * r.cn / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
        ) AS BIGINT) AS term_e6
      FROM qt q
      JOIN tfq t ON t.source = q.source AND t.split = q.split AND t.term = q.term AND t.doc_id <> q.aid
      JOIN dfq d ON d.source = q.source AND d.split = q.split AND d.term = q.term
      JOIN ranked r ON r.doc_id = t.doc_id
      JOIN stats s ON s.source = q.source AND s.split = q.split
    ), agg AS (
      SELECT aid, cand, CAST(sum(term_e6) AS BIGINT) AS score_e6 FROM sc GROUP BY aid, cand
    ), top3 AS (
      SELECT * FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY aid ORDER BY score_e6 DESC, cand) AS BIGINT) AS brnk
        FROM agg) sub WHERE brnk <= 3
    ), top3c AS (
      SELECT *, CAST(count(*) OVER (PARTITION BY aid) AS BIGINT) AS c3 FROM top3
    ), picked AS (
      SELECT aid AS baid, cand AS bnid FROM top3c WHERE brnk - 1 = ${h("bmpick", "aid")} % c3
    ), joined_b AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM ranked a JOIN picked p ON a.doc_id = p.baid
      JOIN ranked n ON n.doc_id = p.bnid
    )${duckTailCtes(cfg, "joined_b", "_b")}, anch_r AS (
      SELECT *,
        CASE WHEN ${h("neg", "doc_id")} % (gs - 1) >= rnk
             THEN ${h("neg", "doc_id")} % (gs - 1) + 1
             ELSE ${h("neg", "doc_id")} % (gs - 1) END AS pick
      FROM ranked WHERE gs >= 2 AND ($anchorWhere)
        AND doc_id NOT IN (SELECT baid FROM picked)
    ), joined_r AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch_r a JOIN ranked n
        ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
    )${duckTailCtes(cfg, "joined_r", "_r")}
    ${duckProjectSql(s"'$recipeName'", "tripf_b", ", 'bm25' AS lane")}
    UNION ALL
    ${duckProjectSql(s"'$recipeName'", "tripf_r", ", 'random_fallback' AS lane")}"""
  }

  /** Oracle for [[tripletRowsDatePreferred]] over a filtered corpus. */
  def duckDatePreferredSql(cfg: TripletConfig, where: String, dateExpr: String): String = {
    val h = (p: String, e: String) => Determinism.duckSeeded(s"$p:${cfg.seed}", e)
    s"""${duckPreparedCtes(cfg, where, Some(dateExpr))}, ranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY source, split ORDER BY ${h("ord", "doc_id")}, doc_id) AS BIGINT) - 1 AS rnk,
        CAST(count(*) OVER (PARTITION BY source, split) AS BIGINT) AS gs,
        CAST(row_number() OVER (PARTITION BY source, split, pub_date ORDER BY ${h("dord2", "doc_id")}, doc_id) AS BIGINT) - 1 AS drnk,
        CAST(count(*) OVER (PARTITION BY source, split, pub_date) AS BIGINT) AS dgs
      FROM prepared
    ), anch_d AS (
      SELECT *,
        CASE WHEN ${h("dneg", "doc_id")} % (dgs - 1) >= drnk
             THEN ${h("dneg", "doc_id")} % (dgs - 1) + 1
             ELSE ${h("dneg", "doc_id")} % (dgs - 1) END AS pick
      FROM ranked WHERE dgs >= 2
    ), joined_d AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch_d a JOIN ranked n
        ON a.source = n.source AND a.split = n.split AND a.pub_date = n.pub_date
          AND n.drnk = a.pick
    )${duckTailCtes(cfg, "joined_d", "_d")}, anch_m AS (
      SELECT *,
        CASE WHEN ${h("neg", "doc_id")} % (gs - 1) >= rnk
             THEN ${h("neg", "doc_id")} % (gs - 1) + 1
             ELSE ${h("neg", "doc_id")} % (gs - 1) END AS pick
      FROM ranked WHERE dgs < 2 AND gs >= 2
    ), joined_m AS (
      SELECT a.doc_id AS aid, a.source AS source, a.split AS split, a.atext AS atext,
        a.ctoks AS actoks, a.cn AS acn, a.span AS aspan, a.k AS ak,
        n.doc_id AS nid, n.ctoks AS nctoks, n.cn AS ncn, n.span AS nspan, n.k AS nk
      FROM anch_m a JOIN ranked n
        ON a.source = n.source AND a.split = n.split AND n.rnk = a.pick
    )${duckTailCtes(cfg, "joined_m", "_m")}${duckCrossLaneCtes(cfg, "r.gs < 2")}${duckTailCtes(cfg, "joined_f", "_f")}
    ${duckProjectSql(s"'${cfg.recipeName}'", "tripf_d", ", 'same_date' AS lane")}
    UNION ALL
    ${duckProjectSql(s"'${cfg.recipeName}'", "tripf_m", ", 'any_date' AS lane")}
    UNION ALL
    ${duckProjectSql(s"'${cfg.recipeName}${Recipes.FallbackSuffix}'", "tripf_f", ", 'fallback_same_split' AS lane")}"""
  }
}
