package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.Tables
import graft.operators.{Bm25, Dedup, Pq, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ANN / embedding-similarity demonstrations over `embeddings` (64-dim
  * float vectors). See [[graft.operators.Similarity]].
  */
object SimilarityQueries extends QueryModule {

  private val Dim = 64
  // (the fixed 8-plane demo dial retired round 16; q26/q27 derive planes95)
  private val TopK = 5
  private val NQueries = 10
  private val IvfK = 8
  private val IvfProbe = 2
  // q95 near-dup edges: the plane count SCALES WITH CORPUS SIZE —
  // planes(n) = ceil(log2(ceil(n / TargetOcc95))), clamped to
  // [MinPlanes95, MaxPlanes95] — so expected bucket occupancy stays
  // ~TargetOcc95 and in-bucket candidate pairs grow ~n·TargetOcc95/2
  // (LINEAR in n) instead of n²/2^planes under any fixed plane count.
  // The formula is pure 64-bit integer arithmetic (ceil-div + bit
  // length) so the DuckDB twin lands on the identical count from the
  // identical n — no floating log2, whose 1-ulp engine differences
  // could flip a power-of-two boundary. MinPlanes95 keeps tiny corpora
  // on the historical 32-bucket dial; MaxPlanes95 exists only because
  // the oracle's bucket expression is unrolled per plane (the Spark
  // side takes any count) — 2^16 buckets carries the oracle-comparable
  // lane to ~4M vectors, and a 100-TB corpus raises the cap (or moves
  // to q152's IVF-cell bounding) without touching the plan shape.
  // Plane j's hyperplane is seeded independently of the total count
  // (Similarity.lshBucket "rp:<j>:<i>"), so a p-plane bucket ≡ the
  // MaxPlanes-plane bucket mod 2^p — the twin computes the full-width
  // bucket once and masks with a scalar-subquery plane count.
  // CosMin: an e6 cosine threshold tuned to the synthetic table's
  // similarity tail so multi-node clusters actually form — the
  // recall/cost dial a real corpus tunes the same way.
  private val TargetOcc95 = 16L
  private val MinPlanes95 = 5
  private val MaxPlanes95 = 16
  private[graft] def planes95(n: Long): Int =
    graft.core.ScaleDials.occupancyBits(n, TargetOcc95, MinPlanes95, MaxPlanes95)
  /** The twin's plane count — [[planes95]] as DuckDB integer SQL over
    * the live corpus count (core.ScaleDials — the one shared formula). */
  private def duckPlanes95(table: String): String =
    graft.core.ScaleDials.duckOccupancyBits(
      table, TargetOcc95, MinPlanes95, MaxPlanes95)
  private val CosMin = 350000L
  // q152 cell count SCALES WITH CORPUS SIZE: k(n) = 2^ceil(ceil_log2(n)/2)
  // ≈ √n (power-of-two), clamped to [8, 4096] — so cell size AND cell
  // count both grow ~√n, putting assignment (n·k dots) and in-cell pair
  // work (n·cellsize/2) at n^1.5 instead of the n² a fixed cell count
  // degenerates to (the 10× decade smoke caught exactly that: fixed k=8
  // meant 10× rows → ~100× in-cell pairs). Same FAISS-style √n dial real
  // IVF deployments use; pure integer bit arithmetic so the DuckDB twin
  // lands on the identical k from the identical n. The search-family
  // queries (q29/q65/q118/q122/q128) keep the fixed demo dial — their
  // pair work is query×probe-bounded, not corpus×corpus.
  private val MinCells152 = 8
  private val MaxCells152 = 4096
  private[graft] def cells152(n: Long): Int = {
    // occ=1 ⇒ the clamp-free inner value is ceil(log2(n))
    val bits = graft.core.ScaleDials.occupancyBits(n, 1L, 0, 64)
    math.min(MaxCells152, math.max(MinCells152, 1 << ((bits + 1) / 2)))
  }
  /** The twin's cell count — [[cells152]] as DuckDB integer SQL over the
    * live corpus count (same core.ScaleDials bit-length idiom). */
  private def duckCells152(table: String): String =
    s"""(SELECT LEAST($MaxCells152, GREATEST($MinCells152,
        1 << ((${graft.core.ScaleDials.duckOccupancyBits(table, 1L, 0, 64)} + 1) // 2))))"""
  // q118 product quantization: 64 dims → M=8 subspaces × 8 dims, Ks=8
  // codewords each — 8 small codes per vector (the ~32× compression dial;
  // production uses M=8..64, Ks=256 — same plans, bigger broadcast)
  private val PqM = 8
  private val PqKs = 8
  // q119 reciprocal-rank fusion: top-20 from each system, fuse to top-10
  private val RrfDepth = 20
  private val FuseK = 10
  private val RrfQueries = Seq(
    1 -> "spark join table scan",
    2 -> "hash agg window batch",
    3 -> "customer order line value")

  private def duckNorms =
    s"""norms AS (SELECT vec_id, ${Similarity.duckDotE3("embedding", "embedding", Dim)} AS nrm
        FROM embeddings)"""

  /** The residual IVF-PQ (FAISS IVFADC) search pipeline shared by q122
    * (the search itself) and q128 (its recall lane): coarse IVF cells
    * bound candidates; PQ codebooks are trained on and encode residuals
    * x − centroid(cell(x)); each (query, probed cell) scores through an
    * ADC table of the QUERY's residual against that cell. Residuals land
    * back on the float lattice (double subtraction of floats is exact,
    * the float cast IEEE-identical across engines), so every downstream
    * e3 distance stays an exact integer. The residual table is the
    * index-build pass — checkpointed here because the codebook's M
    * independent top-k plans and the encode pass would otherwise each
    * replay the assign join (in production it IS the persisted index).
    * Emits (qid, id, cell, adist, rank) for ALL ranks — callers cut at
    * their k. */
  private def residOf(a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
    zip_with(a.cast("array<double>"), c.cast("array<double>"),
      (x, y) => x - y).cast("array<float>")

  /** The IVFADC training derivation — coarse centroids, the residual PQ
    * codebook, and the per-vector codes carrying their coarse cell. ONE
    * definition serves both the staged build (ivfadcApprox's train
    * closure) and AnnIndexSpec's in-plan reference side, so the
    * index-backed == derived pin compares the persisted index against
    * this exact derivation rather than against its own round-trip. */
  private[queries] def ivfadcTrain(emb: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.DataFrame] = {
    val tcents = Similarity.ivfCentroids(emb, "vec_id", "embedding", IvfK)
      .localCheckpoint()
    // (vec_id, cell) — narrow; checkpointed because both the residual
    // build and the code table read it (the argmin plan is a corpus ×
    // centroids cross join that must not replay)
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", tcents)
      .localCheckpoint()
    val resid = emb.join(assign, "vec_id")
      .join(broadcast(tcents.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col("vec_id"), col("cell"),
        residOf(col("embedding"), col("cemb")).as("resid"))
      .localCheckpoint()
    val tcb = Pq.codebook(resid, "vec_id", "resid", Dim, PqM, PqKs)
      .localCheckpoint()
    val tcodes = Pq.encode(resid, "vec_id", "resid", Dim, PqM, tcb)
      .join(resid.select(col("vec_id").as("id"), col("cell")), "id")
    Seq(tcents, tcb, tcodes)
  }

  /** Load-or-build of the staged IVFADC index (cents, cb, codes) — the
    * train-once/search-many half of [[ivfadcApprox]], separated so
    * AnnIndexSpec can compare the loaded relations against
    * [[ivfadcTrain]]'s in-plan derivation. The tag carries every
    * training hyperparameter the persisted relations bake in — a
    * constant change re-stages instead of serving an index trained
    * under the old geometry. */
  private[queries] def ivfadcRelations(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[org.apache.spark.sql.DataFrame] =
    ComposedIndexQueries.annRelations(s, dir, s"ivfadc-$IvfK-$Dim-$PqM-$PqKs",
        Seq("cents", "cb", "codes")) {
      val Seq(tcents, tcb, tcodes) = ivfadcTrain(Tables.load(s, dir, "embeddings"))
      // cents/cb are broadcast-sized (K and M·Ks rows): one file each.
      // codes are corpus-scale: range-partitioned + sorted on id so a
      // restricted search (or a shard rebuild) prunes row groups.
      val nPart = math.max(8, s.sessionState.conf.numShufflePartitions)
      Seq(tcents.coalesce(1), tcb.coalesce(1),
        tcodes.repartitionByRange(nPart, col("id")).sortWithinPartitions("id"))
    }

  /** Load-or-build of the staged raw-embedding PQ index (cb, codes) —
    * the [[ivfadcRelations]] contract on the PQ-ADC lane; the tag
    * carries the PQ geometry. */
  private[queries] def pqRelations(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[org.apache.spark.sql.DataFrame] =
    ComposedIndexQueries.annRelations(s, dir, s"pq-$Dim-$PqM-$PqKs",
        Seq("cb", "codes")) {
      val emb = Tables.load(s, dir, "embeddings")
      // the 64-row codebook feeds BOTH the encode and the ADC tables —
      // checkpoint it so the M TakeOrdered picks run once
      val tcb = Pq.codebook(emb, "vec_id", "embedding", Dim, PqM, PqKs)
        .localCheckpoint()
      val tcodes = Pq.encode(emb, "vec_id", "embedding", Dim, PqM, tcb)
      val nPart = math.max(8, s.sessionState.conf.numShufflePartitions)
      Seq(tcb.coalesce(1),
        tcodes.repartitionByRange(nPart, col("id")).sortWithinPartitions("id"))
    }

  private def ivfadcApprox(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    // a warm session runs ONLY the query-side work below
    val Seq(cents, cb, codes) = ivfadcRelations(s, dir)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val probes = Similarity.ivfProbes(q, "qid", "qemb", cents, IvfProbe)
      .select(col("qid"), col("cell"))
    // per-(query, probed cell) ADC tables from the query's OWN residual
    val subN = Dim / PqM
    val qslices = (0 until PqM).map(j =>
      struct(lit(j.toLong).as("m"), slice(col("qres"), j * subN + 1, subN).as("semb")))
    val adc = probes.join(q, "qid")
      .join(broadcast(cents.select(col("cid").as("cell"), col("cemb"))), "cell")
      .select(col("qid"), col("cell"), residOf(col("qemb"), col("cemb")).as("qres"))
      .select(col("qid"), col("cell"), explode(array(qslices: _*)).as("sl"))
      .join(broadcast(cb), col("sl.m") === col("m"))
      .select(col("qid"), col("cell"), col("m"), col("code"),
        Pq.distE3(col("sl.semb"), col("cemb")).as("d"))
    val cand = codes
      .join(broadcast(probes), "cell")
      .filter(col("id") =!= col("qid"))
    val scored = cand.join(broadcast(adc), Seq("qid", "cell", "m", "code"))
      .groupBy(col("qid"), col("id"), col("cell"))
      .agg(sum(col("d")).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** DuckDB lock-step mirror of [[ivfadcApprox]]: cents/assign/probes,
    * the residual table, PQ CTEs over it, per-(query, cell) residual ADC
    * tables, and the ranked candidate scores (`ranked`). */
  private def duckIvfadcCtes: String = {
    val sub = Dim / PqM
    def dist(a: String, b: String) =
      s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
        s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
    s"""picked AS (
      SELECT vec_id, embedding, ${graft.core.Determinism.duckSeeded("ivf-cent", "vec_id")} AS sk
      FROM embeddings ORDER BY sk, vec_id LIMIT $IvfK
    ), cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY sk, vec_id) AS BIGINT) - 1 AS cid,
        embedding AS cemb
      FROM picked
    ), asg0 AS (
      SELECT e.vec_id, c.cid, ${dist("e.embedding", "c.cemb")} AS dist
      FROM embeddings e CROSS JOIN cents c
    ), asg AS MATERIALIZED (
      SELECT vec_id, cid AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM asg0) t WHERE rn = 1
    ), probes AS MATERIALIZED (
      SELECT qid, cid AS cell FROM (
        SELECT e.vec_id AS qid, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY ${dist("e.embedding", "c.cemb")}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < $NQueries) t
      WHERE rn <= $IvfProbe
    ), resid AS MATERIALIZED (
      SELECT e.vec_id,
        list_transform(generate_series(1, $Dim), i ->
          CAST(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE) AS FLOAT)) AS embedding
      FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
      JOIN cents c ON c.cid = a.cell
    ), ${Pq.duckPqCtes(Dim, PqM, PqKs, srcRel = "resid")},
    qres AS (
      SELECT p.qid, p.cell,
        list_transform(generate_series(1, $Dim), i ->
          CAST(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE) AS FLOAT)) AS qemb
      FROM probes p JOIN embeddings e ON e.vec_id = p.qid
      JOIN cents c ON c.cid = p.cell
    ), qd AS (
      SELECT r.qid, r.cell, cb.m, cb.code,
        ${Pq.duckDistE3(s"list_slice(r.qemb, cb.m * $sub + 1, cb.m * $sub + $sub)", "cb.cemb", sub)} AS d
      FROM qres r JOIN pq_cb cb ON true
    ), ad AS (
      SELECT q.qid, k.vec_id, a.cell, CAST(sum(q.d) AS BIGINT) AS adist
      FROM pq_codes k
      JOIN asg a ON a.vec_id = k.vec_id
      JOIN qd q ON k.m = q.m AND k.code = q.code AND q.cell = a.cell
      WHERE k.vec_id <> q.qid
      GROUP BY q.qid, k.vec_id, a.cell
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS BIGINT) AS rank
      FROM ad
    )"""
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q25_ann_bruteforce",
      (s, dir) => {
        // norms are columns BELOW the join so each side's norm is computed
        // once per vector, not once per pair
        val emb = Tables.load(s, dir, "embeddings")
          .withColumn("nrm", Similarity.normE3(col("embedding")))
        val q = emb.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("nrm").as("qnrm"))
        val joined = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            Similarity.cosE6(
              Similarity.dotE3(col("qemb"), col("embedding")),
              col("qnrm"), col("nrm")).as("cos_e6"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("vec_id"))
        joined.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < $NQueries),
        scored AS (
          SELECT qid, vec_id,
            ${Similarity.duckCosE6(
              Similarity.duckDotE3("qemb", "embedding", Dim),
              Similarity.duckDotE3("qemb", "qemb", Dim),
              Similarity.duckDotE3("embedding", "embedding", Dim))} AS cos_e6
          FROM embeddings CROSS JOIN q WHERE vec_id <> qid),
        ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT qid, vec_id, cos_e6, rank FROM ranked WHERE rank <= $TopK""")),

    QueryDef("q26_ann_lsh_buckets",
      // bucket assignment on the SAME occupancy-stable dial as q95: the
      // plane count derives from the live corpus size (planes95 — round
      // 16 retired the fixed 8-plane demo dial, under which the q27
      // same-bucket pair join degenerates to n²/256 at any corpus size)
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.lshBucketTable(
          s, emb, "vec_id", "embedding", Dim, planes95(emb.count()))
      },
      Some(s"""SELECT vec_id,
          ${Similarity.duckLshBucket("embedding", Dim, MaxPlanes95)}
            % (CAST(1 AS BIGINT) << ${duckPlanes95("embeddings")}) AS bucket
        FROM embeddings""")),

    QueryDef("q27_neardup_same_bucket",
      (s, dir) => {
        // materialize the (small) bucketed table once: both self-join sides
        // would otherwise re-evaluate the bucket plan. Plane count is
        // scale-derived (planes95) so in-bucket pairs stay ~n·occupancy
        val base = Tables.load(s, dir, "embeddings")
        val buckets = Similarity.lshBucketTable(
          s, base, "vec_id", "embedding", Dim, planes95(base.count()))
        val emb = base
          .select(col("vec_id"), col("embedding"),
            Similarity.normE3(col("embedding")).as("nrm"))
          .join(buckets, "vec_id")
          .cache()
        val l = emb.as("l"); val r = emb.as("r")
        l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
          .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
            Similarity.cosE6(
              Similarity.dotE3(col("l.embedding"), col("r.embedding")),
              col("l.nrm"), col("r.nrm")).as("cos_e6"))
      },
      Some(s"""WITH b AS (SELECT vec_id, embedding,
          ${Similarity.duckLshBucket("embedding", Dim, MaxPlanes95)}
            % (CAST(1 AS BIGINT) << ${duckPlanes95("embeddings")}) AS bucket,
          ${Similarity.duckDotE3("embedding", "embedding", Dim)} AS nrm
          FROM embeddings)
        SELECT l.vec_id AS a, r.vec_id AS b,
          ${Similarity.duckCosE6(Similarity.duckDotE3("l.embedding", "r.embedding", Dim), "l.nrm", "r.nrm")} AS cos_e6
        FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id""")),

    QueryDef("q29_ann_ivf_probe",
      // IVF-flat: hash-picked coarse codebook, exact-integer argmin cell
      // assignment, nprobe=2 probed cells per query, exact cosine only
      // within probed cells — the recall/cost dial of the scale path
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", IvfK)
        val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        val corpus = emb
          .withColumn("nrm", Similarity.normE3(col("embedding")))
          .join(assign, "vec_id")
        val probes = Similarity.ivfProbes(
          emb.filter(col("vec_id") < NQueries)
            .select(col("vec_id").as("qid"), col("embedding").as("qemb")),
          "qid", "qemb", cents, IvfProbe)
        val scored = corpus.join(probes, "cell")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("cell"),
            Similarity.cosE6(
              Similarity.dotE3(col("qemb"), col("embedding")),
              col("qnrm"), col("nrm")).as("cos_e6"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
      },
      Some {
        def dist(a: String, b: String) =
          s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
            s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
        s"""WITH picked AS (
          SELECT vec_id, embedding, ${graft.core.Determinism.duckSeeded("ivf-cent", "vec_id")} AS sk
          FROM embeddings ORDER BY sk, vec_id LIMIT $IvfK
        ), cents AS (
          SELECT CAST(row_number() OVER (ORDER BY sk, vec_id) AS BIGINT) - 1 AS cid,
            embedding AS cemb
          FROM picked
        ), asg0 AS (
          SELECT e.vec_id, c.cid, ${dist("e.embedding", "c.cemb")} AS dist
          FROM embeddings e CROSS JOIN cents c
        ), asg AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM asg0) t WHERE rn = 1
        ), probes AS (
          SELECT qid, cid AS cell FROM (
            SELECT e.vec_id AS qid, c.cid,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY ${dist("e.embedding", "c.cemb")}, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < $NQueries) t
          WHERE rn <= $IvfProbe
        ), scored AS (
          SELECT p.qid, a.vec_id, a.cell,
            ${Similarity.duckCosE6(
              Similarity.duckDotE3("qe.embedding", "e2.embedding", Dim),
              Similarity.duckDotE3("qe.embedding", "qe.embedding", Dim),
              Similarity.duckDotE3("e2.embedding", "e2.embedding", Dim))} AS cos_e6
          FROM probes p
          JOIN asg a ON a.cell = p.cell
          JOIN embeddings e2 ON e2.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid
        )
        SELECT qid, vec_id, cell, cos_e6, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, vec_id) AS BIGINT) AS rank
          FROM scored) t
        WHERE rank <= $TopK"""
      }),

    QueryDef("q65_ivf_lloyd_refine",
      // LLOYD refinement of the IVF codebook — the k-means step the
      // hash-picked bootstrap (q29) deliberately omitted: two exact
      // reassign+recompute rounds tighten the coarse cells while staying
      // bit-reproducible (integer sums, floor-div means, e3 lattice
      // round-trip through the float centroids). Emits the refined
      // codebook as (cid, dim index, mean at e3 scale, cell size).
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val c0 = Similarity.ivfCentroids(emb, "vec_id", "embedding", IvfK)
        val c1 = Similarity.lloydStep(emb, "vec_id", "embedding", c0)
          .select(col("cid"), col("cemb"))
        val c2 = Similarity.lloydStep(emb, "vec_id", "embedding", c1)
        c2.select(col("cid"), col("n").as("cell_size"),
            posexplode(col("cemb")).as(Seq("i0", "x")))
          .select(col("cid"), (col("i0") + 1).cast("long").as("i"),
            round(col("x").cast("double") * 1000).cast("long").as("m_e3"),
            col("cell_size"))
      },
      Some {
        def dist(a: String, b: String) =
          s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
            s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
        // centroid-as-e3-list distance: |e|² + |c|² − 2·Σ e3(e_i)·c_i
        def distCm(e: String, cm: String) =
          s"(${Similarity.duckDotE3(e, e, Dim)}" +
            s" + CAST(list_sum(list_transform($cm, v -> v * v)) AS BIGINT)" +
            s" - 2 * CAST(list_sum(list_transform(generate_series(1, $Dim), i -> " +
            s"CAST(round(CAST($e[i] AS DOUBLE) * 1000) AS BIGINT) * $cm[i])) AS BIGINT))"
        def meanCtes(asg: String, s1: String) =
          s"""x_$s1 AS (SELECT a.cell, e.vec_id FROM embeddings e JOIN $asg a ON e.vec_id = a.vec_id),
          el_$s1 AS (SELECT cell, vec_id, unnest(generate_series(1, $Dim)) AS i FROM x_$s1),
          $s1 AS (SELECT el.cell, el.i,
              CAST(floor(CAST(sum(CAST(round(CAST(e.embedding[el.i] AS DOUBLE) * 1000) AS BIGINT)) AS DOUBLE)
                / count(*)) AS BIGINT) AS m_e3,
              CAST(count(*) AS BIGINT) AS n
            FROM el_$s1 el JOIN embeddings e ON el.vec_id = e.vec_id
            GROUP BY el.cell, el.i)"""
        s"""WITH picked AS (
          SELECT vec_id, embedding, ${graft.core.Determinism.duckSeeded("ivf-cent", "vec_id")} AS sk
          FROM embeddings ORDER BY sk, vec_id LIMIT $IvfK
        ), cents AS (
          SELECT CAST(row_number() OVER (ORDER BY sk, vec_id) AS BIGINT) - 1 AS cid,
            embedding AS cemb
          FROM picked
        ), a1_0 AS (
          SELECT e.vec_id, c.cid, ${dist("e.embedding", "c.cemb")} AS dist
          FROM embeddings e CROSS JOIN cents c
        ), a1 AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM a1_0) t WHERE rn = 1
        ), ${meanCtes("a1", "s1")},
        c1 AS (SELECT cell AS cid, list(m_e3 ORDER BY i) AS cm FROM s1 GROUP BY cell),
        a2_0 AS (
          SELECT e.vec_id, c.cid, ${distCm("e.embedding", "c.cm")} AS dist
          FROM embeddings e CROSS JOIN c1 c
        ), a2 AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM a2_0) t WHERE rn = 1
        ), ${meanCtes("a2", "s2")}
        SELECT cell AS cid, i, m_e3, n AS cell_size FROM s2"""
      }),

    QueryDef("q152_semdedup",
      // SemDeDup (Abbas et al. 2023 by name — semantic dedup over
      // embedding space, the step web-scale pipelines run AFTER lexical
      // dedup): k-means-style cells bound the pair search (the IVF
      // assignment of q29 — pairwise cost ∝ in-cell collisions, never
      // n²), within-cell pairs above the cosine threshold are semantic
      // duplicates, and each duplicate NEIGHBORHOOD keeps its minimal
      // element under the (similarity-to-centroid ASC, id) order — the
      // paper keeps the LOW-centroid-similarity representative; the
      // neighborhood-minimal rule is its declarative (and exactly
      // replayable) form, the q27/q95 keep-earliest idiom under the
      // centrality order. All exact integers: e3-lattice dots, e6
      // cosines. Emits every vector's cell, centrality, semantic-dup
      // degree, and the kept flag.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        // cell count from the live corpus size (metadata-only count-star
        // against the parquet footers — refresh-time cost, not batch-path)
        val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
            cells152(emb.count()))
          .withColumn("cnrm", Similarity.normE3(col("cemb")))
        val e = emb
          .withColumn("nrm", Similarity.normE3(col("embedding")))
          .join(Similarity.ivfAssign(emb, "vec_id", "embedding",
            cents.select(col("cid"), col("cemb"))), "vec_id")
          .join(broadcast(cents.select(col("cid").as("cell"),
            col("cemb"), col("cnrm"))), "cell")
          .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"),
            Similarity.cosE6(Similarity.dotE3(col("embedding"), col("cemb")),
              col("nrm"), col("cnrm")).as("ccos_e6"))
          .cache()
        val l = e.as("l"); val r = e.as("r")
        val pairs = l.join(r,
            col("l.cell") === col("r.cell") && col("l.vec_id") < col("r.vec_id"))
          .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
            col("l.ccos_e6").as("ac"), col("r.ccos_e6").as("bc"),
            Similarity.cosE6(
              Similarity.dotE3(col("l.embedding"), col("r.embedding")),
              col("l.nrm"), col("r.nrm")).as("cos_e6"))
          .filter(col("cos_e6") >= CosMin)
        // loser of each duplicate pair = the GREATER (ccos, id); a vector
        // is dropped iff it loses at least one pair
        val losers = pairs.select(
            when(col("ac") < col("bc") ||
              (col("ac") === col("bc") && col("a") < col("b")), col("b"))
              .otherwise(col("a")).as("vec_id"))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("n_lost"))
        val degree = pairs.select(col("a").as("vec_id"))
          .unionByName(pairs.select(col("b").as("vec_id")))
          .groupBy(col("vec_id")).agg(count(lit(1)).cast("long").as("n_sem_dups"))
        e.select(col("vec_id"), col("cell"), col("ccos_e6"))
          .join(degree, Seq("vec_id"), "left")
          .join(losers, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"), col("ccos_e6"),
            coalesce(col("n_sem_dups"), lit(0L)).as("n_sem_dups"),
            (col("n_lost").isNull).cast("long").as("kept"))
      },
      Some {
        def dist(a: String, b: String) =
          s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
            s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
        // cell count derived from the live count (duckCells152), so the
        // seeded-rank pick filters on a rank, not a constant LIMIT
        s"""WITH cand AS (
          SELECT vec_id, embedding,
            ${graft.core.Determinism.duckSeeded("ivf-cent", "vec_id")} AS sk
          FROM embeddings
        ), picked AS (
          SELECT vec_id, embedding, sk FROM (
            SELECT *, row_number() OVER (ORDER BY sk, vec_id) AS crn FROM cand) t
          WHERE crn <= ${duckCells152("embeddings")}
        ), cents AS (
          SELECT CAST(row_number() OVER (ORDER BY sk, vec_id) AS BIGINT) - 1 AS cid,
            embedding AS cemb
          FROM picked
        ), asg0 AS (
          SELECT e.vec_id, c.cid, ${dist("e.embedding", "c.cemb")} AS dist
          FROM embeddings e CROSS JOIN cents c
        ), asg AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM asg0) t WHERE rn = 1
        ), ev AS MATERIALIZED (
          SELECT e.vec_id, a.cell, e.embedding,
            ${Similarity.duckDotE3("e.embedding", "e.embedding", Dim)} AS nrm,
            ${Similarity.duckCosE6(
              Similarity.duckDotE3("e.embedding", "c.cemb", Dim),
              Similarity.duckDotE3("e.embedding", "e.embedding", Dim),
              Similarity.duckDotE3("c.cemb", "c.cemb", Dim))} AS ccos_e6
          FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
            JOIN cents c ON c.cid = a.cell
        ), pairs AS (
          SELECT l.vec_id AS a, r.vec_id AS b, l.ccos_e6 AS ac, r.ccos_e6 AS bc,
            ${Similarity.duckCosE6(
              Similarity.duckDotE3("l.embedding", "r.embedding", Dim),
              "l.nrm", "r.nrm")} AS cos_e6
          FROM ev l JOIN ev r ON l.cell = r.cell AND l.vec_id < r.vec_id
        ), dup AS (SELECT * FROM pairs WHERE cos_e6 >= $CosMin),
        losers AS (
          SELECT CASE WHEN ac < bc OR (ac = bc AND a < b) THEN b ELSE a END AS vec_id,
            count(*) AS n_lost
          FROM dup GROUP BY 1
        ), degree AS (
          SELECT vec_id, CAST(count(*) AS BIGINT) AS n_sem_dups FROM (
            SELECT a AS vec_id FROM dup UNION ALL SELECT b FROM dup) GROUP BY 1
        )
        SELECT e.vec_id, e.cell, e.ccos_e6,
          COALESCE(d.n_sem_dups, 0) AS n_sem_dups,
          CAST(CASE WHEN l.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM ev e LEFT JOIN degree d ON d.vec_id = e.vec_id
        LEFT JOIN losers l ON l.vec_id = e.vec_id"""
      }),

    QueryDef("q95_embedding_dedup_clusters",
      // dedup RESOLUTION generalized across modalities: q27's same-bucket
      // cosine pairs (thresholded at CosMin) are the edge list, and the
      // same min-label connected components that resolve text near-dups
      // (q93) resolve embedding near-dups into clusters + a canonical
      // keep-list. cluster_id = min vec_id of the component; keep = 1 on
      // exactly the survivor, so `WHERE keep = 1` is the post-dedup
      // embedding corpus. Scale shape is q27's (bucketed self-join, no n²)
      // plus q93's (per-round keyed agg + join on longs).
      (s, dir) => {
        val base = Tables.load(s, dir, "embeddings")
        // plane count from the live corpus size (one metadata-only
        // count-star against the parquet footers — refresh-time cost,
        // not batch-path): occupancy-stable buckets are what keep the
        // candidate self-join linear at 100 TB
        val buckets = Similarity.lshBucketTable(
          s, base, "vec_id", "embedding", Dim, planes95(base.count()))
        val emb = base
          .select(col("vec_id"), col("embedding"),
            Similarity.normE3(col("embedding")).as("nrm"))
          .join(buckets, "vec_id")
          .cache()
        val l = emb.as("l"); val r = emb.as("r")
        val edges = l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
          .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
            Similarity.cosE6(
              Similarity.dotE3(col("l.embedding"), col("r.embedding")),
              col("l.nrm"), col("r.nrm")).as("cos_e6"))
          .filter(col("cos_e6") >= CosMin)
          .select(col("a"), col("b"))
        val cc = Dedup.connectedComponents(
          base.select(col("vec_id").as("id")), edges)
        val sizes = cc.groupBy(col("cluster").as("cid"))
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, cc("cluster") === sizes("cid"))
          .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
            when(col("id") === col("cluster"), 1L).otherwise(0L).as("keep"),
            col("cluster_size"))
      },
      Some(s"""WITH RECURSIVE b AS (SELECT vec_id, embedding,
          ${Similarity.duckLshBucket("embedding", Dim, MaxPlanes95)}
            % (CAST(1 AS BIGINT) << ${duckPlanes95("embeddings")}) AS bucket,
          ${Similarity.duckDotE3("embedding", "embedding", Dim)} AS nrm
          FROM embeddings),
        p AS (SELECT l.vec_id AS a, r.vec_id AS b
          FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
          WHERE ${Similarity.duckCosE6(Similarity.duckDotE3("l.embedding", "r.embedding", Dim), "l.nrm", "r.nrm")} >= $CosMin),
        edges AS (SELECT a AS u, b AS v FROM p UNION SELECT b AS u, a AS v FROM p),
        reach(u, v) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        cl AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
        SELECT vec_id, cluster_id,
          CAST(CASE WHEN vec_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS keep,
          CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM cl""")),

    QueryDef("q144_lsh_occupancy_audit",
      // the SCALE AUDIT for q95's bucketing, as an oracle-checkable row:
      // the occupancy distribution the planes95 dial exists to control.
      // One row — corpus size, the derived plane count, buckets actually
      // hit, the worst bucket's occupancy, and the candidate-pair total
      // Σ c·(c−1)/2 that the near-dup self-join will enumerate. This is
      // the number a 100-TB operator watches per refresh: cand_pairs
      // growing faster than ~n·TargetOcc means the dial (or the hash) is
      // mis-sized BEFORE the join runs, not after it blows up. The twin
      // replays the identical integer plane-count formula and bucketing,
      // so a drifted formula on either side lands on a different row.
      (s, dir) => {
        val base = Tables.load(s, dir, "embeddings")
        val n = base.count()
        val p = planes95(n)
        Similarity.lshBucketTable(s, base, "vec_id", "embedding", Dim, p)
          .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as("c"))
          .agg(
            count(lit(1)).cast("long").as("n_buckets"),
            max(col("c")).as("max_occupancy"),
            sum(expr("c * (c - 1) DIV 2")).cast("long").as("cand_pairs"))
          .withColumn("n_vectors", lit(n))
          .withColumn("planes", lit(p.toLong))
      },
      Some(s"""WITH b AS (SELECT vec_id,
          ${Similarity.duckLshBucket("embedding", Dim, MaxPlanes95)}
            % (CAST(1 AS BIGINT) << ${duckPlanes95("embeddings")}) AS bucket
          FROM embeddings),
        c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bucket)
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
          CAST(max(c) AS BIGINT) AS max_occupancy,
          CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs,
          (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vectors,
          CAST(${duckPlanes95("embeddings")} AS BIGINT) AS planes
        FROM c""")),

    QueryDef("q110_cluster_balanced_sample",
      // semantic diversification (the D4/SemDeDup-family selection step):
      // assign every embedding to its IVF cell (q29's exact-integer
      // argmin against the broadcast codebook), then draw an exact
      // largest-remainder stratified sample ACROSS cells (q48's
      // machinery) — every semantic cluster contributes within 1 of its
      // proportional share, so the sample can't collapse onto one dense
      // region. Pure composition of two verified operators; the only new
      // shuffle is the #cells-sized allocation broadcast.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", IvfK)
        val assign = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        graft.operators.Mixing.stratifiedSample(
            assign.select(col("vec_id").as("id"), col("cell").as("group")),
            120L, "cbal")
          .select(col("id").as("vec_id"), col("group").as("cell"), col("r"))
      },
      Some {
        def dist(a: String, b: String) =
          s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
            s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
        s"""WITH picked AS (
          SELECT vec_id, embedding, ${graft.core.Determinism.duckSeeded("ivf-cent", "vec_id")} AS sk
          FROM embeddings ORDER BY sk, vec_id LIMIT $IvfK
        ), cents AS (
          SELECT CAST(row_number() OVER (ORDER BY sk, vec_id) AS BIGINT) - 1 AS cid,
            embedding AS cemb
          FROM picked
        ), asg0 AS (
          SELECT e.vec_id, c.cid, ${dist("e.embedding", "c.cemb")} AS dist
          FROM embeddings e CROSS JOIN cents c
        ), asg AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM asg0) t WHERE rn = 1
        ), c AS (SELECT cell, count(*) AS n FROM asg GROUP BY cell),
        t AS (SELECT cell, n,
          (120 * n) // (sum(n) OVER ()) AS flo,
          (120 * n) % (sum(n) OVER ()) AS rem FROM c),
        r AS (SELECT *, 120 - sum(flo) OVER () AS short,
          CAST(row_number() OVER (ORDER BY rem DESC, cell) AS BIGINT) AS rr FROM t),
        a AS (SELECT cell, flo + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS alloc FROM r),
        rk AS (SELECT vec_id, cell,
          CAST(row_number() OVER (PARTITION BY cell
            ORDER BY ${graft.core.Determinism.duckSeeded("ss:cbal", "vec_id")}, vec_id) AS BIGINT) AS r
          FROM asg)
        SELECT rk.vec_id, rk.cell, rk.r
        FROM rk JOIN a ON rk.cell = a.cell WHERE rk.r <= a.alloc"""
      }),

    QueryDef("q118_pq_adc_search",
      // product quantization + asymmetric distance computation — the
      // memory-compression ANN path (IVF-PQ's PQ half): the corpus is
      // M=8 codes/vector, queries score by summing M broadcast
      // lookup-table entries, and the float corpus is never read at
      // query time. See [[graft.operators.Pq]].
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        // train-once/search-many (the q122 lifecycle on the raw-embedding
        // PQ): the codebook and the corpus codes persist per embeddings
        // generation; a warm search builds only the query-side ADC tables
        val Seq(cb, codes) = pqRelations(s, dir)
        val adc = Pq.adcTables(
          emb.filter(col("vec_id") < NQueries), "vec_id", "embedding",
          Dim, PqM, cb)
        val scored = Pq.adcScores(codes, adc)
          .filter(col("id") =!= col("qid"))
        val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
          .select(col("qid"), col("id").as("vec_id"), col("adist"), col("rank"))
      },
      Some {
        val sub = Dim / PqM
        s"""WITH ${Pq.duckPqCtes(Dim, PqM, PqKs)},
        qd AS (
          SELECT s.vec_id AS qid, c.m, c.code,
            ${Pq.duckDistE3("s.semb", "c.cemb", sub)} AS d
          FROM pq_sub s JOIN pq_cb c ON s.m = c.m
          WHERE s.vec_id < $NQueries
        ), ad AS (
          SELECT q.qid, k.vec_id, CAST(sum(q.d) AS BIGINT) AS adist
          FROM pq_codes k JOIN qd q ON k.m = q.m AND k.code = q.code
          WHERE k.vec_id <> q.qid
          GROUP BY q.qid, k.vec_id
        )
        SELECT qid, vec_id, adist, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS BIGINT) AS rank
          FROM ad) t
        WHERE rank <= $TopK"""
      }),

    QueryDef("q122_ivfadc_search",
      // the full production ANN shape (FAISS IVFADC search): coarse IVF
      // cells bound the candidate set (q29's probes); PQ codebooks are
      // TRAINED ON and ENCODE the residuals x − centroid(cell(x)) —
      // classic IVFADC semantics (Jégou et al. 2011) — and each query
      // scores a probed cell through an ADC table built from ITS residual
      // against that cell's centroid. The search touches |probed cells|
      // code rows and ZERO corpus floats. Exactness doctrine unchanged:
      // residuals round to the float lattice (double subtraction of
      // floats is exact; the float cast is IEEE-identical in both
      // engines) and every distance is an exact e3 integer. q128 scores
      // this pipeline's recall@k against the exact L2 truth.
      (s, dir) => ivfadcApprox(s, dir)
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("id").as("vec_id"), col("cell"),
          col("adist"), col("rank")),
      Some(s"""WITH $duckIvfadcCtes
        SELECT qid, vec_id, cell, adist, rank FROM ranked
        WHERE rank <= $TopK""")),

    QueryDef("q128_ivfadc_recall",
      // the number a real user tunes nprobe/M/Ks against: recall@k of the
      // residual IVFADC pipeline (q122) vs the EXACT e3 squared-L2 top-k
      // truth over the same corpus (self excluded). Both sides and the
      // intersection are exact integers, so the recall fractions
      // hash-match as e6-floored integers. Structure: the truth is the
      // q25-shape brute force (|Q| broadcast queries against one corpus
      // scan), the approx side is the shared ivfadcApprox pipeline, and
      // recall is one keyed count over their (qid, vec_id) intersection.
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .withColumn("nrm", Similarity.normE3(col("embedding")))
        val q = emb.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("nrm").as("qnrm"))
        val truth = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (col("qnrm") + col("nrm") -
              lit(2L) * Similarity.dotE3(col("qemb"), col("embedding"))).as("dist"))
          .withColumn("trank", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))).cast("long"))
          .filter(col("trank") <= TopK)
        val approx = ivfadcApprox(s, dir)
          .filter(col("rank") <= TopK)
          .select(col("qid"), col("id").as("vec_id"))
        val hits = approx.join(truth.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
          .groupBy(col("qid")).agg(count(lit(1)).cast("long").as("hits"))
        q.select(col("qid")).join(hits, Seq("qid"), "left")
          .select(col("qid"), lit(TopK.toLong).as("k"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            floor(lit(1000000L) * coalesce(col("hits"), lit(0L)) / lit(TopK.toLong))
              .cast("long").as("recall_e6"))
      },
      Some {
        def dist(a: String, b: String) =
          s"(${Similarity.duckDotE3(a, a, Dim)} + ${Similarity.duckDotE3(b, b, Dim)}" +
            s" - 2 * ${Similarity.duckDotE3(a, b, Dim)})"
        s"""WITH $duckIvfadcCtes,
        truth AS (
          SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${dist("q.embedding", "e.embedding")}, e.vec_id) AS trank
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < $NQueries) t
          WHERE trank <= $TopK
        ), approx AS (
          SELECT qid, vec_id FROM ranked WHERE rank <= $TopK
        ), h AS (
          SELECT a.qid, CAST(count(*) AS BIGINT) AS hits
          FROM approx a JOIN truth t ON t.qid = a.qid AND t.vec_id = a.vec_id
          GROUP BY a.qid
        )
        SELECT q.vec_id AS qid, CAST($TopK AS BIGINT) AS k,
          CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
          CAST(floor(1000000 * coalesce(h.hits, 0) / $TopK) AS BIGINT) AS recall_e6
        FROM embeddings q LEFT JOIN h ON h.qid = q.vec_id
        WHERE q.vec_id < $NQueries"""
      }),

    QueryDef("q119_rrf_hybrid_fusion",
      // hybrid retrieval for hard-negative mining: fuse the BM25 lexical
      // ranking (q50 machinery) with the dense cosine ranking (q25
      // machinery) by reciprocal-rank fusion (Cormack et al. 2009):
      // rrf = Σ_systems 1e9 div (60 + rank) — integer division, so the
      // fused scores are exact and the oracle reproduces them bit-for-bit.
      // Each system contributes its top-RrfDepth; docs found by both rank
      // first. The fusion itself adds ONE keyed sum over two
      // candidate-sized frames — at 100 TB the cost lives in the systems,
      // not the fusion.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val lex = Bm25.topK(
            Bm25.scores(s, docs, "doc_id", "text", RrfQueries), RrfDepth)
          .select(col("qid").cast("long").as("qid"), col("doc_id"),
            col("rank").as("r"))
        val emb = Tables.load(s, dir, "embeddings")
          .withColumn("nrm", Similarity.normE3(col("embedding")))
        val qids = RrfQueries.map(_._1.toLong)
        val q = emb.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("nrm").as("qnrm"))
        val dw = Window.partitionBy(col("qid"))
          .orderBy(col("cos_e6").desc, col("vec_id"))
        val dense = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            Similarity.cosE6(
              Similarity.dotE3(col("qemb"), col("embedding")),
              col("qnrm"), col("nrm")).as("cos_e6"))
          .withColumn("r", row_number().over(dw).cast("long"))
          .filter(col("r") <= RrfDepth)
          .select(col("qid"), col("vec_id").as("doc_id"), col("r"))
        val pts = expr("CAST(1000000000 div (60 + r) AS BIGINT)")
        val contrib = lex
          .select(col("qid"), col("doc_id"), pts.as("pts"),
            lit(1L).as("l"), lit(0L).as("d"))
          .unionByName(dense.select(col("qid"), col("doc_id"), pts.as("pts"),
            lit(0L).as("l"), lit(1L).as("d")))
        val fused = contrib.groupBy(col("qid"), col("doc_id"))
          .agg(sum(col("pts")).as("rrf_e9"),
            max(col("l")).as("in_lex"), max(col("d")).as("in_dense"))
        val fw = Window.partitionBy(col("qid"))
          .orderBy(col("rrf_e9").desc, col("doc_id"))
        fused.withColumn("rank", row_number().over(fw).cast("long"))
          .filter(col("rank") <= FuseK)
      },
      Some {
        val qidList = RrfQueries.map(_._1).mkString(", ")
        s"""${Bm25.duckScoresCtes(RrfQueries)},
        lexr AS (
          SELECT CAST(qid AS BIGINT) AS qid, doc_id,
            CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS r
          FROM agg
        ), lex AS (SELECT * FROM lexr WHERE r <= $RrfDepth),
        dq AS (SELECT vec_id AS qid, embedding AS qemb FROM embeddings
               WHERE vec_id IN ($qidList)),
        dsc AS (
          SELECT dq.qid, e.vec_id,
            ${Similarity.duckCosE6(
              Similarity.duckDotE3("dq.qemb", "e.embedding", Dim),
              Similarity.duckDotE3("dq.qemb", "dq.qemb", Dim),
              Similarity.duckDotE3("e.embedding", "e.embedding", Dim))} AS cos_e6
          FROM embeddings e CROSS JOIN dq WHERE e.vec_id <> dq.qid
        ), dr AS (
          SELECT qid, vec_id AS doc_id, r FROM (
            SELECT qid, vec_id,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, vec_id) AS BIGINT) AS r
            FROM dsc) t
          WHERE r <= $RrfDepth
        ), contrib AS (
          SELECT qid, doc_id, 1000000000 // (60 + r) AS pts, 1 AS l, 0 AS d FROM lex
          UNION ALL
          SELECT qid, doc_id, 1000000000 // (60 + r), 0, 1 FROM dr
        ), fused AS (
          SELECT qid, doc_id, CAST(sum(pts) AS BIGINT) AS rrf_e9,
            CAST(max(l) AS BIGINT) AS in_lex, CAST(max(d) AS BIGINT) AS in_dense
          FROM contrib GROUP BY qid, doc_id
        )
        SELECT qid, doc_id, rrf_e9, in_lex, in_dense, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_e9 DESC, doc_id) AS BIGINT) AS rank
          FROM fused) t
        WHERE rank <= $FuseK"""
      }),

    QueryDef("q138_margin_mining",
      // margin-based bitext mining (Artetxe & Schwenk 2019 — the
      // LASER/CCMatrix criterion that mined the parallel corpora behind
      // multilingual LLMs): split the embedding space into two "languages"
      // by label parity, score 24 source vectors against the full target
      // side, and keep a pair only when its cosine clears the RATIO margin
      // over the mean of both directions' k-NN neighborhoods —
      // margin(x,y) = cos(x,y) / ((avgF(x) + avgB(y)) / 2), one best y per
      // x, threshold 1.05. Everything stays on the exact integer lattice:
      // cosines are the house e6 floors and the margin is
      // (2k·cos_e6·1e6) div (fsum + bsum) with both operands filtered
      // positive, so trunc ≡ floor in both engines. Scale shape: the
      // query side broadcasts (24 rows), the backward pass broadcasts the
      // ≤ 24·k mined candidates onto the source language — the corpus
      // sides never shuffle; at 100 TB each direction is the q25
      // broadcast-scoring plan.
      (s, dir) => {
        val mineK = 4
        val emb = Tables.load(s, dir, "embeddings")
          .withColumn("nrm", Similarity.normE3(col("embedding")))
        val xs = emb.filter(pmod(col("label"), lit(2)) === 0)
          .select(col("vec_id").as("xid"), col("embedding").as("xemb"),
            col("nrm").as("xnrm"))
        val ys = emb.filter(pmod(col("label"), lit(2)) === 1)
          .select(col("vec_id").as("yid"), col("embedding").as("yemb"),
            col("nrm").as("ynrm"))
        val xq = xs.orderBy(col("xid")).limit(24)
        val fwd = ys.crossJoin(broadcast(xq))
          .select(col("xid"), col("yid"),
            Similarity.cosE6(Similarity.dotE3(col("xemb"), col("yemb")),
              col("xnrm"), col("ynrm")).as("c"))
        val wF = Window.partitionBy(col("xid")).orderBy(col("c").desc, col("yid"))
        val fwdK = fwd.withColumn("rk", row_number().over(wF))
          .filter(col("rk") <= mineK).localCheckpoint(eager = false)
        val fsum = fwdK.groupBy(col("xid")).agg(sum(col("c")).as("fsum"))
        val candY = fwdK.select(col("yid")).distinct().join(ys, "yid")
        val bwd = xs.crossJoin(broadcast(candY))
          .select(col("yid"), col("xid"),
            Similarity.cosE6(Similarity.dotE3(col("xemb"), col("yemb")),
              col("xnrm"), col("ynrm")).as("cb"))
        val wB = Window.partitionBy(col("yid")).orderBy(col("cb").desc, col("xid"))
        val bsum = bwd.withColumn("rk", row_number().over(wB))
          .filter(col("rk") <= mineK)
          .groupBy(col("yid")).agg(sum(col("cb")).as("bsum"))
        val wM = Window.partitionBy(col("xid"))
          .orderBy(col("margin_e6").desc, col("yid"))
        fwdK.select(col("xid"), col("yid"), col("c"))
          .join(fsum, "xid").join(bsum, "yid")
          .filter(col("c") > 0 && col("fsum") + col("bsum") > 0)
          .withColumn("margin_e6",
            expr(s"(${2 * mineK}000000 * c) div (fsum + bsum)"))
          .withColumn("rk2", row_number().over(wM)).filter(col("rk2") === 1)
          .filter(col("margin_e6") >= 1050000L)
          .select(col("xid"), col("yid"), col("c").as("cos_e6"), col("margin_e6"))
      },
      Some {
        def cos(a: String, b: String) = Similarity.duckCosE6(
          Similarity.duckDotE3(a, b, Dim),
          Similarity.duckDotE3(a, a, Dim), Similarity.duckDotE3(b, b, Dim))
        s"""WITH xs AS MATERIALIZED (
          SELECT vec_id AS xid, embedding AS xemb FROM embeddings WHERE label % 2 = 0
        ), ys AS MATERIALIZED (
          SELECT vec_id AS yid, embedding AS yemb FROM embeddings WHERE label % 2 = 1
        ), xq AS MATERIALIZED (SELECT * FROM xs ORDER BY xid LIMIT 24
        ), fwd AS (
          SELECT xid, yid, ${cos("xemb", "yemb")} AS c FROM xq CROSS JOIN ys
        ), fwdk AS MATERIALIZED (
          SELECT xid, yid, c FROM (
            SELECT *, row_number() OVER (PARTITION BY xid ORDER BY c DESC, yid) AS rk
            FROM fwd) t
          WHERE rk <= 4
        ), fsum AS (SELECT xid, sum(c) AS fsum FROM fwdk GROUP BY xid
        ), bwd AS (
          SELECT y.yid, x.xid, ${cos("x.xemb", "y.yemb")} AS cb
          FROM (SELECT ys.* FROM ys JOIN (SELECT DISTINCT yid FROM fwdk) c USING (yid)) y
          CROSS JOIN xs x
        ), bsum AS (
          SELECT yid, sum(cb) AS bsum FROM (
            SELECT *, row_number() OVER (PARTITION BY yid ORDER BY cb DESC, xid) AS rk
            FROM bwd) t
          WHERE rk <= 4 GROUP BY yid
        ), m AS (
          SELECT f.xid, f.yid, f.c,
            (8000000 * f.c) // (fs.fsum + bs.bsum) AS margin_e6
          FROM fwdk f JOIN fsum fs ON fs.xid = f.xid JOIN bsum bs ON bs.yid = f.yid
          WHERE f.c > 0 AND fs.fsum + bs.bsum > 0
        )
        SELECT xid, yid, CAST(c AS BIGINT) AS cos_e6, CAST(margin_e6 AS BIGINT) AS margin_e6
        FROM (SELECT *, row_number() OVER (PARTITION BY xid ORDER BY margin_e6 DESC, yid) AS rk2 FROM m) t
        WHERE rk2 = 1 AND margin_e6 >= 1050000"""
      })
  )
}
