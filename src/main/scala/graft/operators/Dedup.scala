package graft.operators

import graft.core.Determinism
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication kit for large-scale text pipelines.
  *
  * Four detectors, all deterministic and oracle-portable:
  *   - exact: group by content hash of normalized text;
  *   - MinHash + LSH banding: per-doc signature is computed with array
  *     lambdas (narrow plan, NO shuffle, fused into the scan); only the
  *     band-bucket self-join shuffles, and it shuffles signatures — a few
  *     dozen bytes/doc — never the text. That is the 100 TB path: candidate
  *     generation cost scales with collisions, not with n²;
  *   - SimHash: per-bit token-hash vote, again pure array aggregates
  *     (zero shuffle per doc);
  *   - n-gram Jaccard: distinct-shingle inverted join; jaccard thresholds
  *     are evaluated by integer cross-multiplication (`inter * k >= union`)
  *     so no float ever enters the comparison.
  *
  * All randomness is the portable md5 hash (core.Determinism), so every
  * signature is reproducible by the DuckDB oracle and across cluster
  * topologies.
  */
object Dedup {

  /** Token 3-gram shingles (whole text when shorter than the shingle). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))

  def duckShingles(toksExpr: String, k: Int): String =
    s"(CASE WHEN len($toksExpr) >= $k THEN " +
      s"[array_to_string(list_slice($toksExpr, i, i + ${k - 1}), ' ') FOR i IN generate_series(1, len($toksExpr) - ${k - 1})] " +
      s"ELSE [array_to_string($toksExpr, ' ')] END)"

  /** Affine permutation constants for MinHash remixing: one md5 pass
    * computes a base 31-bit hash per shingle; permutation j is the cheap
    * bijective remix `(h * A_j + B_j) mod 2^31` (A_j odd). This replaces
    * p md5 passes with one — ~8× less hashing on the scan — and stays
    * bit-portable to the oracle (pure int64 arithmetic, no overflow:
    * products < 2^62). */
  private def mixA(j: Int): Long = 2654435761L + 2L * j
  private def mixB(j: Int): Long = 40503L * (j + 1)
  val MixMod: Long = 1L << 31

  /** Base 31-bit shingle hashes (the single md5 pass). */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(Determinism.portableHash(s), lit(MixMod)))

  def duckShingleHashes(shinglesExpr: String): String =
    s"list_transform($shinglesExpr, s -> ${Determinism.duckHash("s")} % $MixMod)"

  /** j-th MinHash over precomputed base hashes. */
  def minhashFromHashes(hashesCol: Column, j: Int): Column =
    array_min(transform(hashesCol,
      h => pmod(h * lit(mixA(j)) + lit(mixB(j)), lit(MixMod))))

  def duckMinhashFromHashes(hashesExpr: String, j: Int): String =
    s"list_min(list_transform($hashesExpr, h -> (h * ${mixA(j)} + ${mixB(j)}) % $MixMod))"

  /** SimHash bit-vote sum for bit `i` over token hashes (+1/-1 per token). */
  def simhashBitVote(tokenHashes: Column, bit: Int): Column =
    aggregate(tokenHashes, lit(0L),
      (acc, h) => acc + when(pmod(floor(h / lit(1L << bit)).cast("long"), lit(2)) === 1, 1L).otherwise(-1L))

  def duckSimhashBitVote(hashesExpr: String, bit: Int): String =
    s"CAST(list_sum(list_transform($hashesExpr, h -> CASE WHEN (h // ${1L << bit}) % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT)"

  /** MinHash signatures, one row per doc, `mh0..mh{p-1}` columns.
    *
    * Shape matters here: computing the signature with nested array lambdas
    * looks narrow but `CollapseProject` inlines the shared hash array into
    * every permutation's lambda — p full md5 passes. The explode+groupBy
    * form hashes each shingle exactly once (plain column below the
    * aggregate) and the p mins ride one map-side-combined aggregation —
    * the scalable shape at 100 TB too (signature shuffle is p longs/doc).
    * Duplicate shingles need no dedup: they cannot change a min. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numPerms: Int, shingleSize: Int): DataFrame = {
    // project the token array BEFORE the generator: the Generate node is a
    // barrier CollapseProject cannot inline tokenization through
    val hashed = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      // blank docs emit NO signature row (shingles() yields [""] for an
      // empty token array, which would otherwise fabricate one) — matches
      // the oracle's len(toks) > 0 semantics
      .filter(size(col("toks")) > 0)
      .select(col(idCol), explode(shingles(col("toks"), shingleSize)).as("shingle"))
      .select(col(idCol), pmod(Determinism.portableHash(col("shingle")), lit(MixMod)).as("h"))
    val aggs = (0 until numPerms).map(j =>
      min(pmod(col("h") * lit(mixA(j)) + lit(mixB(j)), lit(MixMod))).as(s"mh$j"))
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** SimHash signature (`bits`-wide) per doc: one hash per token (plain
    * column), bit votes as `bits` sums in one aggregation (same
    * inlining-avoidance rationale as [[minhashSignatures]]). */
  def simhashSignature(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val hashed = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(col("toks")).as("tok"))
      .select(col(idCol), Determinism.portableHash(concat(lit("sh:"), col("tok"))).as("h"))
    val votes = (0 until bits).map(i =>
      sum(when(pmod(floor(col("h") / lit(1L << i)).cast("long"), lit(2)) === 1, 1L)
        .otherwise(-1L)).as(s"v$i"))
    val agged = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    agged.select(col(idCol), sig.as("simhash"))
  }

  /** LSH candidate pairs `(a, b)` with `a < b` from a signature frame
    * (the `mh0..` columns of [[minhashSignatures]]): explode per-row band
    * structs, self-join on `(band, key)`, distinct. Shuffles band keys
    * (fixed-width longs), never signatures or text — pair-generation cost
    * scales with in-bucket collisions, not n². Shared by the candidate-pair
    * query (q22) and cluster resolution (q93). */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
      numBands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = bandKeys(numBands, rowsPerBand).map { case (b, key) =>
      struct(lit(b).as("band"), key.as("key"))
    }
    val bands = sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b")).distinct()
  }

  /** Incremental LSH candidates — the corpus-growth path: when a new
    * shard lands, only pairs touching at least one NEW doc need checking
    * (old–old pairs were resolved when the index was built). `sigs` must
    * carry a boolean `newCol`; the join is driven by the new side's bands,
    * so candidate cost scales with |new| × in-bucket collisions, never
    * with |corpus|². Emits `(a, b)` with `a < b`, same contract as
    * [[lshCandidatePairs]] — feed the union of these and the stored pairs
    * to [[connectedComponents]] to refresh the keep-list. */
  def incrementalCandidatePairs(sigs: DataFrame, idCol: String, newCol: String,
      numBands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = bandKeys(numBands, rowsPerBand).map { case (b, key) =>
      struct(lit(b).as("band"), key.as("key"))
    }
    val bands = sigs.select(col(idCol), col(newCol).as("is_new"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("is_new"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = bands.filter(col("is_new")).as("l"); val r = bands.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col(s"l.$idCol") =!= col(s"r.$idCol"))
      .select(least(col(s"l.$idCol"), col(s"r.$idCol")).as("a"),
        greatest(col(s"l.$idCol"), col(s"r.$idCol")).as("b"))
      .distinct()
  }

  /** Connected components by min-label propagation with pointer jumping:
    * every node starts labeled with its own id; each round takes the
    * minimum over itself and its neighbors (hash-min), then additionally
    * adopts the label OF its label (pointer jump), until a fixpoint (no
    * label changed). Hash-min alone converges in O(diameter) rounds; the
    * jump halves the remaining label path each round, so chains of
    * near-dups resolve in O(log diameter) — LSH duplicate clusters are
    * near-cliques and finish in 2-3 rounds; `maxIter` bounds pathology.
    * Each round is one keyed aggregation plus two joins, all on
    * `(id, label)` longs — at 100 TB the per-round shuffle is two longs
    * per edge, and every round is fully distributed (the only driver-side
    * work is the convergence count).
    *
    * Two structural decisions, both scale-critical:
    *   - the iteration runs on the EDGE-INDUCED SUBGRAPH only. A node
    *     with no candidate pair can never change label, so the loop's
    *     frames have ~2·|pairs| rows — candidate pairs, not corpus —
    *     and the full node set gets its labels by one left join at the
    *     end. Iteration cost scales with near-dup density, not corpus
    *     size.
    *   - every round ends in `localCheckpoint()`, not `cache()`. Each
    *     round's plan references the previous round's TWICE (directly
    *     and through the neighbor aggregate), so an uncut lineage
    *     DOUBLES per round — exponential analysis/optimizer cost and an
    *     OOM just rendering the plan string by round ~10. Checkpointing
    *     pins each round to a materialized RDD and keeps per-round plans
    *     constant-size. (On a cluster, prefer reliable `checkpoint()` if
    *     executor loss during the loop must be survivable.)
    *
    * @param nodes frame with column `id` (one row per node)
    * @param edges frame with columns `a`, `b` (undirected, either order)
    * @return frame (id, cluster) where cluster = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds run —
    * the observable the O(log diameter) convergence law is pinned on
    * (TextFunctionsSpec: a 200-node chain must resolve in ≤ 10 rounds,
    * where hash-min alone would need ~200). */
  def connectedComponentsWithRounds(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
    // symmetrized edges, lineage cut once: every round walks them, and an
    // uncut plan would replay the full candidate generation per round.
    // All checkpoints in this loop are LAZY (eager = false): each round
    // has exactly one consuming job — the convergence count — which
    // materializes the round's frame as a side effect, so the loop costs
    // one driver job per round instead of two (checkpoint job + count
    // job). Values are unchanged; only the job count drops.
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    // active set = nodes touching any edge (every such node appears as u
    // in the symmetrized list)
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("cluster")).localCheckpoint(false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.as("e").join(labels.as("l"), col("e.v") === col("l.id"))
        .groupBy(col("e.u").as("id")).agg(min(col("l.cluster")).as("m"))
      // `prev` rides along so convergence is a filter on the checkpointed
      // frame instead of a join back against the previous round — one
      // cheap job per round rather than a two-frame join
      val hashed = labels.as("l0").join(nbrMin.as("n"), col("l0.id") === col("n.id"), "left")
        .select(col("l0.id").as("id"),
          least(col("l0.cluster"), coalesce(col("n.m"), col("l0.cluster"))).as("cluster"),
          col("l0.cluster").as("prev"))
      // pointer jump: also adopt the label OF the label (labels are always
      // active node ids, so the self-join resolves). Hash-min alone needs
      // diameter rounds on a chain of near-dups; the jump halves the
      // remaining path every round — O(log diameter) total
      val next = hashed.as("x")
        .join(hashed.select(col("id").as("pid"), col("cluster").as("pcl")),
          col("x.cluster") === col("pid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.cluster"), coalesce(col("pcl"), col("x.cluster"))).as("cluster"),
          col("x.prev").as("prev"))
        .localCheckpoint(false)
      val changed = next.filter(col("cluster") =!= col("prev")).count()
      labels = next.select(col("id"), col("cluster"))
      iter += 1
      converged = changed == 0
    }
    // stderr, not stdout: Bench/Verify parse a JSON line from stdout
    System.err.println(s"[graft] connectedComponents: $iter rounds (converged=$converged)")
    val out = nodes.select(col("id"))
      .join(labels.select(col("id").as("xid"), col("cluster")),
        col("id") === col("xid"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    (out, iter)
  }

  /** Per-band bucket keys. For <=2 rows/band the minhashes (each < 2^31)
    * pack EXACTLY into one long — the self-join shuffles and compares a
    * fixed-width long instead of a concatenated string (collision-free,
    * measurably cheaper at scale); wider bands fall back to the string
    * form. The band id stays a separate join column. */
  def bandKeys(numBands: Int, rowsPerBand: Int): Seq[(Int, Column)] =
    (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      if (rowsPerBand <= 2)
        b -> parts.reduce((a, x) => a * lit(MixMod) + x).cast("long")
      else
        b -> concat_ws(",", (lit(s"b$b") +: parts.map(_.cast("string"))): _*)
    }
}
