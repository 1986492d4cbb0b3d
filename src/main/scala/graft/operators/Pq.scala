package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression half of a
  * production-scale ANN index (IVF-PQ), completing the family next to the
  * hyperplane-LSH ([[Similarity.lshBucketTable]]) and IVF-flat
  * ([[Similarity.ivfCentroids]]) paths.
  *
  * The idea (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public literature): split each D-dim vector into
  * M contiguous sub-vectors, learn a tiny codebook of Ks codewords per
  * subspace, and store each vector as M small codes (M bytes at Ks≤256) —
  * a 100 TB float corpus compresses ~256× while distances remain
  * computable from the codes alone. Queries score by **asymmetric distance
  * computation (ADC)**: per query, per subspace, a Ks-entry lookup table of
  * exact sub-distances; a candidate's approximate distance is the sum of M
  * table lookups — no corpus float is ever touched at query time.
  *
  * Spark shape (all relational, no UDFs):
  *   - sub-vector table: one narrow projection exploding M `slice`s of the
  *     embedding column — fused into the scan, nothing shuffles;
  *   - codebook: per subspace, the Ks sub-vectors with the smallest seeded
  *     hash (the same hash-picked bootstrap as [[Similarity.ivfCentroids]],
  *     refinable by the q65 Lloyd machinery) — M independent distributed
  *     top-k plans (`TakeOrderedAndProject`), never a global sort;
  *   - encode: sub-vectors × broadcast codebook (M·Ks rows) → exact-integer
  *     argmin per (vector, subspace) — one map-side-combinable aggregate;
  *     the code table `(id, m, code)` IS the index and is 100× smaller
  *     than the float corpus;
  *   - ADC: the per-query lookup tables are |Q|·M·Ks rows — broadcast —
  *     and scoring is one broadcast join + one keyed sum over the code
  *     table. The only shuffle in the whole query path is the final
  *     (qid, id) partial-aggregated sum.
  *
  * Exactness doctrine (see [[Similarity]]): every distance is the exact
  * integer squared L2 on the e3 lattice (|a|² + |c|² − 2·dot, each term a
  * [[graft.plans.DotE3]] integer), so codes, lookup tables, and ADC sums
  * are bit-identical across partitionings and in the DuckDB oracle.
  *
  * Reference anchor: the reference has no vector index (its one index is
  * BM25, src/sampler/backends/bm25_backend.rs) — this is a
  * driver-mandated extension operator (similarity search at scale).
  */
object Pq {

  /** Sub-vector table `(id, m, semb)`: M contiguous slices per vector.
    * `dim` must be divisible by `m`. A narrow generate fused into the
    * scan — at 100 TB this never shuffles. */
  def subVectors(emb: DataFrame, idCol: String, embCol: String,
      dim: Int, m: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val sub = dim / m
    val slices = (0 until m).map(j =>
      struct(lit(j.toLong).as("m"), slice(col(embCol), j * sub + 1, sub).as("semb")))
    emb.select(col(idCol).as("id"), explode(array(slices: _*)).as("s"))
      .select(col("id"), col("s.m").as("m"), col("s.semb").as("semb"))
  }

  /** Hash-picked PQ codebook `(m, code, cemb)`: per subspace, the `ks`
    * sub-vectors of the corpus rows with the smallest seeded hash, code
    * ids 0..ks-1 in (hash, id) rank order. Each subspace is an independent
    * `orderBy.limit(ks)` — a distributed TakeOrderedAndProject over the
    * corpus, no global window; the union is M tiny frames. (A Lloyd
    * refinement of each subspace codebook would reuse
    * [[Similarity.lloydStep]] verbatim on the slice table.) */
  def codebook(emb: DataFrame, idCol: String, embCol: String,
      dim: Int, m: Int, ks: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val sub = dim / m
    val perSubspace = (0 until m).map { j =>
      val picked = emb.select(
          col(idCol).as("id"),
          slice(col(embCol), j * sub + 1, sub).as("cemb"),
          Determinism.seeded(s"pq-cent:$j", col(idCol)).as("sk"))
        .orderBy(col("sk"), col("id")).limit(ks)
      picked.withColumn("code",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy().orderBy(col("sk"), col("id"))).cast("long") - 1)
        .select(lit(j.toLong).as("m"), col("code"), col("cemb"))
    }
    perSubspace.reduce(_.unionByName(_))
  }

  /** Exact integer squared L2 between two float sub-vectors on the e3
    * lattice: |a|² + |c|² − 2·dot, every term a codegen'd integer. */
  def distE3(a: Column, b: Column): Column =
    Similarity.normE3(a) + Similarity.normE3(b) -
      lit(2L) * Similarity.dotE3(a, b)

  /** Encode the corpus: `(id, m, code)` — nearest codeword per subspace by
    * exact integer distance, ties to the lower code. Sub-vectors ×
    * broadcast codebook, then one map-side-combinable argmin aggregate:
    * the result is the PQ index, M·8 bytes per vector. */
  def encode(emb: DataFrame, idCol: String, embCol: String,
      dim: Int, m: Int, cb: DataFrame): DataFrame =
    subVectors(emb, idCol, embCol, dim, m)
      .join(broadcast(cb), "m")
      .select(col("id"), col("m"), col("code"),
        distE3(col("semb"), col("cemb")).as("dist"))
      .groupBy(col("id"), col("m"))
      .agg(min(struct(col("dist"), col("code"))).as("mn"))
      .select(col("id"), col("m"), col("mn.code").as("code"))

  /** Per-query ADC lookup tables `(qid, m, code, d)`: exact sub-distances
    * from each query's sub-vectors to every codeword — |Q|·M·Ks rows,
    * broadcast-sized at any corpus scale. */
  def adcTables(queries: DataFrame, qidCol: String, qembCol: String,
      dim: Int, m: Int, cb: DataFrame): DataFrame =
    subVectors(queries, qidCol, qembCol, dim, m)
      .select(col("id").as("qid"), col("m"), col("semb"))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("code"),
        distE3(col("semb"), col("cemb")).as("d"))

  /** ADC scoring `(qid, id, adist)`: approximate squared distance = the
    * sum of M lookup-table entries selected by the candidate's codes. The
    * lookup tables broadcast; the one shuffle is the partial-aggregated
    * (qid, id) sum over the code table — the float corpus is never read. */
  def adcScores(codes: DataFrame, adc: DataFrame): DataFrame =
    codes.join(broadcast(adc), Seq("m", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d")).as("adist"))

  // ------------------------------------------------------------------
  // DuckDB oracle fragments — lock-step mirrors of the plans above.
  // ------------------------------------------------------------------

  /** Exact e3 squared L2 between two float-list slices (dim `sub`),
    * written directly as Σ(e3(a_i)−e3(b_i))² — identical integers to
    * [[distE3]]'s |a|²+|b|²−2ab expansion. */
  def duckDistE3(aExpr: String, bExpr: String, sub: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $sub), i -> " +
      s"(CAST(round(CAST($aExpr[i] AS DOUBLE) * 1000) AS BIGINT) - " +
      s"CAST(round(CAST($bExpr[i] AS DOUBLE) * 1000) AS BIGINT)) * " +
      s"(CAST(round(CAST($aExpr[i] AS DOUBLE) * 1000) AS BIGINT) - " +
      s"CAST(round(CAST($bExpr[i] AS DOUBLE) * 1000) AS BIGINT)))) AS BIGINT)"

  /** Shared CTEs: sub-vector table, hash-picked codebook, code table.
    * `srcRel` (default the embeddings base table) must expose
    * (vec_id, embedding) — residual-PQ callers pass their residual CTE.
    * Emits relations `pq_sub(vec_id, m, semb)`, `pq_cb(m, code, cemb)`,
    * `pq_codes(vec_id, m, code)`. */
  def duckPqCtes(dim: Int, m: Int, ks: Int, srcRel: String = "embeddings"): String = {
    val sub = dim / m
    val skExpr = Determinism.duckHash(
      "'pq-cent:' || CAST(s.m AS VARCHAR) || ':' || CAST(s.vec_id AS VARCHAR)")
    s"""pq_sub AS MATERIALIZED (
      SELECT e.vec_id, ms.m,
        list_slice(e.embedding, ms.m * $sub + 1, ms.m * $sub + $sub) AS semb
      FROM $srcRel e
      CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS m) ms
    ), pq_picked AS (
      SELECT s.m, s.vec_id, s.semb,
        row_number() OVER (PARTITION BY s.m ORDER BY $skExpr, s.vec_id) AS rn
      FROM pq_sub s
    ), pq_cb AS MATERIALIZED (
      SELECT m, CAST(rn - 1 AS BIGINT) AS code, semb AS cemb
      FROM pq_picked WHERE rn <= $ks
    ), pq_codes AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, c.code,
          row_number() OVER (PARTITION BY s.vec_id, s.m
            ORDER BY ${duckDistE3("s.semb", "c.cemb", sub)}, c.code) AS rn
        FROM pq_sub s JOIN pq_cb c ON s.m = c.m) t
      WHERE rn = 1
    )"""
  }
}
