package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *   - brute-force cosine top-k: broadcast the (small) query set against the
  *     corpus — one narrow pass + per-query top-k, no all-pairs shuffle.
  *     This is the correctness baseline;
  *   - LSH random-hyperplane bucketing: 1 sign bit per hyperplane → bucket
  *     id; near-dup search joins only within buckets. At 100 TB the bucket
  *     join replaces the O(n²) pair space with per-bucket blocks, and the
  *     bucket assignment itself is a narrow map fused into the scan.
  *
  * Exactness doctrine: dot products are computed over per-element
  * **scaled integers** (`round(x * 1000)`), so the sums are exact integers
  * regardless of summation order — bit-identical across partitionings and
  * in the DuckDB oracle. The final cosine is one deterministic double
  * division+sqrt, floored at e6 scale. Hyperplane components are centered
  * portable hashes (integers), so bucket ids are likewise exact.
  */
object Similarity {

  /** Per-element scaled-integer value: round(x * 1000) as long. */
  private def e3(x: Column): Column = round(x.cast("double") * 1000).cast("long")

  /** Exact scaled dot product of two float arrays — the native codegen'd
    * expression ([[graft.plans.DotE3]]): one JIT loop per row instead of
    * ~dim interpreted lambda invocations (higher-order array functions
    * have no doGenCode), which dominated the pair-scoring queries. */
  def dotE3(a: Column, b: Column): Column = graft.plans.DotE3(a, b)

  /** Exact scaled self dot (squared norm). */
  def normE3(a: Column): Column = graft.plans.DotE3(a, a)

  /** Built-ins-only twins of [[dotE3]]/[[normE3]] (same values including
    * the null contract; pin the native expression's semantics in tests). */
  private[graft] def dotE3Composed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => e3(x) * e3(y)), lit(0L), (acc, v) => acc + v)

  private[graft] def normE3Composed(a: Column): Column =
    aggregate(transform(a, x => e3(x) * e3(x)), lit(0L), (acc, v) => acc + v)

  /** Cosine at e6 integer scale from exact ints: floor(1e6*dot/(|a||b|)). */
  def cosE6(dot: Column, na: Column, nb: Column): Column =
    floor(dot.cast("double") * 1000000.0 / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))).cast("long")

  def duckDotE3(aExpr: String, bExpr: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> " +
      s"CAST(round(CAST($aExpr[i] AS DOUBLE) * 1000) AS BIGINT) * " +
      s"CAST(round(CAST($bExpr[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)"

  def duckCosE6(dotExpr: String, naExpr: String, nbExpr: String): String =
    s"CAST(floor(CAST($dotExpr AS DOUBLE) * 1000000.0 / " +
      s"(sqrt(CAST($naExpr AS DOUBLE)) * sqrt(CAST($nbExpr AS DOUBLE)))) AS BIGINT)"

  /** Deterministic hyperplane component j,i as a centered integer
    * (portable hash minus 2^31). */
  private def plane(j: Int, i: Column): Column =
    Determinism.portableHash(concat(lit(s"rp:$j:"), i.cast("string"))) - lit(2147483648L)

  /** Sign-bit bucket id over `numPlanes` random hyperplanes. Exact ints. */
  def lshBucket(emb: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { j =>
      val dot = aggregate(
        transform(sequence(lit(1), lit(dim)),
          i => e3(element_at(emb, i)) * plane(j, i)),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  def duckLshBucket(embExpr: String, dim: Int, numPlanes: Int): String = {
    val bits = (0 until numPlanes).map { j =>
      val h = Determinism.duckHash(s"'rp:$j:' || CAST(i AS VARCHAR)")
      val dot = s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> " +
        s"CAST(round(CAST($embExpr[i] AS DOUBLE) * 1000) AS BIGINT) * ($h - 2147483648))) AS BIGINT)"
      s"CASE WHEN $dot > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END"
    }
    s"(${bits.mkString(" + ")})"
  }

  /** Squared-norm table `(id, nrm)` for a corpus. */
  def norms(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol), normE3(col(embCol)).as("nrm"))

  // ----------------------------------------------------------------- //
  // IVF coarse quantization — the second scale path for ANN beyond
  // hyperplane buckets. K corpus vectors are hash-picked as the coarse
  // codebook (the standard random-quantizer IVF-flat bootstrap), which
  // [[lloydStep]] optionally refines — exact-integer k-means on the e3
  // lattice, so iteration stays reproducible. Assignment is argmin of EXACT integer
  // squared-L2 (|a|² + |c|² − 2·dot at e3 scale) via min-of-struct — a
  // narrow n×K pass, no window, no shuffle beyond the final aggregate.
  // Queries probe the nprobe nearest cells and run exact cosine only
  // within them: the search shuffles probed cells, never the corpus.
  // ----------------------------------------------------------------- //

  /** Deterministic codebook: the K corpus vectors with the smallest
    * seeded hash — distributed top-k (TakeOrderedAndProject), the tiny
    * rank window runs over K rows only. */
  def ivfCentroids(emb: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val top = emb.select(col(idCol).as("_id"), col(embCol).as("cemb"),
        Determinism.seeded("ivf-cent", col(idCol)).as("sk"))
      .orderBy(col("sk"), col("_id")).limit(k)
    top.withColumn("cid", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.partitionBy()
          .orderBy(col("sk"), col("_id"))).cast("long") - 1)
      .select(col("cid"), col("cemb"))
  }

  /** One exact Lloyd (k-means) refinement step over the coarse codebook:
    * reassign every vector to its nearest centroid ([[ivfAssign]] — exact
    * integer distances), then recompute each non-empty cell's centroid as
    * the per-dimension mean of its members.
    *
    * Exactness: sums run over the e3 scaled integers (order-free); the
    * mean is `floor(sum / n)` — the one double division is exact-integer-
    * recoverable (|sum| ≪ 2⁵³, and an integer quotient divides exactly),
    * so the refined centroid is bit-reproducible by the oracle. The
    * emitted `cemb` floats are e3-integers / 1000, which round-trip
    * EXACTLY through [[dotE3]]'s `round(x·1000)` re-scaling — iterating
    * the step stays on the integer lattice. Empty cells drop (standard
    * Lloyd; the codebook may shrink).
    *
    * Scale shape: assignment is the same narrow n×K pass as [[ivfAssign]];
    * the recompute is one explode to (cell, dim) keyed rows and a
    * map-side-combined aggregation — centroids (K·dim rows) stay
    * broadcast-sized throughout. Returns `(cid, cemb, n)`.
    */
  def lloydStep(emb: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): DataFrame = {
    val assign = ivfAssign(emb, idCol, embCol, centroids)
    emb.join(assign, idCol)
      .select(col("cell"), posexplode(col(embCol)).as(Seq("i0", "x")))
      .select(col("cell"), (col("i0") + 1).as("i"),
        round(col("x").cast("double") * 1000).cast("long").as("e"))
      .groupBy(col("cell"), col("i"))
      .agg(sum(col("e")).as("se"), count(lit(1)).as("n"))
      .withColumn("m_e3",
        floor(col("se").cast("double") / col("n").cast("double")).cast("long"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("i"), col("m_e3")))).as("ms"),
        max(col("n")).as("n"))
      .select(col("cell").as("cid"),
        transform(col("ms"), s => (s("m_e3").cast("double") / 1000.0).cast("float")).as("cemb"),
        col("n"))
  }

  /** Cell assignment `(id, cell)`: nearest centroid by exact integer
    * squared distance, ties to the lower cid (min-of-struct — no window). */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): DataFrame =
    emb.select(col(idCol), col(embCol), normE3(col(embCol)).as("nrm"))
      .crossJoin(broadcast(centroids.withColumn("cnrm", normE3(col("cemb")))))
      .withColumn("dist", col("nrm") + col("cnrm") - lit(2L) * dotE3(col(embCol), col("cemb")))
      .groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col(idCol), col("m.cid").as("cell"))

  /** The `nprobe` nearest cells per query vector (rank window over K
    * centroid rows per query — bounded by the codebook size). */
  def ivfProbes(queries: DataFrame, qidCol: String, qembCol: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("dist"), col("cid"))
    queries.select(col(qidCol), col(qembCol), normE3(col(qembCol)).as("qnrm"))
      .crossJoin(broadcast(centroids.withColumn("cnrm", normE3(col("cemb")))))
      .withColumn("dist", col("qnrm") + col("cnrm") - lit(2L) * dotE3(col(qembCol), col("cemb")))
      .withColumn("prnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("prnk") <= nprobe)
      .select(col(qidCol), col(qembCol), col("qnrm"), col("cid").as("cell"))
  }

  /** Bucket table `(id, bucket)` in the codegen-friendly shape:
    * posexplode elements → broadcast-join the (tiny) plane-component table
    * → two map-side-combined aggregations. Identical values to
    * [[lshBucket]] (exact integer sums are order-free), but no
    * higher-order lambdas — the whole plan stays inside whole-stage
    * codegen, and at scale the per-element rows shuffle nothing (partial
    * aggregation collapses them before the exchange). */
  def lshBucketTable(spark: SparkSession, df: DataFrame, idCol: String,
      embCol: String, dim: Int, numPlanes: Int): DataFrame = {
    import spark.implicits._
    val planes = (for { j <- 0 until numPlanes; i <- 1 to dim } yield {
      val h = graft.plans.PortableHash32.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"rp:$j:$i"))
      (j, i, h - 2147483648L)
    }).toDF("j", "i", "r")
    val elems = df
      .select(col(idCol), posexplode(col(embCol)).as(Seq("i0", "x")))
      .select(col(idCol), (col("i0") + 1).as("i"),
        round(col("x").cast("double") * 1000).cast("long").as("e"))
    // ONE keyed aggregation: per-plane conditional sums (order-free exact
    // integers), then the sign bits assemble in a plain projection — the
    // two-level groupBy((id, j) then id) shape shuffled the corpus twice
    // for the same values
    val dots = (0 until numPlanes).map(j =>
      sum(when(col("j") === j, col("e") * col("r"))).as(s"d$j"))
    val bits = (0 until numPlanes).map(j =>
      when(col(s"d$j") > 0, lit(1L << j)).otherwise(0L))
    elems.join(broadcast(planes), "i")
      .groupBy(col(idCol))
      .agg(dots.head, dots.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("bucket"))
  }
}
