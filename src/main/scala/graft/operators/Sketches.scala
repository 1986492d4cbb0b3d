package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-engine-portable cardinality sketch: HyperLogLog (Flajolet et al.
  * 2007) built on the portable md5 hash, so the registers — and therefore
  * the ESTIMATE, not just its error bound — are bit-identical in any
  * engine that can compute the same hash (the DuckDB oracle replays the
  * whole sketch). Built-in `approx_count_distinct` is a different sketch
  * per engine and can never be oracle-checked; this one can.
  *
  * Layout: m = 64 registers (6 bucket bits), ρ over the remaining 26 bits
  * of the 32-bit portable hash via integer bit-length (`bin()` string
  * length — no float log anywhere near the registers). The register table
  * is a map-side-combined `max` aggregate: linear scan, one tiny shuffle
  * keyed by (group, bucket), 64 rows per group at any corpus size.
  * The harmonic sum is EXACT under any summation order: every term is a
  * dyadic rational 2^-ρ (ρ ≤ 27), so doubles carry the sum with zero
  * rounding — determinism needs no scaled-integer detour here.
  * Small-range correction (est ≤ 2.5m with empty registers) uses linear
  * counting, and past 2³²/30 the standard 32-bit large-range correction
  * `-2³²·ln(1 − E/2³²)` applies — the full Flajolet hybrid.
  *
  * Ceiling: the portable hash is 32 bits, so cardinalities approaching
  * 2³² saturate the hash space itself (collisions, not register noise) —
  * per-GROUP cardinalities beyond ~10⁹ need a 64-bit register layout
  * (the md5 prefix has bits to spare; only the oracle's signed-BIGINT
  * convenience pins 32 here).
  */
object Sketches {

  val HllBucketBits = 6
  val HllBuckets: Int = 1 << HllBucketBits // m = 64
  val HllRemBits: Int = 32 - HllBucketBits // 26
  /** α₆₄ (the HLL bias constant for m = 64). */
  val HllAlpha = 0.709
  /** 2³² as a double (the 32-bit hash-space size). */
  val TwoP32: Double = 4294967296.0

  /** HLL distinct-count estimate per group over a `(group, elem)` stream
    * (duplicates are free — the sketch is a max). Emits
    * `(group, hll_est)`. Groups present in the input always estimate ≥ 1.
    */
  def hllDistinct(pairs: DataFrame, groupCol: String, elemCol: String): DataFrame = {
    val h = Determinism.portableHash(col(elemCol))
    val regs = pairs
      .select(col(groupCol).as("group"),
        shiftright(h, HllRemBits).as("bucket"),
        (lit(HllRemBits + 1) - when(pmod(h, lit(1L << HllRemBits)) === 0, lit(0))
          .otherwise(length(bin(pmod(h, lit(1L << HllRemBits)))))).as("rho"))
      .groupBy(col("group"), col("bucket"))
      .agg(max(col("rho")).cast("long").as("reg"))
    regs.groupBy(col("group"))
      .agg(count(lit(1)).as("np"), sum(pow(lit(0.5), col("reg"))).as("z1"))
      .withColumn("zeros", lit(HllBuckets.toLong) - col("np"))
      .withColumn("z", col("z1") + col("zeros").cast("double"))
      .withColumn("raw", floor(lit(HllAlpha) * lit((HllBuckets * HllBuckets).toDouble) / col("z")).cast("long"))
      .withColumn("hll_est",
        when(col("raw") <= lit((2.5 * HllBuckets).toLong) && col("zeros") > 0,
          floor(lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / col("zeros"))).cast("long"))
          .when(col("raw") > lit(TwoP32.toLong / 30),
            // clamp: a fully-saturated register file can push raw past
            // 2^32; the correction's argument must stay positive
            floor(lit(-TwoP32) * log(lit(1.0) -
              least(col("raw"), lit(TwoP32.toLong - 1)).cast("double") / lit(TwoP32))).cast("long"))
          .otherwise(col("raw")))
      .select(col("group"), col("hll_est"))
  }

  /** DuckDB twin of [[hllDistinct]] as a SQL fragment: expects a relation
    * `(grp, elem)` named by `src`, yields `(grp, hll_est)`. */
  def duckHllDistinct(src: String): String = {
    val h = Determinism.duckHash("elem")
    val rem = s"($h % ${1L << HllRemBits})"
    s"""(SELECT grp, CASE WHEN raw <= ${(2.5 * HllBuckets).toLong} AND zeros > 0
          THEN CAST(floor(${HllBuckets.toDouble} * ln(${HllBuckets.toDouble} / zeros)) AS BIGINT)
          WHEN raw > ${TwoP32.toLong / 30}
          THEN CAST(floor(-$TwoP32 * ln(1.0 - least(raw, ${TwoP32.toLong - 1}) / $TwoP32)) AS BIGINT)
          ELSE raw END AS hll_est
        FROM (
          SELECT grp, CAST(${HllBuckets} - count(*) AS BIGINT) AS zeros,
            CAST(floor($HllAlpha * ${(HllBuckets * HllBuckets).toDouble} /
              (sum(pow(0.5, reg)) + (${HllBuckets} - count(*)))) AS BIGINT) AS raw
          FROM (
            SELECT grp, $h // ${1L << HllRemBits} AS bucket,
              max(CASE WHEN $rem = 0 THEN ${HllRemBits + 1}
                ELSE ${HllRemBits + 1} - length(bin($rem)) END) AS reg
            FROM $src GROUP BY 1, 2) regs
          GROUP BY grp) agg)"""
  }

  // -------------------------------------------------------------------
  // Bloom filter (Bloom 1970): portable membership sketch
  // -------------------------------------------------------------------

  /** Bloom layout: `BloomBits` total bits packed 32 per BIGINT word —
    * 32, not 64, because the oracle's `<<` must never reach the sign bit
    * (DuckDB raises on `1::BIGINT << 63`). 4096 bits / k=3 keeps the
    * fixture FP rate visible but small (~2% at 500 inserted elements);
    * a production decontamination filter sizes m from the eval-suite
    * n-gram count (m ≈ 10·n for ~1% FP) — still KBs-to-MBs broadcast
    * where the raw n-gram set would be GBs.
    */
  val BloomBits = 4096
  val BloomHashes = 3
  val BloomWordBits = 32

  /** Build the filter over an `elemCol` stream (duplicates free): one
    * narrow scan → `bit_or` aggregate keyed by word index. Emits
    * `(word, bits)` with only the non-zero words present (≤ 128 rows).
    * Map-side combine applies (bit_or is commutative/associative), so the
    * shuffle is ≤ 128 rows per task at any corpus size. */
  def bloomBuild(elems: DataFrame, elemCol: String): DataFrame = {
    val posArr = array((0 until BloomHashes).map(i =>
      pmod(Determinism.seeded(s"bl$i", col(elemCol)), lit(BloomBits.toLong))): _*)
    elems.select(explode(posArr).as("pos"))
      .select((col("pos") / BloomWordBits).cast("long").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, $BloomWordBits) AS INT))").as("m"))
      .groupBy(col("word")).agg(expr("bit_or(m)").as("bits"))
  }

  /** Probe: for each `(idCol, elemCol)` row, `maybe = 1` iff all k bit
    * positions are set (classic one-sided error: every inserted element
    * reports 1; a non-member reports 1 with prob ≈ (set-bit fraction)^k).
    * The filter side is broadcast (≤ 128 rows); the probe scan never
    * shuffles until the final per-id aggregate. */
  def bloomProbe(probe: DataFrame, filter: DataFrame, idCol: String,
      elemCol: String): DataFrame = {
    val slots = probe
      .select(col(idCol).as("pid"), col(elemCol).as("elem"))
      .withColumn("pos", explode(array((0 until BloomHashes).map(i =>
        pmod(Determinism.seeded(s"bl$i", col("elem")), lit(BloomBits.toLong))): _*)))
      .select(col("pid"), col("elem"),
        (col("pos") / BloomWordBits).cast("long").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, $BloomWordBits) AS INT))").as("m"))
    slots.join(broadcast(filter), Seq("word"), "left")
      .withColumn("hit",
        when(col("bits").isNotNull && expr("(bits & m) != 0"), 1L).otherwise(0L))
      .groupBy(col("pid"), col("elem"))
      // min, not sum==k: a duplicated (pid, elem) probe row doubles the
      // lane count and a sum==k verdict would report a TRUE MEMBER as
      // absent — the one failure mode a Bloom filter must never have.
      // min(hit)=1 ⇔ every lane hit, regardless of multiplicity.
      .agg(min(col("hit")).as("maybe"))
      .select(col("pid").as(idCol), col("elem").as(elemCol), col("maybe"))
  }

  /** DuckDB twin of [[bloomBuild]]: expects a relation `(elem)` named by
    * `src`, yields `(word, bits)`. */
  def duckBloomBuild(src: String): String = {
    val lanes = (0 until BloomHashes).map { i =>
      s"SELECT ${Determinism.duckSeeded(s"bl$i", "elem")} % $BloomBits AS pos FROM $src"
    }.mkString(" UNION ALL ")
    s"""(SELECT pos // $BloomWordBits AS word,
          bit_or(CAST(1 AS BIGINT) << CAST(pos % $BloomWordBits AS INT)) AS bits
        FROM ($lanes) GROUP BY 1)"""
  }

  /** DuckDB twin of [[bloomProbe]]: `probeSrc` is a relation
    * `(pid, elem)`, `filterRel` the [[duckBloomBuild]] relation; yields
    * `(pid, elem, maybe)`. */
  def duckBloomProbe(probeSrc: String, filterRel: String): String = {
    val lanes = (0 until BloomHashes).map { i =>
      s"""SELECT pid, elem,
            ${Determinism.duckSeeded(s"bl$i", "elem")} % $BloomBits AS pos
          FROM $probeSrc"""
    }.mkString(" UNION ALL ")
    s"""(SELECT pid, elem,
          CAST(min(CASE WHEN f.bits IS NOT NULL
              AND (f.bits & (CAST(1 AS BIGINT) << CAST(s.pos % $BloomWordBits AS INT))) != 0
            THEN 1 ELSE 0 END) AS BIGINT) AS maybe
        FROM ($lanes) s
        LEFT JOIN $filterRel f ON s.pos // $BloomWordBits = f.word
        GROUP BY 1, 2)"""
  }

  // -------------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan 2005): portable frequency
  // sketch
  // -------------------------------------------------------------------

  /** CMS layout: d=4 rows × w=512 counters. The table is (d·w) BIGINTs —
    * 16 KB — regardless of corpus size, and rows merge across shards by
    * plain addition (the aggregate IS the merge). Estimates are
    * one-sided: `est ≥ true`, with overshoot ≤ εN (ε = e/w) at
    * probability 1−δ (δ = e^−d). */
  val CmsDepth = 4
  val CmsWidth = 512

  /** Build the counter table over an `elemCol` stream (multiplicities
    * COUNT — unlike the HLL/Bloom this is a frequency sketch). Emits
    * `(row, pos, cnt)`, only non-zero cells present (≤ d·w rows). */
  def cmsBuild(elems: DataFrame, elemCol: String): DataFrame =
    elems
      .select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i.toLong).as("row"),
          pmod(Determinism.seeded(s"cm$i", col(elemCol)), lit(CmsWidth.toLong)).as("pos"))): _*))
        .as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for the items in `queryCol`: min over the d cells the
    * item maps to (an absent cell is 0). The sketch side is broadcast
    * (≤ 16 KB). Emits `(queryCol, cms_est)`. */
  def cmsEstimate(items: DataFrame, sketch: DataFrame, queryCol: String): DataFrame = {
    val slots = items
      .select(col(queryCol).as("q"))
      .withColumn("cell", explode(array((0 until CmsDepth).map(i =>
        struct(lit(i.toLong).as("row"),
          pmod(Determinism.seeded(s"cm$i", col("q")), lit(CmsWidth.toLong)).as("pos"))): _*)))
      .select(col("q"), col("cell.row").as("row"), col("cell.pos").as("pos"))
    slots.join(broadcast(sketch), Seq("row", "pos"), "left")
      .groupBy(col("q"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
      .select(col("q").as(queryCol), col("cms_est"))
  }

  /** DuckDB twin of [[cmsBuild]]: expects a relation `(elem)` named by
    * `src`, yields `(row, pos, cnt)`. */
  def duckCmsBuild(src: String): String = {
    val lanes = (0 until CmsDepth).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS row,
            ${Determinism.duckSeeded(s"cm$i", "elem")} % $CmsWidth AS pos
          FROM $src"""
    }.mkString(" UNION ALL ")
    s"(SELECT row, pos, CAST(count(*) AS BIGINT) AS cnt FROM ($lanes) GROUP BY 1, 2)"
  }

  /** DuckDB twin of [[cmsEstimate]]: `itemsSrc` is a relation `(q)`,
    * `sketchRel` the [[duckCmsBuild]] relation; yields `(q, cms_est)`. */
  def duckCmsEstimate(itemsSrc: String, sketchRel: String): String = {
    val lanes = (0 until CmsDepth).map { i =>
      s"""SELECT q, CAST($i AS BIGINT) AS row,
            ${Determinism.duckSeeded(s"cm$i", "q")} % $CmsWidth AS pos
          FROM $itemsSrc"""
    }.mkString(" UNION ALL ")
    s"""(SELECT s.q, CAST(min(coalesce(k.cnt, 0)) AS BIGINT) AS cms_est
        FROM ($lanes) s
        LEFT JOIN $sketchRel k ON s.row = k.row AND s.pos = k.pos
        GROUP BY 1)"""
  }

  // -------------------------------------------------------------------
  // Bottom-k hash-sample quantile sketch
  // -------------------------------------------------------------------

  /** Quantile estimation from a BOTTOM-K HASH SAMPLE: per group, keep the
    * k rows with the smallest seeded hash of their id — a uniform sample
    * whose MEMBERSHIP is a pure hash function, so it is partition- and
    * order-invariant (unlike KLL/t-digest, whose compactions depend on
    * insertion order and can never hash-match across engines) and
    * mergeable (the union's bottom-k is the bottom-k of the parts'
    * bottom-k's). The p-quantile estimate is the type-1 order statistic
    * `value at rank ceil(p·m/100)` WITHIN the sample — the same rank
    * arithmetic the exact q112 report uses on the full data, so `k` past
    * the group size degrades gracefully to the exact quantile. Standard
    * sample-quantile error: the estimate's true rank is within
    * ~√(p(1−p)/k) of p with high probability.
    *
    * Scale shape: one keyed top-k window (rank + filter — per-partition
    * top-k then merge under AQE) where the exact quantile needs a full
    * per-group sort; the sample is ≤ k rows per group at any corpus
    * size. Input `(group, id, value)`; `ps` are integer percents; emits
    * `(group, p, q_est)`. */
  def sampleQuantiles(rows: DataFrame, k: Int, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty, "sampleQuantiles needs at least one percentile")
    val wS = Window.partitionBy(col("group"))
      .orderBy(Determinism.seeded("qsamp", col("id")), col("id"))
    val samp = rows
      .withColumn("srnk", row_number().over(wS).cast("long"))
      .filter(col("srnk") <= k).drop("srnk")
    val wV = Window.partitionBy(col("group")).orderBy(col("value"), col("id"))
    val ranked = samp
      .withColumn("vrnk", row_number().over(wV).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("group"))).cast("long"))
    ps.map(p => ranked
        .filter(col("vrnk") === expr(s"(m * $p + 99) div 100"))
        .select(col("group"), lit(p.toLong).as("p"), col("value").as("q_est")))
      .reduce(_ unionByName _)
  }

  /** DuckDB twin of [[sampleQuantiles]]: expects a relation
    * `(grp, id, value)` named by `src`, yields `(grp, p, q_est)`. */
  def duckSampleQuantiles(src: String, k: Int, ps: Seq[Int]): String = {
    require(ps.nonEmpty, "duckSampleQuantiles needs at least one percentile")
    // the ranked sample is a nested CTE so the two window sorts run ONCE,
    // not once per percentile lane
    val lanes = ps.map(p =>
      s"SELECT grp, CAST($p AS BIGINT) AS p, value AS q_est FROM rnked WHERE vrnk = (m * $p + 99) // 100")
    s"""(WITH rnked AS (SELECT grp, value,
          CAST(row_number() OVER (PARTITION BY grp ORDER BY value, id) AS BIGINT) AS vrnk,
          CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS m
        FROM (SELECT grp, id, value FROM (
          SELECT grp, id, value, row_number() OVER (PARTITION BY grp
            ORDER BY ${Determinism.duckSeeded("qsamp", "id")}, id) AS srnk
          FROM $src) s0 WHERE srnk <= $k) s1)
      ${lanes.mkString(" UNION ALL ")})"""
  }
}
