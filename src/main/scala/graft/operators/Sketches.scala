package graft.operators

import graft.core.Determinism
import org.apache.spark.sql.DataFrame
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
}
