package graft.core

/** Occupancy-stable blocking dials — the one formula behind every
  * scale-derived key cardinality in the engine (q95/q144's hyperplane
  * count, q26/q27's bucket table, q152's IVF cell count, q28's simhash
  * band width).
  *
  * The law: a pair-generating self-join keyed on a FIXED-cardinality
  * blocking key degenerates to n²/|keys| as the corpus grows, no matter
  * how clever the key. Every blocking key's cardinality must therefore
  * derive from the live corpus count so expected occupancy stays
  * ~constant and in-bucket candidate pairs grow ~n·occupancy (or, where
  * the dial also prices the build side — q152 — at the balanced n^1.5).
  *
  * The formula is PURE 64-bit integer arithmetic (ceil-div + bit
  * length), so the DuckDB oracle twin lands on the identical value from
  * the identical count — no floating log2, whose 1-ulp engine
  * differences could flip a power-of-two boundary. (`length(printf('%b',
  * x))` is DuckDB's exact bit length, the integer mirror of
  * `64 - numberOfLeadingZeros`.)
  */
object ScaleDials {

  /** Bits b such that 2^b buckets hold ~`occ` items each for a corpus of
    * `n`: ceil(log2(ceil(n / occ))), clamped to [min, max]. One edge:
    * when a single bucket would suffice (ceil(n/occ) ≤ 1) the bit-length
    * form returns 1, not 0 — two buckets where one would do; every
    * production clamp floor is ≥ 1 and the DuckDB twin lands on the same
    * value, so the edge is documented rather than special-cased. */
  def occupancyBits(n: Long, occ: Long, min: Int, max: Int): Int = {
    val m = math.max(1L, (n + occ - 1) / occ)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, m - 1))
    math.min(max, math.max(min, bits))
  }

  /** The DuckDB twin of [[occupancyBits]] as a scalar subquery over the
    * live `table` count. */
  def duckOccupancyBits(table: String, occ: Long, min: Int, max: Int): String =
    s"""(SELECT LEAST($max, GREATEST($min,
        length(printf('%b', GREATEST(1, (count(*) + ${occ - 1}) // $occ - 1)))))
        FROM $table)"""
}
