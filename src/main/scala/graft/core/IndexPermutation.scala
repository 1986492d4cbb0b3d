package graft.core

/** Exact twin of the reference's cheap index permutation
  * (reference: src/source/mod.rs:316-368): an affine bijection
  * `v = (a*counter + b) & mask` over the smallest power-of-two domain
  * covering `total`, with rejection of out-of-range values. `a = (seed|1)
  * & mask` is odd, so the map is a bijection on the bit domain and every
  * index in `[0, total)` appears exactly once per domain sweep.
  *
  * Two forms:
  *   - the driver-side iterator (page-index generation is O(limit)
  *     expected work — the rejection rate is < 50% because
  *     `domain < 2*total`), used by [[graft.sources.FileCorpusIndex]] to
  *     pick WHICH index rows a page reads (metadata only — record bytes
  *     are read distributively);
  *   - [[permuteBits]] as a pure function, mirrored in oracle SQL (the
  *     multiply never overflows for the fixture-scale domains the DuckDB
  *     oracle runs; the Scala side wraps like the reference's
  *     `wrapping_mul`).
  */
final class IndexPermutation(total: Long, seed: Long, start: Long) {
  require(total > 0, "IndexPermutation: empty domain")
  val domainBits: Int = math.max(64 - java.lang.Long.numberOfLeadingZeros(total - 1), 1)
  val domainSize: Long = 1L << domainBits
  private var counterVar: Long = start

  /** Next in-range index; advances the counter past rejects (reference
    * `next`, src/source/mod.rs:337-347). */
  def next(): Long = {
    var v = -1L
    do {
      v = IndexPermutation.permuteBits(
        java.lang.Long.remainderUnsigned(counterVar, domainSize), domainBits, seed)
      counterVar += 1
    } while (v >= total)
    v
  }

  /** The persisted cursor form: counter mod total (reference `cursor`,
    * src/source/mod.rs:349-351 — mod TOTAL, not domain; replicated). */
  def cursor: Long = java.lang.Long.remainderUnsigned(counterVar, total)

  /** Raw counter (for tests). */
  def counter: Long = counterVar
}

object IndexPermutation {

  /** `((seed|1)&mask) * value + ((seed>>>1)&mask)` masked to `bits`
    * (reference permute_bits, src/source/mod.rs:353-367). Scala `Long`
    * arithmetic wraps exactly like Rust's `wrapping_mul/add`. */
  def permuteBits(value: Long, bits: Int, seed: Long): Long = {
    if (bits == 0) return 0L
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    var a = (seed | 1L) & mask
    if (a == 0L) a = 1L
    val b = (seed >>> 1) & mask
    (a * value + b) & mask
  }

  /** DuckDB twin of one permutation step over a counter column expression
    * (same affine form; fixture-scale domains keep the product inside
    * BIGINT). */
  def duckPermute(counterExpr: String, total: Long, seed: Long): String = {
    val p = new IndexPermutation(total, seed, 0)
    val mask = p.domainSize - 1
    var a = (seed | 1L) & mask
    if (a == 0L) a = 1L
    val b = (seed >>> 1) & mask
    s"(($a * (($counterExpr) % ${p.domainSize}) + $b) & $mask)"
  }
}
