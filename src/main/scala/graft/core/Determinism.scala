package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-portable hashing kit.
  *
  * Design doctrine (see SURVEY.md §7.1): every "random" choice in the engine
  * is a pure function of `(seed, stable-id, draw-counter)`. The reference
  * reaches determinism with mutable seeded RNGs and cursors
  * (reference: src/hash.rs:6-40, src/sampler/mod.rs:56-104); we instead use
  * stateless hash columns so the same choice can be recomputed on any
  * executor, in any partition order, with no sequential phase.
  *
  * Two tiers:
  *   - `portableHash` / `seeded`: first 8 hex digits of md5 — reproducible
  *     bit-for-bit in external SQL engines (the DuckDB correctness oracle
  *     computes `CAST('0x'||substr(md5(x),1,8) AS BIGINT)`). Used by every
  *     oracle-checked query.
  *   - `fastHash`: xxhash64, codegen'd, for engine-internal hot paths where
  *     no external oracle needs to reproduce the value.
  */
object Determinism {

  /** Size of the portable hash space: 2^32. */
  val HashSpace: Long = 1L << 32

  /** Portable 32-bit unsigned hash of a column (value in [0, 2^32)),
    * evaluated by the native codegen'd expression
    * [[graft.plans.PortableHash32]]. */
  def portableHash(c: Column): Column =
    graft.plans.PortableHash32(c.cast("string"))

  /** Built-ins-only form of [[portableHash]] (same values; used to pin the
    * native expression's semantics in tests). */
  def portableHashComposed(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Seeded portable hash: hash of `"<seed>:<value>"`. */
  def seeded(seed: String, c: Column): Column =
    portableHash(concat(lit(seed + ":"), c.cast("string")))

  /** Uniform [0, 1) derived from the seeded portable hash. */
  def unit(seed: String, c: Column): Column =
    seeded(seed, c) / lit(HashSpace.toDouble)

  /** Engine-internal fast hash (xxhash64, codegen'd; NOT oracle-portable). */
  def fastHash(seed: Long, cols: Column*): Column =
    xxhash64((lit(seed) +: cols): _*)

  /** JVM-side scalar twin of [[portableHash]] (md5 first 4 bytes as an
    * unsigned 32-bit value — same construction as
    * [[graft.functions.Kvp.DetRng]]): for Scala code on the driver or
    * inside mapPartitions that must agree bit-for-bit with the column
    * form, e.g. fixture synthesis in oracle queries. */
  def jvmHash(s: String): Long = {
    val b = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  // -------------------------------------------------------------------
  // DuckDB SQL snippet generators — mirror the column expressions above
  // so oracle SQL strings stay in lock-step with the Spark plans.
  // -------------------------------------------------------------------

  def duckHash(expr: String): String =
    s"CAST('0x' || substr(md5(CAST(($expr) AS VARCHAR)), 1, 8) AS BIGINT)"

  def duckSeeded(seed: String, expr: String): String =
    duckHash(s"'$seed:' || CAST(($expr) AS VARCHAR)")

  def duckUnit(seed: String, expr: String): String =
    s"(${duckSeeded(seed, expr)} / 4294967296.0)"
}
