package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment.
  *
  * Mirrors the reference's contract (reference: src/splits.rs:623-637,
  * src/config.rs:138-145): `hash(id, seed)` mapped to [0,1) and cut at the
  * cumulative ratios, so a record's split is a pure function of its stable
  * id — stable across partitions, executors, and restarts, and reproducible
  * by the DuckDB oracle. Changing an id changes its split; that is the
  * documented contract, not a bug.
  *
  * Explicit overrides (the reference's persisted `SplitStore` upserts,
  * src/splits.rs:122-131) become a small assignments table left-joined over
  * the derived column; at scale that table is broadcast.
  */
case class SplitRatios(train: Double, validation: Double, test: Double) {
  require(math.abs(train + validation + test - 1.0) < 1e-6,
    s"split ratios must sum to 1.0, got ${train + validation + test}")
  require(train >= 0 && validation >= 0 && test >= 0, "ratios must be >= 0")
}

object SplitRatios {
  val Default: SplitRatios = SplitRatios(0.8, 0.1, 0.1)
}

object Splits {
  val Train = "train"
  val Validation = "validation"
  val Test = "test"

  /** Split label as a pure column expression over the stable id. */
  def splitCol(id: Column, seed: String, r: SplitRatios = SplitRatios.Default): Column = {
    val u = Determinism.unit(seed, id)
    when(u < r.train, Train)
      .when(u < r.train + r.validation, Validation)
      .otherwise(Test)
  }

  /** DuckDB SQL equivalent of [[splitCol]]. */
  def duckSplitSql(idExpr: String, seed: String, r: SplitRatios = SplitRatios.Default): String = {
    val u = Determinism.duckUnit(seed, idExpr)
    s"(CASE WHEN $u < ${r.train} THEN '$Train' " +
      s"WHEN $u < ${r.train + r.validation} THEN '$Validation' " +
      s"ELSE '$Test' END)"
  }

  /** Hash assignment with explicit overrides winning — the reference's
    * persisted `SplitStore` upserts (src/splits.rs:122-131): `overrides`
    * is an (id, split) assignments table; a record present there takes the
    * stored label, everything else derives from the hash. The override
    * table is operator-curated and tiny relative to the corpus → broadcast
    * (the corpus never shuffles for this join). */
  def withOverrides(docs: org.apache.spark.sql.DataFrame, idCol: Column, seed: String,
      overrides: org.apache.spark.sql.DataFrame,
      r: SplitRatios = SplitRatios.Default): org.apache.spark.sql.DataFrame =
    docs.join(
        // upsert semantics: exactly one assignment per id — a duplicated
        // pin must not duplicate corpus rows through the join; conflicting
        // duplicates resolve deterministically (lexicographic min)
        broadcast(overrides.groupBy(col("id").as("_ov_id"))
          .agg(min(col("split")).as("_ov_split"))),
        idCol === col("_ov_id"), "left")
      .withColumn("split", coalesce(col("_ov_split"), splitCol(idCol, seed, r)))
      .drop("_ov_id", "_ov_split")
}
