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

  /** j-th MinHash over a shingle array. */
  def minhash(shingleCol: Column, j: Int): Column =
    array_min(transform(shingleCol,
      s => Determinism.portableHash(concat(lit(s"mh$j:"), s))))

  def duckMinhash(shinglesExpr: String, j: Int): String =
    s"list_min(list_transform($shinglesExpr, s -> ${Determinism.duckHash(s"'mh$j:' || s")}))"

  /** SimHash bit-vote sum for bit `i` over token hashes (+1/-1 per token). */
  def simhashBitVote(tokenHashes: Column, bit: Int): Column =
    aggregate(tokenHashes, lit(0L),
      (acc, h) => acc + when(pmod(floor(h / lit(1L << bit)).cast("long"), lit(2)) === 1, 1L).otherwise(-1L))

  def duckSimhashBitVote(hashesExpr: String, bit: Int): String =
    s"CAST(list_sum(list_transform($hashesExpr, h -> CASE WHEN (h // ${1L << bit}) % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT)"

  /** MinHash signatures, one row per doc, `mh0..mh{p-1}` columns. Narrow. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numPerms: Int, shingleSize: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = df.select(col(idCol), shingles(toks, shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    (0 until numPerms).foldLeft(base)((d, j) =>
      d.withColumn(s"mh$j", minhash(col("sh"), j))).drop("sh")
  }

  /** SimHash signature (`bits`-wide) per doc. Narrow. */
  def simhashSignature(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val hs = transform(TextFunctions.tokens(col(textCol)),
      t => Determinism.portableHash(concat(lit("sh:"), t)))
    val base = df.select(col(idCol), hs.as("hs")).filter(size(col("hs")) > 0)
    val withVotes = (0 until bits).foldLeft(base)((d, i) =>
      d.withColumn(s"v$i", simhashBitVote(col("hs"), i)))
    val sig = (0 until bits).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    withVotes.select(col(idCol), sig.as("simhash"))
  }

  /** LSH band key columns for a signature row: `numBands` bands of
    * `rowsPerBand` minhashes each. */
  def bandKeys(numBands: Int, rowsPerBand: Int): Seq[(Int, Column)] =
    (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}").cast("string"))
      b -> concat_ws(",", (lit(s"b$b") +: parts): _*)
    }
}
