package graft.queries

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Builder↔server parity for the persisted IVFADC index
  * ([[ComposedIndexQueries.ivfadcIndex]]): the search lane must deliver
  * the same ranking whether the trained relations (centroids, residual
  * codebook, codes) come from the in-plan derivation (cold build) or
  * from the parquet round-trip (warm load). Floats written to parquet
  * round-trip bit-exactly and every training pick is seeded-hash
  * deterministic, so the two generations must match row for row — any
  * drift (a lossy write, a nondeterministic limit, a torn multi-relation
  * publish) breaks here before it breaks the q122/q128 oracle hashes.
  */
class AnnIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.mkString(",")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("staged ivfadc relations == the in-plan training derivation, row for row") {
    // a fresh corpus dir (embeddings copied under a new path) lands in a
    // fresh cache namespace, so the load-or-build provably trains and
    // publishes here; the reference side is the SAME derivation run
    // in-plan, never persisted — a lossy write, a torn multi-relation
    // publish, or nondeterministic training breaks the comparison
    val tmp = java.nio.file.Files.createTempDirectory("graft_annc")
    val src = java.nio.file.Paths.get(sfDir, "embeddings.parquet")
    val dst = tmp.resolve("embeddings.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).forEach(p =>
        java.nio.file.Files.copy(p, dst.resolve(p.getFileName)))
    } else java.nio.file.Files.copy(src, dst)
    // COLD run first: the fresh namespace means this first q122 call
    // load-or-builds — it trains and publishes the index inside the
    // query — so its rows are the cold-build answer
    val q = graft.SparkEntry.queries("q122_ivfadc_search")
    val coldRows = rows(q(spark, tmp.toString))
    val loaded = SimilarityQueries.ivfadcRelations(spark, tmp.toString)
    val derived = SimilarityQueries.ivfadcTrain(
      graft.core.Tables.load(spark, tmp.toString, "embeddings"))
    loaded.zip(derived).zipWithIndex.foreach { case ((ix, dv), i) =>
      assert(ix.columns.sorted.sameElements(dv.columns.sorted), s"relation $i columns")
      val got = rows(ix.select(dv.columns.map(col).toSeq: _*))
      val want = rows(dv)
      assert(got.nonEmpty, s"relation $i empty")
      assert(got == want, s"staged relation $i != in-plan derivation")
    }
    // and the search answers identically across the cold build above and
    // a warm load of the published relations
    assert(rows(q(spark, tmp.toString)) == coldRows)
  }

  test("trained relations survive the parquet round-trip bit-exactly") {
    // the law the staged index rests on: the float arrays the trainers
    // emit are parquet-exact (no rounding seam between build and serve)
    import graft.operators.{Pq, Similarity}
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann").toString
    cents.write.parquet(s"$tmp/cents")
    assert(rows(spark.read.parquet(s"$tmp/cents")) == rows(cents))
    val cb = Pq.codebook(emb, "vec_id", "embedding", 16, 4, 8)
    cb.write.parquet(s"$tmp/cb")
    assert(rows(spark.read.parquet(s"$tmp/cb")) == rows(cb))
  }
}
