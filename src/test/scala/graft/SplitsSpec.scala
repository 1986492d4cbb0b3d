package graft

import graft.core.{Splits, SplitRatios}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Split-assignment laws (reference: src/splits.rs:623-637, 801-850). */
class SplitsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def assign(n: Int, seed: String, r: SplitRatios) = {
    import spark.implicits._
    (1 to n).map(_.toString).toDF("id")
      .select(Splits.splitCol(col("id"), seed, r).as("s"))
      .groupBy("s").count().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
  }

  test("ratios approximately honored at n=10000") {
    val counts = assign(10000, "seedA", SplitRatios(0.8, 0.1, 0.1))
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(counts.getOrElse("validation", 0L) / 10000.0 - 0.1) < 0.02)
    assert(math.abs(counts.getOrElse("test", 0L) / 10000.0 - 0.1) < 0.02)
  }

  test("zero-ratio label never appears") {
    val counts = assign(5000, "s", SplitRatios(0.5, 0.5, 0.0))
    assert(!counts.contains("test"))
    val counts2 = assign(5000, "s", SplitRatios(1.0, 0.0, 0.0))
    assert(counts2.keySet == Set("train"))
  }

  test("assignment is deterministic per seed and differs across seeds") {
    import spark.implicits._
    val ids = (1 to 500).map(_.toString).toDF("id")
    def labels(seed: String) = ids
      .select(col("id"), Splits.splitCol(col("id"), seed).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("x") == labels("x"))
    assert(labels("x") != labels("y"))
  }

  test("ratio struct validates (property)") {
    val gen = for {
      a <- Gen.choose(0.0, 1.0)
      b <- Gen.choose(0.0, 1.0 - a)
    } yield (a, b)
    val prop = Prop.forAll(gen) { case (a, b) =>
      SplitRatios(a, b, 1.0 - a - b) // must not throw
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
    assertThrows[IllegalArgumentException](SplitRatios(0.9, 0.2, 0.1))
    assertThrows[IllegalArgumentException](SplitRatios(-0.1, 0.6, 0.5))
  }
}
