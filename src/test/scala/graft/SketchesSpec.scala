package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the portable HLL sketch: cardinality accuracy inside the
  * published error bound, multiplicity invariance (a sketch is a max),
  * and partition invariance (register values are pure hash functions). */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def est(pairs: Seq[(String, String)], parts: Int = 4): Map[String, Long] =
    Sketches.hllDistinct(pairs.toDF("group", "elem").repartition(parts), "group", "elem")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates land within the m=64 error envelope across regimes") {
    // σ = 1.04/√64 = 13%; allow 4σ (plus small-range discretization)
    val pairs =
      (1 to 20).map(i => "small" -> s"s$i") ++
      (1 to 2000).map(i => "mid" -> s"m$i") ++
      (1 to 30000).map(i => "big" -> s"b$i")
    val e = est(pairs)
    assert(math.abs(e("small") - 20) <= 10, s"small: ${e("small")}")
    assert(math.abs(e("mid") - 2000) <= 1040, s"mid: ${e("mid")}")
    assert(math.abs(e("big") - 30000) <= 15600, s"big: ${e("big")}")
  }

  test("multiplicity never changes a register: 5x-duplicated stream sketches identically") {
    val uniq = (1 to 500).map(i => "g" -> s"e$i")
    val dup = (1 to 5).flatMap(_ => uniq)
    assert(est(uniq) == est(dup))
  }

  test("sketch is partition invariant") {
    val pairs = (1 to 3000).map(i => s"g${i % 3}" -> s"e$i")
    assert(est(pairs, parts = 1) == est(pairs, parts = 13))
  }
}
