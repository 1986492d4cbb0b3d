package graft

import graft.core.ScaleDials
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the shared occupancy-bits formula — the one piece of
  * arithmetic behind every scale-derived blocking-key cardinality
  * (planes95, cells152, half28). The DuckDB twin's parity is enforced
  * end-to-end by the oracles of q26/q27/q28/q95/q144/q152; this spec
  * pins the Scala side's algebra so a refactor cannot silently move a
  * power-of-two boundary.
  */
class ScaleDialsSpec extends AnyFunSuite {

  private def bits(n: Long, occ: Long): Int =
    ScaleDials.occupancyBits(n, occ, 0, 64)

  test("occupancyBits is ceil(log2(ceil(n/occ))) on exact and off-boundary inputs") {
    // occ=1: plain ceil-log2 — except the documented m=1 edge, where the
    // bit-length form returns 1 (2 buckets where 1 would do; every
    // production clamp floor is ≥ that, and the DuckDB twin agrees)
    assert(bits(1, 1) == 1)
    assert(bits(2, 1) == 1)
    assert(bits(3, 1) == 2)
    assert(bits(4, 1) == 2)
    assert(bits(5, 1) == 3)
    assert(bits(1024, 1) == 10)
    assert(bits(1025, 1) == 11)
    // occ=16: the planes95 shape
    assert(bits(16, 16) == 1)    // the same m=1 edge
    assert(bits(17, 16) == 1)    // ceil(17/16)=2
    assert(bits(256, 16) == 4)   // 16 buckets
    assert(bits(500, 16) == 5)   // ceil(500/16)=32
    assert(bits(5000, 16) == 9)  // ceil(5000/16)=313 → 2^9=512
    assert(bits(500000, 16) == 15)
  }

  test("clamps apply after the derivation, degenerate inputs stay sane") {
    assert(ScaleDials.occupancyBits(500, 16, 8, 16) == 8)   // floor wins
    assert(ScaleDials.occupancyBits(1L << 40, 16, 8, 16) == 16) // ceiling wins
    assert(ScaleDials.occupancyBits(0, 16, 5, 16) == 5)     // empty corpus
    assert(ScaleDials.occupancyBits(-3, 16, 5, 16) == 5)    // nonsense count
    assert(ScaleDials.occupancyBits(1, 16, 0, 64) == 1)     // the m=1 edge
  }

  test("monotone in n, antitone in occ — a bigger corpus never gets fewer buckets") {
    val ns = Seq(1L, 10L, 100L, 999L, 1000L, 12345L, 1000000L, 1L << 33)
    ns.sliding(2).foreach { case Seq(a, b) =>
      assert(bits(a, 16) <= bits(b, 16), s"not monotone at $a -> $b")
    }
    Seq(1L, 4L, 16L, 64L).sliding(2).foreach { case Seq(o1, o2) =>
      assert(bits(100000, o2) <= bits(100000, o1),
        s"not antitone in occupancy at $o1 -> $o2")
    }
  }

  test("derived occupancy actually lands near the target") {
    // 2^bits buckets over n items: expected occupancy in (occ/2, occ]
    // whenever the clamp is inactive and n/occ is above one bucket
    for (n <- Seq(1000L, 10000L, 987654L); occ <- Seq(8L, 16L, 64L)) {
      val b = bits(n, occ)
      val perBucket = n.toDouble / (1L << b)
      assert(perBucket <= occ, s"n=$n occ=$occ bits=$b: occupancy $perBucket above target")
      assert(perBucket > occ / 4.0, s"n=$n occ=$occ bits=$b: occupancy $perBucket wastefully low")
    }
  }
}
