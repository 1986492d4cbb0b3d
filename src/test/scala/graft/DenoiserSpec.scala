package graft

import graft.functions.{Denoiser, DenoiserConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Gate behavior pinned against the reference denoiser
  * (reference: denoiser_preprocessor.rs:221-268 tests, README.md:1090-1193). */
class DenoiserSpec extends AnyFunSuite {

  private val cfg = DenoiserConfig(enabled = true, maxDigitRatio = 0.35, stripMarkdown = true)

  test("disabled config passes text through unchanged") {
    val noisy = "42 524 10788 143"
    assert(Denoiser.denoiseText(noisy, cfg.copy(enabled = false)).contains(noisy))
  }

  test("markdown table: separator dropped, cell text kept and re-gated") {
    val text =
      """Operating Results
        ||Metric|Q3|
        ||------|--|
        ||Revenue|ninety-four|
        |""".stripMargin
    val out = Denoiser.denoiseText(text, cfg).get
    assert(out.contains("Metric Q3"))
    assert(out.contains("Revenue ninety-four"))
    assert(!out.contains("---"))
  }

  test("zero-alpha lines are dropped") {
    val out = Denoiser.denoiseText("keep this line\n2 1 4 4 8 1 9 8\n---- ----\nalso keep", cfg).get
    assert(out == "keep this line\nalso keep")
  }

  test("pure numeric section drops entirely (None)") {
    assert(Denoiser.denoiseText("42 524 10788 143 1995 190 394 13611 358 6444 266", cfg).isEmpty)
  }

  test("wave expansion rescues adjacent numeric neighbors within ratio budget") {
    val line = "42 524 NOVEX INDUSTRIES Springfield 10788 143 1995 190 394 13611 358"
    val out = Denoiser.denoiseText(line, cfg).get
    // pinned from the reference README example (README.md:1185-1193)
    assert(out == "42 524 NOVEX INDUSTRIES Springfield 10788 143")
  }

  test("second README wave-expansion example") {
    val line = "343 294 ZETA POWER Riverside 10758 31 1283 267 189 45432 175"
    assert(Denoiser.denoiseText(line, cfg).get == "294 ZETA POWER Riverside 10758")
  }

  test("alpha-heavy prose passes unchanged; CRLF normalized") {
    val text = "Revenue grew six percent year over year.\r\nSecond line stays."
    assert(Denoiser.denoiseText(text, cfg).get ==
      "Revenue grew six percent year over year.\nSecond line stays.")
  }

  test("digit-heavy line keeps alpha seeds even when expansion is rejected") {
    // seeds survive; the first wave (neighbor '9') would push the ratio
    // over budget, so only the alpha-bearing token remains
    val out = Denoiser.denoiseText("good text here\n1 2 3 4 5 6 7 8 9 x1", cfg).get
    assert(out == "good text here\nx1")
  }

  test("q34 fixture parity: the column gates and denoiseText agree on gate-1/2 input") {
    // the exact noisy suffix q34_denoiser_gates appends — keeps the
    // oracle-checked column pipeline tied to the real preprocessor
    val noisy = "Plain alpha line\n| alpha | beta |\n| --- | :-: |\n| cellA | vB |\n987 654"
    assert(Denoiser.denoiseText(noisy, DenoiserConfig()) ==
      Some("Plain alpha line\nalpha beta\ncellA vB"))
  }
}
