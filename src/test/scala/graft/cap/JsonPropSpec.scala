package graft.cap

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import Json.num

/** Property tests for the JS-number renderer: round-trip exactness and
  * layout-range rules over arbitrary doubles, not just the unit cases.
  */
class JsonPropSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private val finiteDoubles: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e9, 1e9),
    Gen.choose(-1.0, 1.0),
    Gen.choose(-1e-5, 1e-5),
    Gen.choose(Double.MinValue / 2, Double.MaxValue / 2),
    // raw bit patterns cover subnormals and extreme exponents
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble)
      .suchThat(d => !d.isNaN && !d.isInfinite))

  test("num(d) parses back to exactly d (shortest round-trip digits)") {
    checkProp(Prop.forAll(finiteDoubles) { d =>
      java.lang.Double.parseDouble(num(d)) == d
    })
  }

  test("exponent form appears exactly outside JS's plain range [1e-6, 1e21)") {
    checkProp(Prop.forAll(finiteDoubles) { d =>
      val s = num(d)
      val a = math.abs(d)
      val plainOk = d == 0.0 || s.contains("e") ||
        (a < 1e21 && (a >= 1e-6 || d == math.rint(d)))
      val expOk = !s.contains("e") || a >= 1e21 || a < 1e-6
      plainOk && expOk
    })
  }

  test("rendering never produces Java artifacts (E, trailing .0, leading +)") {
    checkProp(Prop.forAll(finiteDoubles) { d =>
      val s = num(d)
      !s.contains("E") && !s.endsWith(".0") && !s.startsWith("+")
    })
  }
}
