package graft.cap

import org.scalatest.funsuite.AnyFunSuite

/** Json.num must match JS `JSON.stringify` / `Number#toString` byte-for-
  * byte — golden parity depends on it (polygon coordinates, opacities,
  * centroids). Expected strings below are literal `JSON.stringify`
  * outputs from Node.
  */
class JsonSpec extends AnyFunSuite {
  import Json._

  test("integral doubles print as integers") {
    assert(num(174.0) == "174")
    assert(num(-41.0) == "-41")
    assert(num(0.0) == "0")
    assert(num(-0.0) == "0") // JSON.stringify(-0) → "0"
    assert(num(3.0) == "3")
  }

  test("plain decimals in the Java-plain range") {
    assert(num(0.5) == "0.5")
    assert(num(0.4) == "0.4")
    assert(num(0.5019607843137255) == "0.5019607843137255")
    assert(num(-41.2923) == "-41.2923")
    assert(num(174.7762) == "174.7762")
  }

  test("small magnitudes: plain decimal down to 1e-6 (ADVICE.md fix)") {
    assert(num(5.0e-4) == "0.0005")  // Java: "5.0E-4"
    assert(num(1.0e-4) == "0.0001")
    assert(num(1.23e-5) == "0.0000123")
    assert(num(1.0e-6) == "0.000001")
    assert(num(-2.5e-6) == "-0.0000025")
  }

  test("below 1e-6: JS exponent form") {
    assert(num(9.9e-7) == "9.9e-7")
    assert(num(5.0e-7) == "5e-7")
    assert(num(-1.5e-9) == "-1.5e-9")
  }

  test("large magnitudes: plain decimal up to 1e21") {
    assert(num(1.0e15) == "1000000000000000")
    assert(num(1.23e16) == "12300000000000000")
    assert(num(1.0e20) == "100000000000000000000")
    assert(num(1.5e20) == "150000000000000000000")
  }

  test("1e21 and above: JS exponent form") {
    assert(num(1.0e21) == "1e+21")
    assert(num(1.5e21) == "1.5e+21")
    assert(num(-2.0e22) == "-2e+22")
  }

  test("non-finite → null like JSON.stringify") {
    assert(num(Double.NaN) == "null")
    assert(num(Double.PositiveInfinity) == "null")
    assert(num(Double.NegativeInfinity) == "null")
  }

  test("shortest round-trip digits where JDK 17 Double.toString is not shortest") {
    // JDK-4511638: Double.toString(1e23) = "9.999999999999999E22" on
    // JDK < 19, but JS renders the shortest round-trip "1e+23".
    assert(num(1.0e23) == "1e+23")
    assert(num(Double.MinPositiveValue) == "5e-324") // JS, not Java's 4.9e-324
    assert(num(0.3) == "0.3")
    assert(num(0.1 + 0.2) == "0.30000000000000004") // classic 17-digit case
    assert(num(1.7976931348623157e308) == "1.7976931348623157e+308")
  }
}
