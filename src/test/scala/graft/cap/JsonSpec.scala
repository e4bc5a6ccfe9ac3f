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
}
