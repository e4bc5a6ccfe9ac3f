package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64

class CertSpec extends AnyFunSuite {
  import Cert._

  // Same payload as fixtures/cap/metservice-polygon.xml; expected
  // fingerprint computed independently with `openssl dgst -sha256`
  // (FIXTURES.md §3 parity vector).
  private val payload =
    "CN=MetService CAP Authority, O=METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED, C=NZ " +
    "validity 250101000000Z 271023120000Z signature-bytes"
  private val b64 = Base64.getEncoder.encodeToString(payload.getBytes("ISO-8859-1"))
  private val expectedFp =
    "d5930af376f1f2164a773df0a87ab96dcd45183dc845a0b43ed0d5f6366abe8a"
      .toUpperCase.grouped(2).mkString(":")

  test("P8: fingerprint = SHA-256 of decoded bytes, uppercase colon pairs (task.ts:488-491)") {
    val Some(m) = signatureMeta(b64)
    assert(m.fingerprint == expectedFp)
  }

  test("P8: CN→issuer, O→subject, second date→validUntil (task.ts:494-504)") {
    val Some(m) = signatureMeta(b64)
    assert(m.issuer == "MetService CAP Authority")
    assert(m.subject == "METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED")
    assert(m.validUntil == "2027-10-23") // second YYMMDDHHMMSSZ match
  }

  test("P8: &#13; entities and whitespace are stripped before decode (task.ts:484)") {
    val noisy = b64.grouped(40).mkString("&#13;\n") + "\n  "
    val Some(m) = signatureMeta(noisy)
    assert(m.fingerprint == expectedFp)
  }

  test("P8: only one date → default validUntil; no CN → 'MetService' (task.ts:502-504)") {
    val p = "X=1, O=SomeOrg, only 250101000000Z here"
    val Some(m) = signatureMeta(Base64.getEncoder.encodeToString(p.getBytes))
    assert(m.issuer == "MetService") // success-path default ≠ Defaults.issuer
    assert(m.subject == "SomeOrg")
    assert(m.validUntil == Defaults.validUntil)
  }

  test("P8: invalid base64 → CERT_DEFAULTS with Unknown fingerprint (task.ts:507-516)") {
    val Some(m) = signatureMeta("!!!not-valid-base64###")
    assert(m == Defaults)
    assert(m.issuer == "cap.metservice.com") // error-path issuer quirk
  }

  test("P8: absent cert → None") {
    assert(signatureMeta("").isEmpty)
    assert(signatureMeta(null).isEmpty)
  }
}
