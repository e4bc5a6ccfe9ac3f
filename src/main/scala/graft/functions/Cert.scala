package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** P8 — X.509 signature metadata extraction (`task.ts:479-517`).
  *
  * The reference does not parse DER: it base64-decodes the certificate,
  * then regex-scans the decoded bytes *as text* for `CN=`, `O=` and two
  * ASN.1 UTCTime-looking `YYMMDDHHMMSSZ` strings, and fingerprints the
  * decoded bytes with SHA-256 (uppercase hex, colon-grouped byte pairs).
  * Quirk preserved: the success path's issuer default is `'MetService'`
  * while the error path falls back to `CERT_DEFAULTS.ISSUER`
  * (`task.ts:502` vs `511`).
  */
object Cert {

  final case class SignatureMeta(
      issuer: String, subject: String, validUntil: String, fingerprint: String)

  val Defaults: SignatureMeta = SignatureMeta(
    issuer = "cap.metservice.com",
    subject = "METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED",
    validUntil = "2025-10-23",
    fingerprint = "Unknown")

  private val cnRe = "CN=([^,]+)".r
  private val oRe = "O=([^,]+)".r
  private val dateRe = "(\\d{2})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(\\d{2})Z".r

  /** Extract metadata from the raw `X509Certificate` element text;
    * returns None when the element is absent, Defaults on decode error
    * (`task.ts:507-516`).
    */
  def signatureMeta(certSection: String): Option[SignatureMeta] = {
    if (certSection == null || certSection.isEmpty) return None
    try {
      // strip &#13; entities and all whitespace (task.ts:484)
      val cleanCert = JsCompat.jsWsRemove(certSection.replace("&#13;", ""))
      val bytes = Base64.getDecoder.decode(cleanCert) // atob (task.ts:485)
      // JS atob yields a latin-1 "binary string"; regexes run over it
      val certData = new String(bytes, StandardCharsets.ISO_8859_1)

      val digest = MessageDigest.getInstance("SHA-256").digest(bytes)
      val hex = digest.map(b => f"$b%02X").mkString
      val fingerprint = hex.grouped(2).mkString(":")

      val issuer = cnRe.findFirstMatchIn(certData).map(m => JsCompat.jsTrim(m.group(1))).getOrElse("MetService")
      val subject = oRe.findFirstMatchIn(certData).map(m => JsCompat.jsTrim(m.group(1))).getOrElse(Defaults.subject)
      // second YYMMDDHHMMSSZ match = notAfter (task.ts:497-499)
      val dates = dateRe.findAllMatchIn(certData).toSeq
      val validUntil =
        if (dates.length >= 2) {
          val m = dates(1)
          s"20${m.group(1)}-${m.group(2)}-${m.group(3)}"
        } else Defaults.validUntil

      Some(SignatureMeta(issuer, subject, validUntil, fingerprint))
    } catch {
      case _: Exception => Some(Defaults)
    }
  }
}
