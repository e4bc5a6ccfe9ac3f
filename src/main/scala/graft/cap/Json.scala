package graft.cap

/** Minimal JSON writer with JS `JSON.stringify` semantics — deterministic
  * key order (caller-supplied), JS number rendering (integral doubles
  * print without a decimal point), and stringify-compatible escaping.
  * Used for golden-comparable CoT feature output; no external deps.
  */
object Json {

  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def str(s: String): String = "\"" + esc(s) + "\""

  /** JS number rendering (`JSON.stringify` = `Number#toString`):
    * integral values print without a decimal point (`174`, not `174.0`);
    * exponent form only outside [1e-6, 1e21) (`0.0005`, not `5.0E-4`;
    * but `5e-7` and `1e+21`). Digits are the SHORTEST round-trip
    * representation, computed here by probing 1..17 significant digits —
    * JDK 17's `Double.toString` is NOT shortest (JDK-4511638, fixed only
    * in 19: `1e23` renders as `9.999999999999999E22`), so it cannot be
    * reused. */
  def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // JSON.stringify(NaN) → null
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else jsDouble(d)

  private def jsDouble(d: Double): String = {
    val neg = d < 0
    val a = math.abs(d)
    // shortest digit string that round-trips: %.{k-1}e rounds half-even
    // to k significant digits, which is the candidate closest to `a` —
    // the same choice ECMA-262 Number::toString makes.
    var k = 1
    var sci = ""
    var done = false
    while (!done && k <= 17) {
      sci = String.format(java.util.Locale.ROOT, s"%.${k - 1}e", java.lang.Double.valueOf(a))
      if (sci.toDouble == a) done = true else k += 1
    }
    val Array(mant, eStr) = sci.split("[eE]")
    val exp = eStr.toInt
    val digits = mant.replace(".", "").reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case x  => x
    }
    val out =
      if (exp >= 21 || exp <= -7) {
        // JS exponent form: mantissa without trailing ".0", e±exp
        val m = if (digits.length == 1) digits
                else digits.take(1) + "." + digits.drop(1)
        val sign = if (exp >= 0) "+" else "-"
        s"${m}e$sign${math.abs(exp)}"
      } else {
        val p = exp + 1 // digit count before the decimal point
        if (p <= 0) "0." + ("0" * -p) + digits
        else if (p >= digits.length) digits + ("0" * (p - digits.length))
        else digits.take(p) + "." + digits.drop(p)
      }
    if (neg) "-" + out else out
  }

  def bool(b: Boolean): String = if (b) "true" else "false"

  /** Object from pre-rendered (key → json-value) pairs, in order. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
}
