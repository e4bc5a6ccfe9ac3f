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
    // Shortest digit string that round-trips. BigDecimal(a) is the
    // EXACT binary value; rounding it to k significant digits with
    // HALF_EVEN yields the k-digit decimal closest to `a`, breaking
    // exact ties toward even — precisely ECMA-262 Number::toString's
    // choice. (java.util.Formatter's %e is HALF_UP and would diverge
    // on exact ties.)
    var k = 1
    var rounded = java.math.BigDecimal.ZERO
    var done = false
    while (!done && k <= 17) {
      rounded = new java.math.BigDecimal(a)
        .round(new java.math.MathContext(k, java.math.RoundingMode.HALF_EVEN))
      if (rounded.doubleValue() == a) done = true else k += 1
    }
    val unscaled = rounded.unscaledValue.toString
    // exponent of the leading digit: precision - scale - 1
    val exp = rounded.precision - rounded.scale - 1
    val digits = unscaled.reverse.dropWhile(_ == '0').reverse match {
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

  /** JSON boolean — used for the `archived`/`isCenter` constants. */
  def bool(b: Boolean): String = if (b) "true" else "false"

  /** Object from pre-rendered (key → json-value) pairs, in order. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
}
