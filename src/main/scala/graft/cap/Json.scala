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

  /** JS number rendering: integral values (within safe range) print as
    * integers — `JSON.stringify(174.0)` is `"174"`, not `"174.0"`. */
  def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // JSON.stringify(NaN) → null
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  def bool(b: Boolean): String = if (b) "true" else "false"

  /** Object from pre-rendered (key → json-value) pairs, in order. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
}
