package graft.functions

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneId, ZoneOffset}
import java.util.Locale

/** JavaScript-compatible primitives. The reference (task.ts) leans on JS
  * host semantics — `parseFloat` prefix parsing, `new Date(...)` ISO
  * parsing, `toISOString()` millisecond-Z rendering, and
  * `toLocaleString('en-NZ', {timeZone:'Pacific/Auckland'})` — so those
  * semantics are reproduced here exactly and unit-tested.
  */
object JsCompat {

  private val floatPrefix = """^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r

  /** JS `parseFloat`: longest valid numeric prefix, NaN if none.
    * (`task.ts:287-288`, `327-330` rely on this — "1.5abc" parses to 1.5.)
    * Optionally-signed `Infinity` is a valid JS prefix too — the
    * reference accepts a circle radius of Infinity (`task.ts:327-336`). */
  def jsParseFloat(s: String): Double = {
    val t = s.trim
    if (t.startsWith("Infinity") || t.startsWith("+Infinity")) Double.PositiveInfinity
    else if (t.startsWith("-Infinity")) Double.NegativeInfinity
    else floatPrefix.findFirstIn(t) match {
      case Some(m) => m.toDouble
      case None    => Double.NaN
    }
  }

  /** JS Date's representable range: ±8.64e15 ms from the epoch
    * (ECMA-262 time-value clip). Anything outside is Invalid Date. */
  private val JsMaxAbsMillis = 8640000000000000L

  /** JS `new Date(str)` for the ISO-8601 shapes CAP feeds use.
    * Date-only and offset-less date-times are treated as UTC (the
    * reference Lambda runs with TZ=UTC). Returns None for JS
    * "Invalid Date" — including dates java.time can parse but that
    * fall outside JS's ±8.64e15 ms range (year ±275760-ish), which
    * would otherwise overflow `toEpochMilli` downstream and kill the
    * whole job on one pathological row. */
  def jsDateParse(s: String): Option[Instant] = {
    val t = s.trim
    if (t.isEmpty) return None
    def tryParse[A](f: => A): Option[A] =
      try Some(f) catch { case _: Exception => None }
    tryParse(OffsetDateTime.parse(t).toInstant)
      .orElse(tryParse(Instant.parse(t)))
      .orElse(tryParse(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)))
      .orElse(tryParse(LocalDate.parse(t).atStartOfDay(ZoneOffset.UTC).toInstant))
      .filter { i =>
        try math.abs(i.toEpochMilli) <= JsMaxAbsMillis
        catch { case _: ArithmeticException => false }
      }
  }

  private val isoMillis =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)

  /** JS `Date.prototype.toISOString()` — always millisecond precision,
    * always `Z` (`task.ts:670-672`). */
  def toIsoString(i: Instant): String = isoMillis.format(i)

  private val nzZone = ZoneId.of("Pacific/Auckland")
  private val nzFmt =
    DateTimeFormatter.ofPattern("d/MM/yyyy, h:mm:ss a", Locale.ENGLISH)

  /** JS `toLocaleString('en-NZ', {timeZone:'Pacific/Auckland'})` —
    * `d/MM/yyyy, h:mm:ss am|pm` with lowercase meridiem
    * (`task.ts:703-704`). DST (NZST/NZDT) handled by the zone rules. */
  def toNzLocaleString(i: Instant): String = {
    val s = nzFmt.format(i.atZone(nzZone))
    s.replace("AM", "am").replace("PM", "pm")
  }
}
