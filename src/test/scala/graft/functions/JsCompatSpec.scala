package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

class JsCompatSpec extends AnyFunSuite {
  import JsCompat._

  test("jsParseFloat: prefix parsing like JS") {
    assert(jsParseFloat("1.5") == 1.5)
    assert(jsParseFloat("1.5abc") == 1.5)
    assert(jsParseFloat("-41.29") == -41.29)
    assert(jsParseFloat("  174.78  ") == 174.78)
    assert(jsParseFloat("1e3") == 1000.0)
    assert(jsParseFloat(".5") == 0.5)
    assert(jsParseFloat("abc").isNaN)
    assert(jsParseFloat("").isNaN)
    assert(jsParseFloat(",").isNaN)
  }

  test("jsParseFloat: signed Infinity like JS parseFloat") {
    assert(jsParseFloat("Infinity") == Double.PositiveInfinity)
    assert(jsParseFloat("+Infinity") == Double.PositiveInfinity)
    assert(jsParseFloat("-Infinity") == Double.NegativeInfinity)
    assert(jsParseFloat("Infinity123") == Double.PositiveInfinity) // prefix rule
    assert(jsParseFloat("  Infinity") == Double.PositiveInfinity)
    assert(jsParseFloat("Inf").isNaN) // JS rejects partial keyword
  }

  test("jsDateParse: ISO shapes") {
    assert(jsDateParse("2026-08-12T10:00:00Z").contains(Instant.parse("2026-08-12T10:00:00Z")))
    assert(jsDateParse("2026-08-12T10:00:00+12:00").contains(Instant.parse("2026-08-11T22:00:00Z")))
    assert(jsDateParse("2026-08-12T10:00:00.123Z").contains(Instant.parse("2026-08-12T10:00:00.123Z")))
    assert(jsDateParse("2026-08-12").contains(Instant.parse("2026-08-12T00:00:00Z")))
    assert(jsDateParse("garbage").isEmpty)
    assert(jsDateParse("").isEmpty)
  }

  test("jsDateParse: dates outside JS's +-8.64e15 ms range are Invalid Date") {
    // java.time parses year 999999999 but JS clips at +-275760-09-13;
    // unguarded this overflows toEpochMilli and kills the whole job.
    assert(jsDateParse("+999999999-01-01T00:00:00Z").isEmpty)
    assert(jsDateParse("-999999999-01-01T00:00:00Z").isEmpty)
    assert(jsDateParse("+275760-09-13T00:00:00Z").nonEmpty) // JS max exact
    assert(jsDateParse("+275760-09-14T00:00:00Z").isEmpty)  // one day past
  }

  test("jsDateParse: JS-only shapes — bare year, year-month, 24:00 rollover") {
    assert(jsDateParse("2027") == jsDateParse("2027-01-01T00:00:00Z"))
    assert(jsDateParse("2027-03") == jsDateParse("2027-03-01T00:00:00Z"))
    assert(jsDateParse("2025-06-15T24:00:00Z") == jsDateParse("2025-06-16T00:00:00Z"))
    assert(jsDateParse("2025-06-15T24:00Z") == jsDateParse("2025-06-16T00:00:00Z"))
    assert(jsDateParse("2025-06-15T24:00:01Z").isEmpty) // 24:xx only valid at exactly 24:00:00
    assert(jsDateParse("2027-13").isEmpty) // month out of range
  }

  test("JS whitespace: NBSP and friends count as \\s / trim targets") {
    assert(jsTrim("\u00a0 x \ufeff") == "x")
    assert(jsParseFloat("\u00a01.5abc") == 1.5)
    assert(jsWsSplit("a\u00a0b\u2028c").toSeq == Seq("a", "b", "c"))
    assert(jsWsRemove("a b\u00a0c\td") == "abcd")
  }

  test("toIsoString: expanded years match JS (proleptic, 6 digits outside 0000-9999)") {
    assert(toIsoString(java.time.Instant.parse("+275760-09-13T00:00:00Z"))
      == "+275760-09-13T00:00:00.000Z")
    assert(toIsoString(java.time.OffsetDateTime.parse("-000001-06-01T00:00:00Z").toInstant)
      == "-000001-06-01T00:00:00.000Z")
    assert(toIsoString(java.time.Instant.parse("0000-01-01T00:00:00Z"))
      == "0000-01-01T00:00:00.000Z")
  }

  test("toIsoString: JS toISOString millisecond-Z shape (task.ts:670)") {
    assert(toIsoString(Instant.parse("2026-08-11T22:00:00Z")) == "2026-08-11T22:00:00.000Z")
    assert(toIsoString(Instant.parse("2026-08-11T22:00:00.123Z")) == "2026-08-11T22:00:00.123Z")
  }

  test("toNzLocaleString: NZST winter (UTC+12), lowercase meridiem (task.ts:703)") {
    // August = NZ winter = NZST (UTC+12)
    val s = toNzLocaleString(Instant.parse("2026-08-11T22:00:00Z"))
    assert(s == "12/08/2026, 10:00:00 am", s)
  }

  test("toNzLocaleString: NZDT summer (UTC+13)") {
    // January = NZ summer = NZDT (UTC+13)
    val s = toNzLocaleString(Instant.parse("2026-01-15T02:30:05Z"))
    assert(s == "15/01/2026, 3:30:05 pm", s)
  }

  test("toNzLocaleString: DST transition boundaries (spring-forward gap, fall-back ambiguity)") {
    // NZDT starts the last Sunday of September: 02:00 NZST jumps to
    // 03:00 NZDT (2026-09-27, i.e. 2026-09-26T14:00Z). The 2 am wall
    // hour never exists — one second before the gap renders 1:59:59,
    // the gap instant itself 3:00:00, matching JS/ICU.
    assert(toNzLocaleString(Instant.parse("2026-09-26T13:59:59Z"))
      == "27/09/2026, 1:59:59 am")
    assert(toNzLocaleString(Instant.parse("2026-09-26T14:00:00Z"))
      == "27/09/2026, 3:00:00 am")
    // NZDT ends the first Sunday of April: 03:00 NZDT falls back to
    // 02:00 NZST (2026-04-05, i.e. 2026-04-04T14:00Z). The 2:00-2:59
    // wall hour occurs TWICE; both instants must render the same
    // ambiguous local time, exactly as JS toLocaleString does.
    assert(toNzLocaleString(Instant.parse("2026-04-04T13:30:00Z"))
      == "5/04/2026, 2:30:00 am") // first pass, still NZDT (UTC+13)
    assert(toNzLocaleString(Instant.parse("2026-04-04T14:30:00Z"))
      == "5/04/2026, 2:30:00 am") // second pass, NZST (UTC+12)
    // and the instant the clock falls back: 03:00:00 NZDT == 14:00Z
    // re-renders as 2:00:00 am NZST
    assert(toNzLocaleString(Instant.parse("2026-04-04T14:00:00Z"))
      == "5/04/2026, 2:00:00 am")
  }
}
