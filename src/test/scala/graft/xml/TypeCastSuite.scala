package graft.xml

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeCastSuite extends AnyFunSuite {

  private val opts = XmlOptions()

  test("numeric casts with explicit plus sign") {
    assert(TypeCast.castTo("+123", LongType, opts) === 123L)
    assert(TypeCast.castTo("-123", LongType, opts) === -123L)
    assert(TypeCast.castTo("+12", IntegerType, opts) === 12)
    assert(TypeCast.castTo("1.5", DoubleType, opts) === 1.5)
    assert(TypeCast.castTo("44.95", DoubleType, opts) === 44.95)
  }

  test("xml booleans accept 1/0") {
    assert(TypeCast.castTo("true", BooleanType, opts) === true)
    assert(TypeCast.castTo("1", BooleanType, opts) === true)
    assert(TypeCast.castTo("false", BooleanType, opts) === false)
    assert(TypeCast.castTo("0", BooleanType, opts) === false)
    intercept[IllegalArgumentException] { TypeCast.castTo("yes", BooleanType, opts) }
  }

  test("decimal strips grouping commas") {
    val d = TypeCast.castTo("1,234,567.89", DecimalType(18, 2), opts)
    assert(d === Decimal(BigDecimal("1234567.89"), 18, 2))
  }

  test("timestamps: ISO instant, offset, and local formats") {
    assert(TypeCast.castTo("2024-01-02T03:04:05Z", TimestampType, opts) ===
      Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05Z")))
    assert(TypeCast.castTo("2024-01-02T03:04:05+02:00", TimestampType, opts) ===
      Timestamp.from(java.time.Instant.parse("2024-01-02T01:04:05Z")))
    assert(TypeCast.castTo("2024-01-02T03:04:05.123Z", TimestampType, opts) ===
      Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.123Z")))
    // zone-less local interpreted as UTC by default
    assert(TypeCast.castTo("2024-01-02T03:04:05", TimestampType, opts) ===
      Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05Z")))
  }

  test("custom timestampFormat and timezone") {
    val o = XmlOptions(Map(
      "timestampFormat" -> "dd/MM/yyyy HH:mm", "timezone" -> "UTC"))
    assert(TypeCast.castTo("02/01/2024 03:04", TimestampType, o) ===
      Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:00Z")))
  }

  test("dates: ISO and custom format") {
    assert(TypeCast.castTo("2020-06-07", DateType, opts) === Date.valueOf("2020-06-07"))
    val o = XmlOptions(Map("dateFormat" -> "dd.MM.yyyy"))
    assert(TypeCast.castTo("07.06.2020", DateType, o) === Date.valueOf("2020-06-07"))
    intercept[IllegalArgumentException] { TypeCast.castTo("junk", DateType, opts) }
  }

  test("nullValue mapping") {
    val o = XmlOptions(Map("nullValue" -> "N/A"))
    assert(TypeCast.castTo("N/A", StringType, o) === null)
    assert(TypeCast.castTo("N/A", LongType, o) === null)
    assert(TypeCast.castTo("x", StringType, o) === "x")
  }

  test("inference predicates") {
    assert(TypeCast.isLong("123") && TypeCast.isLong("+4") && !TypeCast.isLong("1.2"))
    assert(TypeCast.isDouble("1.5e3") && !TypeCast.isDouble("1.5d") && !TypeCast.isDouble("abc"))
    assert(TypeCast.isBoolean("true") && !TypeCast.isBoolean("1"))
    assert(TypeCast.isDate("2020-01-01", opts) && !TypeCast.isDate("20200101x", opts))
    assert(TypeCast.isTimestamp("2020-01-01T00:00:00Z", opts))
  }

  test("inference predicates: exception-free reject paths keep exact boundaries") {
    // Long boundary: 19-digit values take the real parse, overflow rejects
    assert(TypeCast.isLong("-42") && TypeCast.isLong(Long.MaxValue.toString))
    assert(TypeCast.isLong(Long.MinValue.toString))
    assert(!TypeCast.isLong("9223372036854775808")) // MaxValue + 1
    assert(!TypeCast.isLong("") && !TypeCast.isLong("+") && !TypeCast.isLong("-"))
    assert(!TypeCast.isLong("12 3") && !TypeCast.isLong("0x10"))
    // digit-less fragments reject without a parse attempt
    assert(!TypeCast.isDouble("-") && !TypeCast.isDouble(".") && !TypeCast.isDouble("e"))
    assert(TypeCast.isDouble("-.5") && TypeCast.isDouble("1e5"))
    // the structural yyyy- gate does not lose signed years or space format
    assert(TypeCast.isTimestamp("2020-01-01 10:15:30", opts))
    assert(!TypeCast.isTimestamp("N", opts) && !TypeCast.isTimestamp("10:15:30", opts))
    assert(TypeCast.isDate("-0044-03-15", opts)) // negative year keeps parsing
    // RFC 1123 is a built-in format whose head is NOT yyyy-: both shapes
    // (with and without the optional day-of-week) must survive the gate
    assert(TypeCast.isTimestamp("Tue, 3 Jun 2008 11:05:30 GMT", opts))
    assert(TypeCast.isTimestamp("3 Jun 2008 11:05:30 GMT", opts))
    assert(TypeCast.isTimestamp("13 Jun 2008 11:05:30 GMT", opts))
    // a plain sentence neither matches nor pays a parse attempt
    assert(!TypeCast.isTimestamp("the quick brown fox jumps", opts))
    // a user format without the yyyy- head still takes the full parse path
    val userFmt = XmlOptions(Map(
      "timestampFormat" -> "dd/MM/yyyy HH:mm", "dateFormat" -> "dd.MM.yyyy"))
    assert(TypeCast.isTimestamp("03/12/2011 10:15", userFmt))
    assert(TypeCast.isDate("07.06.2020", userFmt))
    assert(!TypeCast.isTimestamp("03/12/2011 10:15", opts)) // no format, no match
  }

  test("probe cost stays far below parse-attempt cost on a string-heavy corpus (budget)") {
    // Regression pin for the exception-free probe rework (6.2 -> 1.07 s
    // full-corpus inference): the predicates must reject non-matching
    // values by SCANNING, not by throwing-and-catching inside a parser.
    // The gate is relative — probe passes vs the pre-rework control flow
    // (blind parse attempts under allCatch) measured in the same JVM — so
    // host speed and JIT state cancel out. If exception-driven rejection
    // sneaks back into the predicates, the two sides converge and the 4x
    // margin fails. (Both sides warm up first; min-of-3 discards pauses.)
    import scala.util.control.Exception.allCatch
    val corpus: Array[String] = Array.tabulate(20000) { i =>
      (i % 5) match {
        case 0 => s"word soup value number $i"
        case 1 => s"SKU-$i-ALPHA"
        case 2 => s"https://example.com/path/$i"
        case 3 => s"mixed${i}text"
        case _ => "NULL"
      }
    }
    def timeNs(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    def probes(): Unit = corpus.foreach { v =>
      TypeCast.isBoolean(v); TypeCast.isLong(v); TypeCast.isDouble(v)
      TypeCast.isTimestamp(v, opts); TypeCast.isDate(v, opts)
    }
    def stormReference(): Unit = corpus.foreach { v =>
      allCatch.opt(TypeCast.parseXmlTimestamp(v, opts))
      allCatch.opt(TypeCast.parseXmlDate(v, opts))
    }
    probes(); stormReference() // JIT warmup for both sides
    val probeNs = (1 to 3).map(_ => timeNs(probes())).min
    val stormNs = (1 to 3).map(_ => timeNs(stormReference())).min
    assert(probeNs * 4 < stormNs,
      f"probe pass ${probeNs / 1e6}%.1f ms is not well under the " +
        f"exception-storm reference ${stormNs / 1e6}%.1f ms — " +
        "exception-driven rejection has crept back into the predicates")
  }
}
