package graft

import graft.model.{Operation, Util}
import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

class UtilSpec extends AnyFunSuite {

  // ---- stringShortener (semantics of reference util.py:16-37) ----

  test("short strings pass through unchanged") {
    assert(Util.stringShortener("abc", 10) == "abc")
    assert(Util.stringShortener("abc", 3) == "abc")
  }

  test("tiny max truncates plainly") {
    assert(Util.stringShortener("abcdef", 2) == "ab")
    assert(Util.stringShortener("abcdef", 1) == "a")
  }

  test("middle truncation preserves first/last char and embeds count") {
    val s = "abcdefghijklmnopqrstuvwxyz"
    val out = Util.stringShortener(s, 20)
    assert(out.length <= 20)
    assert(out.head == 'a' && out.last == 'z')
    assert(out.exists(_.isDigit))
  }

  test("shortener length bound holds across a seeded sweep") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val s = rnd.alphanumeric.take(rnd.nextInt(300)).mkString
      val max = 3 + rnd.nextInt(198)
      val out = Util.stringShortener(s, max)
      assert(out.length <= max, s"len=${s.length} max=$max out=$out")
      if (s.length <= max) assert(out == s)
      else assert(out.head == s.head && out.last == s.last)
    }
  }

  // ---- job-name synthesis (job.py:88-125) ----

  test("export job name uses schema ident and date") {
    val d = Instant.parse("2023-01-15T10:30:00.123456Z")
    val name = Util.jobName(Operation.Export, d, schemas = Seq("HR"))
    assert(name == "EXP-HR-20230115103000123456")
  }

  test("import-with-remap uses A-TO-B ident") {
    val d = Instant.parse("2023-01-15T10:30:00Z")
    val name = Util.jobName(Operation.Import, d,
      remapSchema = Some(("HR", "HR2")))
    assert(name.startsWith("IMP-HR-TO-HR2-"))
  }

  test("tag is infixed with # delimiters") {
    val d = Instant.parse("2023-01-15T10:30:00Z")
    val name = Util.jobName(Operation.Export, d, schemas = Seq("HR"),
      tag = Some("nightly"))
    assert(name.contains("#nightly#"))
  }

  test("job name is capped at 128 chars, ident at 32") {
    val d = Instant.parse("2023-01-15T10:30:00Z")
    val name = Util.jobName(Operation.Export, d,
      schemas = (1 to 30).map(i => s"SCHEMA$i"))
    assert(name.length <= 128)
  }

  // ---- parsing ----

  test("parseDt handles offsets and naive strings") {
    assert(Util.parseDt("2023-06-01T12:00:00Z") ==
      Instant.parse("2023-06-01T12:00:00Z"))
    assert(Util.parseDt("2023-06-01T14:00:00+02:00") ==
      Instant.parse("2023-06-01T12:00:00Z"))
    assert(Util.parseDt("2023-06-01T12:00:00") ==
      Instant.parse("2023-06-01T12:00:00Z"))
    intercept[IllegalArgumentException](Util.parseDt("not-a-date"))
  }

  test("colon-delimited remap args parse to pairs") {
    assert(Util.parseColonDelimited("HR:HR2") == ("HR", "HR2"))
    intercept[IllegalArgumentException](Util.parseColonDelimited("HRonly"))
  }
}
