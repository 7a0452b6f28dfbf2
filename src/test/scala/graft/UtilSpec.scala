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

  // ---- bench budget scheduler (the r16 "always try, stop
  // gracefully" contract, unit-pinned on the two disaster replays) --

  test("r15 replay: a loaded first sweep no longer cancels the rescue sweep") {
    // budget 1500, sweep 1 took 1250 s (loaded window): r15's guard
    // estimated sweep 2 at the slowest sweep and skipped it; the r16
    // contract starts the sweep (250 s remain) and walks the
    // descending-cost order, skipping only what predictably won't fit
    assert(BenchSchedule.startSweep(1500, 1250))
    // deep into the rescue sweep (1290 s elapsed), the 140 s
    // cosine-family query is skipped (1290 + 1.5×140 > 1485)...
    assert(!BenchSchedule.fitsQuery(first = false, Some(140.0), 1500, 1290))
    // ...but the sub-second tail still re-measures
    assert(BenchSchedule.fitsQuery(first = false, Some(0.5), 1500, 1290))
    // and a first sweep never self-censors on estimates
    assert(BenchSchedule.fitsQuery(first = true, Some(140.0), 1500, 1290))
  }

  test("r14 replay: everything stops at the flush margin") {
    val atMargin = 1500 - BenchSchedule.FlushMarginS
    assert(!BenchSchedule.fitsQuery(first = true, None, 1500, atMargin))
    assert(!BenchSchedule.startSweep(1500, 1460))
    assert(!BenchSchedule.extraSweep(2.0, 100.0, 1500, atMargin))
  }

  test("extra sweep estimates at the fastest wall, not the slowest") {
    // loaded sweep 1250 s + quiet sweep 600 s: the r15 guard's
    // max-estimate (1250) would veto; the fastest-wall estimate
    // admits the extra sweep when a quiet sweep fits
    assert(BenchSchedule.extraSweep(2.0, 600.0, 2000, 800))
    assert(!BenchSchedule.extraSweep(2.0, 1250.0, 2000, 800))
    // no load-window signature → no extra sweep
    assert(!BenchSchedule.extraSweep(1.1, 600.0, 2000, 800))
  }

  test("rescue order walks descending best-time, never-measured first") {
    val best = Map("a" -> 2.0, "b" -> 9.0, "c" -> 0.1)
    val order = BenchSchedule.rescueOrder(Seq("a", "b", "c", "new"),
      best.get)
    assert(order == Seq("new", "b", "a", "c"))
  }
}
