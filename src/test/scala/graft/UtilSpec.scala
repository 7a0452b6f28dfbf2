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
    // estimated sweep 2 at the slowest sweep and skipped it; the
    // contract starts the sweep (250 s remain) and walks the
    // descending-cost order, skipping only what predictably won't fit
    assert(BenchSchedule.startSweep(1500, 1250))
    // deep into the rescue sweep (1290 s elapsed), the 140 s
    // cosine-family query is skipped (1290 + 1.5×140 > 1485)...
    assert(!BenchSchedule.fitsQuery(Some(140.0), 1500, 1290))
    // ...but the sub-second tail still re-measures
    assert(BenchSchedule.fitsQuery(Some(0.5), 1500, 1290))
    // a query with NO estimate (new row, no reference) still runs
    assert(BenchSchedule.fitsQuery(None, 1500, 1290))
  }

  test("r14 replay: everything stops at the flush margin") {
    val atMargin = 1500 - BenchSchedule.FlushMarginS
    assert(!BenchSchedule.fitsQuery(None, 1500, atMargin))
    assert(!BenchSchedule.startSweep(1500, 1460))
    assert(!BenchSchedule.extraSweep(2.0, Some(100.0), 1500, atMargin))
  }

  test("extra sweep estimates at the fastest COMPLETE wall only") {
    // loaded sweep 1250 s + quiet sweep 600 s: the r15 guard's
    // max-estimate (1250) would veto; the fastest-wall estimate
    // admits the extra sweep when a quiet sweep fits
    assert(BenchSchedule.extraSweep(2.0, Some(600.0), 2000, 800))
    assert(!BenchSchedule.extraSweep(2.0, Some(1250.0), 2000, 800))
    // no load-window signature → no extra sweep
    assert(!BenchSchedule.extraSweep(1.1, Some(600.0), 2000, 800))
    // r16 advisory: a budget-cut partial sweep's tiny wall must not
    // sneak in as the estimate — no COMPLETE sweep, no extra sweep
    assert(!BenchSchedule.extraSweep(2.0, None, 2000, 800))
  }

  test("rescue order walks descending best-time, reference fallback, never-measured first") {
    val best = Map("a" -> 2.0, "b" -> 9.0, "c" -> 0.1)
    val ref = Map("skipped" -> 5.0)
    val order = BenchSchedule.rescueOrder(
      Seq("a", "b", "c", "new", "skipped"), best.get, ref.get)
    // "skipped" (never ran, ref 5.0) slots between b and a;
    // "new" (no data at all) goes first — everything to gain
    assert(order == Seq("new", "b", "skipped", "a", "c"))
  }

  test("r16 replay: the first sweep ascends reference cost and self-censors under load") {
    // BENCH_r16: the alphabetical first sweep burned 1,526 s on 113
    // of 247 queries (a–k prefix) and sweep 2 never started. With the
    // reference table, the first sweep walks cheap→expensive...
    val ref = Map("q_ivfpq_recall" -> 2.65, "q_estimate_only" -> 0.156,
      "q_semdedup_lsh" -> 9.4, "q_explode_words" -> 0.199)
    val order = BenchSchedule.firstOrder(
      Seq("q_semdedup_lsh", "q_estimate_only", "q_ivfpq_recall",
        "q_explode_words", "q_new_row"), ref.get)
    assert(order.take(2) == Seq("q_estimate_only", "q_explode_words"))
    assert(order.last == "q_semdedup_lsh")
    // ...the new row without a reference sits at the median (~1.42),
    // inside the bulk (between explode_words and ivfpq)
    assert(order.indexOf("q_new_row") == 2)
    // no reference table at all → the old alphabetical order
    assert(BenchSchedule.firstOrder(Seq("b", "a", "c"), _ => None) ==
      Seq("a", "b", "c"))
    // the running load factor measures THIS window's degradation:
    // r16's ~12× window, median over (observed, reference) samples
    val load = BenchSchedule.loadFactor(
      Seq((1.8, 0.15), (2.4, 0.20), (31.8, 2.65)))
    assert(load > 11.0 && load < 13.0)
    // fewer than 3 samples or a quiet window → no inflation
    assert(BenchSchedule.loadFactor(Seq((1.0, 0.5))) == 1.0)
    assert(BenchSchedule.loadFactor(
      Seq((0.1, 0.2), (0.1, 0.2), (0.1, 0.2))) == 1.0)
    // under that window a 30 s-reference query estimates ~360 s and
    // the first sweep SKIPS it with 300 s of budget left — the exact
    // self-censorship r16's first=true unconditional run lacked
    val est = BenchSchedule.estimate(None, Some(30.0), load)
    assert(!BenchSchedule.fitsQuery(est, 1500, 1200))
    // an in-run best beats the reference-derived estimate
    assert(BenchSchedule.estimate(Some(2.0), Some(30.0), load) == Some(2.0))
  }

  test("watchdog: max(floor, k x ref), no reference -> no kill, k<=0 disables") {
    assert(BenchSchedule.watchdogS(Some(2.65)) == Some(45.0))
    assert(BenchSchedule.watchdogS(Some(30.0)) == Some(240.0))
    assert(BenchSchedule.watchdogS(None).isEmpty)
    assert(BenchSchedule.watchdogS(Some(30.0), k = 0.0).isEmpty)
  }

  test("reference table parses tolerantly and round-trips") {
    val json = """{"q_a": 1.5, "q_b":0.25,
                   "q_c" : 12}"""
    assert(BenchSchedule.parseReference(json) ==
      Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 12.0))
    assert(BenchSchedule.parseReference("") == Map.empty)
    assert(BenchSchedule.parseReference("not json at all") == Map.empty)
  }
}
