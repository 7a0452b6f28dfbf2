package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — emits ONE JSON line of per-query timings.
  *
  * Measurement methodology (the r7 lesson, BASELINE.md "noise
  * characterization"): this host shows VM-level heavy-tail noise —
  * identical code swings 3-10× between fresh runs, and a sustained
  * load window poisons every query it overlaps. Back-to-back repeats
  * of one query (r3-r7's best-of-2) sit INSIDE one load window, so
  * both runs inflate together and the artifact lies. The fix is
  * INTERLEAVED full sweeps: the whole query list runs N times
  * end-to-end (default 2, `SPARK_GRAFT_SWEEPS` to override), so the
  * repeats of any one query are minutes apart and a single load
  * window can poison at most one of them. Reported per-query time is
  * the cross-sweep MIN; the headline `value` is `total_composite` =
  * Σ per-query min — the number a quiet host reproduces.
  *
  * The artifact is self-defending: `runs` carries every raw timing
  * (per sweep, -1 for an errored run; a query a budget stop never
  * reached in some sweep simply has fewer entries) and `sweep_totals`
  * the raw per-sweep sums, so a reader can see host-load windows (one
  * sweep elevated, composite unaffected) without any prose appendix.
  * A query is an error only if it fails in EVERY sweep that reached
  * it — and errors are excluded from every total (a crash must not
  * register as fast).
  *
  * BUDGET (the r14/r15 lessons — r14's 3-sweep run was killed
  * mid-stage leaving NO artifact; r15's guard then estimated sweep 2
  * at the SLOWEST sweep so far, so one loaded first sweep cancelled
  * the quiet second sweep that would have rescued the composite, and
  * the round closed with a 1-sweep loaded-window artifact no
  * methodology can use). The r16 contract inverts the posture —
  * always try, stop gracefully:
  *
  *   - a configured sweep STARTS whenever ≥ 60 s of budget remain
  *     (`SPARK_GRAFT_BENCH_BUDGET_S`, default 1500 s) — a partial
  *     quiet sweep rescues more per-query mins than no sweep;
  *   - sweeps after the first run in DESCENDING best-time order, so
  *     the queries a load window inflates the most (the biggest
  *     composite contributors) are re-measured FIRST if the sweep
  *     gets cut;
  *   - a MID-SWEEP guard skips any query that would not fit
  *     (elapsed + 1.5 × its best time so far vs. the budget minus a
  *     15 s flush margin — rescue sweeps walk down the cost order,
  *     so later, cheaper queries may still fit) and hard-stops the
  *     sweep at the flush margin; whatever ran is flushed into the
  *     artifact (`partial_sweeps` counts cut sweeps);
  *   - the load-adaptive EXTRA sweep (sweep1/sweepN > 1.5) runs only
  *     if a FULL sweep fits, estimated at the FASTEST completed
  *     sweep's wall-clock (not the slowest — the r15 inversion), and
  *     wall-clock includes cache-clear/harness overhead that summed
  *     query seconds miss.
  *
  * Harness-cost trim: Bench (and only Bench) sets [[BenchMode.fast]]
  * (`SPARK_GRAFT_BENCH_FAST=0` to disable; `bench_fast` recorded in
  * the artifact), which lets the `*_saved` rows publish their
  * trained artifact once per JVM and serve later sweeps from the
  * same bytes — per-sweep cost becomes the load+serve path those
  * rows exist to measure. Verify never sets it; outputs are
  * identical either way.
  *
  * Output ordering: the COMPACT summary line prints FIRST AND LAST
  * (every round since r5 recorded `parsed: null` because the full
  * runs-matrix line outgrew the driver's capture, and the driver has
  * captured the head in some rounds and the tail in others — leading
  * AND trailing compact lines make either capture direction
  * parseable), the full line sits between them, and per-sweep
  * progress goes to STDERR so stdout stays a clean JSON record even
  * when the process is killed mid-run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "2").toInt
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1500").toDouble
    BenchMode.fast = sys.env.getOrElse("SPARK_GRAFT_BENCH_FAST", "1") != "0"
    val wall0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wall0) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.Sessions.NanosAsLongKey, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first shuffle/broadcast/window query in a
    // fresh JVM pays JIT + codegen + FS-metadata costs that would land
    // on whichever query happens to run first.
    try {
      SparkEntry.queries.get("q_agg_pricing").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_join_region").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("q_window_rank").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }

    // Deterministic order + cache hygiene between queries: Map order
    // shifts as queries are added, which lets one query's leftover
    // blocks/GC pressure land on a different victim each build.
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the sweep — the local
    // iterate-on-one-query loop; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val fnByName = selected.toMap

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .takeWhile(_ != '\n').take(200)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }

    // sweep-major loop: run EVERY query once, then start sweep 2 —
    // never query-major (that recreates the adjacent-repeat blindspot)
    val sweepBuf = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.immutable.ListMap[String, (Double, Option[String])]]
    val sweepWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def totalOf(rs: Iterable[(Double, Option[String])]): Double =
      rs.collect { case (t, None) => t }.sum
    def bestOf(name: String): Option[Double] = {
      val ok = sweepBuf.flatMap(_.get(name)).collect { case (t, None) => t }
      if (ok.isEmpty) None else Some(ok.min)
    }
    // per-sweep progress on STDERR: a killed run still leaves a
    // human-readable record of how far it got and what each completed
    // sweep cost, without polluting the stdout JSON contract
    def progress(tag: String): Unit = {
      val rs = sweepBuf.last
      System.err.println(f"[bench] $tag done: sweep_total=${totalOf(rs.values)}%.1f s, " +
        f"n_ok=${rs.values.count(_._2.isEmpty)}/${rs.size} of ${selected.size}, " +
        f"elapsed=$elapsedS%.1f s")
    }
    var partialSweeps = 0
    // One sweep: sweep 1 walks the alphabetical list; rescue sweeps
    // walk DESCENDING best-time, so a cut sweep re-measures the
    // biggest composite contributors first. Returns whether the sweep
    // completed.
    def runSweep(first: Boolean): Boolean = {
      val order =
        if (first) selected.map(_._1)
        else BenchSchedule.rescueOrder(selected.map(_._1), bestOf)
      val t0 = elapsedS
      val buf = scala.collection.mutable.LinkedHashMap
        .empty[String, (Double, Option[String])]
      var cut = false
      val it = order.iterator
      while (it.hasNext && !cut) {
        val name = it.next()
        if (elapsedS >= budgetS - BenchSchedule.FlushMarginS) cut = true
        // skip a query that predictably won't fit; cheaper ones
        // later in the rescue order may still fit, so keep walking
        else if (BenchSchedule.fitsQuery(first, bestOf(name),
            budgetS, elapsedS))
          buf(name) = once(fnByName(name))
      }
      sweepBuf += scala.collection.immutable.ListMap(buf.toSeq: _*)
      sweepWalls += elapsedS - t0
      val complete = buf.size == selected.size
      if (!complete) partialSweeps += 1
      complete
    }
    var i = 1
    while (i <= sweeps &&
        (i == 1 || BenchSchedule.startSweep(budgetS, elapsedS))) {
      runSweep(first = i == 1)
      progress(s"sweep $i/$sweeps")
      i += 1
    }
    val skippedSweeps = sweeps - sweepBuf.size
    // LOAD-ADAPTIVE extra sweep (r10 methodology hardening): when the
    // first sweep ran ≥1.5× the last — the signature of a host-load
    // window overlapping the early sweep — one additional sweep runs
    // so every query still gets ≥3 load-clean shots at its min.
    // Bounded at one extra, and gated on the wall-clock budget at the
    // FASTEST completed sweep's wall time (a loaded sweep must not
    // inflate the estimate and veto the quiet sweep — the r15 bug).
    val completeSweeps = sweepBuf.filter(_.size == selected.size)
    val loadRatio =
      if (completeSweeps.size >= 2 && totalOf(completeSweeps.last.values) > 0)
        totalOf(completeSweeps.head.values) / totalOf(completeSweeps.last.values)
      else 1.0
    val extraSweeps =
      if (BenchSchedule.extraSweep(loadRatio, sweepWalls.min,
          budgetS, elapsedS)) {
        runSweep(first = false)
        progress("extra sweep (load-adaptive)")
        1
      } else 0

    val perQuery = selected.map { case (name, _) =>
      val rs = sweepBuf.toSeq.flatMap(_.get(name))
      val ok = rs.collect { case (t, None) => t }
      val err = if (ok.nonEmpty || rs.isEmpty) None else rs.last._2
      (name, if (ok.nonEmpty) ok.min else -1.0, err, rs)
    }

    // locale-pinned: under a comma-decimal default locale the f""
    // interpolator would emit 1,234 and the artifact stops being JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    val ok = perQuery.filter(q => q._2 >= 0 && q._3.isEmpty)
    val errored = perQuery.filter(_._3.nonEmpty)
    val notRun = perQuery.filter(q => q._4.isEmpty)
    val qs = ok.map { case (k, v, _, _) => s"\"${esc(k)}\":" + num(v) }
      .mkString("{", ",", "}")
    val errs = errored.map { case (k, _, e, _) =>
      s"\"${esc(k)}\":\"${esc(e.get)}\"" }.mkString("{", ",", "}")
    val runsJson = perQuery.filter(_._4.nonEmpty).map { case (k, _, _, rs) =>
      s"\"${esc(k)}\":" + rs.map {
        case (t, None) => num(t)
        case _ => "-1"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-sweep raw sums over the runs that succeeded in that sweep
    // (n_ok alongside, so sweeps stay comparable when a run errored
    // or a budget stop cut the sweep short)
    val sweepTotals = sweepBuf.toSeq.map(rs => totalOf(rs.values))
    val sweepOk = sweepBuf.toSeq.map(_.values.count(_._2.isEmpty))
    val composite = ok.map(_._2).sum
    // "sweeps" is the TOTAL run count (configured + adaptive extra −
    // budget-skipped); "partial_sweeps" counts sweeps a budget stop
    // cut short (their completed runs still feed every min);
    // "skipped_sweeps" counts configured sweeps never started.
    val base =
      s""""unit":"sec","sweeps":${sweepBuf.size},""" +
      s""""extra_sweeps":$extraSweeps,"skipped_sweeps":$skippedSweeps,""" +
      s""""partial_sweeps":$partialSweeps,""" +
      s""""bench_fast":${if (BenchMode.fast) 1 else 0},""" +
      s""""load_ratio":${num(loadRatio)},""" +
      s""""total_composite":${num(composite)},""" +
      s""""sweep_totals":${sweepTotals.map(t => num(t)).mkString("[", ",", "]")},""" +
      s""""sweep_n_ok":${sweepOk.mkString("[", ",", "]")},""" +
      s""""sweep_walls":${sweepWalls.map(t => num(t)).mkString("[", ",", "]")},""" +
      s""""methodology":"per-query min over ${sweepBuf.size} interleaved sweeps""" +
      s""" ($sweeps configured, $extraSweeps load-adaptive, $partialSweeps cut by the budget's""" +
      s""" graceful mid-sweep stop; rescue sweeps walk descending best-time); raw timings in runs[query][attempt]""""
    // COMPACT line FIRST and LAST (r16): every driver artifact since
    // r5 came back `parsed: null` because the full runs-matrix line
    // outgrew the capture, and capture direction has varied by round —
    // the short headline line brackets the full one so either a head
    // or a tail capture contains a parseable record.
    val top10 = ok.sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => s"\"${esc(k)}\":" + num(v) }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${num(composite)},$base,"n_queries":${ok.size},"n_errors":${errored.size},"n_not_run":${notRun.size},"top10":$top10,"sf":"$sfDir"}"""
    println(compact)
    println(s"""{"metric":"total","value":${num(composite)},$base,"queries":$qs,"runs":$runsJson,"errors":$errs,"sf":"$sfDir"}""")
    println(compact)
    spark.stop()
    if (errored.nonEmpty) sys.exit(1)
  }
}
