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
  * end-to-end (default 3, `SPARK_GRAFT_SWEEPS` to override), so the
  * repeats of any one query are minutes apart and a single load
  * window can poison at most one of them. Reported per-query time is
  * the cross-sweep MIN; the headline `value` is `total_composite` =
  * Σ per-query min — the number a quiet host reproduces.
  *
  * The artifact is self-defending: `runs` carries every raw timing
  * (per sweep, -1 for an errored run) and `sweep_totals` the raw
  * per-sweep sums, so a reader can see host-load windows (one sweep
  * elevated, composite unaffected) without any prose appendix. A
  * query is an error only if it fails in EVERY sweep — and errors are
  * excluded from every total (a crash must not register as fast).
  * When sweep 1 runs ≥1.5× the final sweep (a load window overlapping
  * the start), ONE extra sweep runs automatically and the artifact
  * records `extra_sweeps`/`load_ratio` — the r10 "keep the bench
  * honest under load" hardening.
  *
  * BUDGET (the r14 lesson — BENCH_r14.json is `rc: 124`, the driver
  * killed the 3-sweep run mid-stage and the round closed with no
  * bench artifact at all): the default is now TWO interleaved sweeps
  * — the cross-sweep-min methodology needs ≥ 2 to reject a load
  * window, and the third sweep's marginal noise rejection is not
  * worth losing the artifact. The load-adaptive extra sweep stays,
  * but gated on the wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_S`,
  * default 1500 s): it only runs if the elapsed time plus one more
  * sweep (estimated at the slowest sweep so far) fits. Output
  * ordering is part of the contract too: the COMPACT summary line
  * prints FIRST (every round since r5 recorded `parsed: null`
  * because the full runs-matrix line outgrew the driver's capture —
  * the compact line is the de-facto artifact), the full line second,
  * and per-sweep progress lines go to STDERR so stdout stays a
  * clean JSON record even when the process is killed mid-run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "2").toInt
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1500").toDouble
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
    val sweepBuf =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(Double, Option[String])]]
    def totalOf(rs: Seq[(Double, Option[String])]): Double =
      rs.collect { case (t, None) => t }.sum
    // per-sweep progress on STDERR: a killed run still leaves a
    // human-readable record of how far it got and what each completed
    // sweep cost, without polluting the stdout JSON contract
    def progress(tag: String): Unit = {
      val rs = sweepBuf.last
      System.err.println(f"[bench] $tag done: sweep_total=${totalOf(rs)}%.1f s, " +
        f"n_ok=${rs.count(_._2.isEmpty)}/${rs.size}, elapsed=$elapsedS%.1f s")
    }
    // budget-aware sweep loop: after sweep 1, a further sweep only
    // runs if the elapsed time plus one more sweep (estimated at the
    // slowest sweep so far) fits the budget — a severely loaded host
    // degrades to a 1-sweep artifact instead of a mid-sweep kill
    // with no artifact at all (the r14 failure)
    var i = 1
    while (i <= sweeps &&
        (i == 1 || elapsedS + sweepBuf.map(totalOf).max < budgetS)) {
      sweepBuf += selected.map { case (_, fn) => once(fn) }
      progress(s"sweep $i/$sweeps")
      i += 1
    }
    val skippedSweeps = sweeps - sweepBuf.size
    // LOAD-ADAPTIVE extra sweep (r10 methodology hardening): when the
    // first sweep ran ≥1.5× the last — the signature of a host-load
    // window overlapping the early sweep — one additional sweep runs
    // so every query still gets ≥3 load-clean shots at its min. Bounded
    // at one extra, and (r15) gated on the wall-clock budget: an extra
    // sweep that would blow past the driver's kill window trades the
    // whole artifact for marginal noise rejection — never worth it.
    val loadRatio =
      if (sweepBuf.size >= 2 && totalOf(sweepBuf.last) > 0)
        totalOf(sweepBuf.head) / totalOf(sweepBuf.last)
      else 1.0
    val worstSweepS = sweepBuf.map(totalOf).max
    val extraSweeps =
      if (loadRatio > 1.5 && elapsedS + worstSweepS < budgetS) {
        sweepBuf += selected.map { case (_, fn) => once(fn) }
        progress("extra sweep (load-adaptive)")
        1
      } else 0
    val runsBySweep: Seq[Seq[(Double, Option[String])]] = sweepBuf.toSeq

    val perQuery = selected.zipWithIndex.map { case ((name, _), i) =>
      val rs = runsBySweep.map(_(i))
      val ok = rs.collect { case (t, None) => t }
      val err = if (ok.nonEmpty) None else rs.last._2
      (name, if (ok.nonEmpty) ok.min else -1.0, err, rs)
    }

    // locale-pinned: under a comma-decimal default locale the f""
    // interpolator would emit 1,234 and the artifact stops being JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    val ok = perQuery.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _, _) => s"\"${esc(k)}\":" + num(v) }
      .mkString("{", ",", "}")
    val errs = perQuery.collect { case (k, _, Some(e), _) =>
      s"\"${esc(k)}\":\"${esc(e)}\"" }.mkString("{", ",", "}")
    val runsJson = perQuery.map { case (k, _, _, rs) =>
      s"\"${esc(k)}\":" + rs.map {
        case (t, None) => num(t)
        case _ => "-1"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-sweep raw sums over the runs that succeeded in that sweep
    // (n_ok alongside, so sweeps stay comparable when a run errored)
    val sweepTotals = runsBySweep.map(rs =>
      rs.collect { case (t, None) => t }.sum)
    val sweepOk = runsBySweep.map(_.count(_._2.isEmpty))
    val composite = ok.map(_._2).sum
    // "sweeps" is the TOTAL run count — runs[query] has exactly this
    // many entries; a consumer iterating runs[query][0 until sweeps]
    // must see the adaptive extra sweep too. "extra_sweeps" records
    // load-triggered additions beyond the configured count;
    // "skipped_sweeps" records configured sweeps the budget guard
    // dropped (an over-budget host trades sweeps for the artifact).
    val base =
      s""""unit":"sec","sweeps":${runsBySweep.size},""" +
      s""""extra_sweeps":$extraSweeps,"skipped_sweeps":$skippedSweeps,""" +
      s""""load_ratio":${num(loadRatio)},""" +
      s""""total_composite":${num(composite)},""" +
      s""""sweep_totals":${sweepTotals.map(t => num(t)).mkString("[", ",", "]")},""" +
      s""""sweep_n_ok":${sweepOk.mkString("[", ",", "]")},""" +
      s""""methodology":"per-query min over $sweeps interleaved full sweeps""" +
      s""" + $extraSweeps load-adaptive (trigger: sweep1/sweepN > 1.5); raw timings in runs[query][sweep]""""
    // COMPACT line FIRST (r15): every driver artifact since r5 came
    // back `parsed: null` because the full runs-matrix line outgrew
    // the capture — the short headline line is the one a parser can
    // always swallow, so it leads. The full line follows for humans
    // and post-hoc analysis.
    val top10 = ok.sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => s"\"${esc(k)}\":" + num(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${num(composite)},$base,"n_queries":${ok.size},"n_errors":${perQuery.size - ok.size},"top10":$top10,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${num(composite)},$base,"queries":$qs,"runs":$runsJson,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (perQuery.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
