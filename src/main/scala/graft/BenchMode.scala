package graft

/** Session-wide switch distinguishing the TIMED bench surface from
  * the fidelity surfaces (Verify, ScalaTest, any user session).
  *
  * `fast = true` (set only by [[Bench]].main, default on there,
  * `SPARK_GRAFT_BENCH_FAST=0` to disable) authorizes HARNESS-COST
  * shortcuts that do not change any operator's plan or output
  * values:
  *
  *   - the `*_saved` artifact rows publish their trained artifact
  *     ONCE per (dataset, kind) per JVM and serve every later sweep
  *     from the same bytes ([[operators.IndexStore.sessionArtifact]])
  *     — the per-sweep cost becomes load+serve, which is what the
  *     rows exist to measure; the write path is still timed in the
  *     sweep that builds it, and Verify always rebuilds.
  *
  * Everything else — delivery counts, oracle-checked outputs, plan
  * shapes — is identical in both modes: a fast-mode result collected
  * by the driver would still hash-match the oracle.
  */
object BenchMode {
  @volatile var fast: Boolean = false
}

/** The bench budget scheduler's DECISIONS as pure functions, so the
  * r16 contract ("always try, stop gracefully" — the r15 1-sweep
  * disaster's fix) is unit-pinned instead of only observable on a
  * 20-minute run. [[Bench]] is the only caller. */
object BenchSchedule {
  /** Seconds reserved at the tail for flushing the JSON artifact. */
  val FlushMarginS = 15.0
  /** Minimum remaining budget for STARTING another configured sweep —
    * a partial quiet sweep rescues more per-query mins than no sweep,
    * so the bar is deliberately one short query's worth, not a full
    * sweep estimate (the r15 guard's inversion). */
  val MinStartS = 60.0

  /** Start the next configured sweep? */
  def startSweep(budgetS: Double, elapsedS: Double): Boolean =
    budgetS - elapsedS >= MinStartS

  /** Run this query now? First sweep runs everything up to the hard
    * deadline; rescue sweeps also skip queries that predictably
    * won't fit (1.5 × their best time so far) — later, cheaper
    * queries in the descending-cost walk may still fit. */
  def fitsQuery(first: Boolean, bestS: Option[Double],
      budgetS: Double, elapsedS: Double): Boolean = {
    val deadline = budgetS - FlushMarginS
    elapsedS < deadline &&
      (first || bestS.forall(b => elapsedS + 1.5 * b < deadline))
  }

  /** Rescue-sweep walk order: DESCENDING best-so-far time (never-ok
    * queries first — they have everything to gain), so a cut sweep
    * re-measures the biggest composite contributors before the
    * budget runs out. */
  def rescueOrder(names: Seq[String],
      bestS: String => Option[Double]): Seq[String] =
    names.sortBy(n => -bestS(n).getOrElse(Double.MaxValue))

  /** Admit the load-adaptive EXTRA sweep? Only on the load-window
    * signature (first complete sweep ≥ 1.5× the last) and only if a
    * FULL sweep fits, estimated at the FASTEST completed sweep's
    * wall-clock — a loaded sweep must not inflate the estimate and
    * veto the quiet sweep that would rescue the artifact (the r15
    * bug), and wall-clock includes the cache-clear/harness overhead
    * summed query seconds miss. */
  def extraSweep(loadRatio: Double, fastestWallS: Double,
      budgetS: Double, elapsedS: Double): Boolean =
    loadRatio > 1.5 && elapsedS + fastestWallS < budgetS - FlushMarginS
}
