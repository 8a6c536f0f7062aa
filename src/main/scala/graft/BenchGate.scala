package graft

/** Load-robust perf-regression gate (r12 VERDICT #1).
  *
  * The r12 gate compared each query's min-of-2 against the prior
  * full-surface run and flagged >2x moves; its first driver run carried
  * box load and produced 8 false positives the judge had to adjudicate
  * by hand (every one returned to baseline at low load). A gate that
  * cries wolf under load eventually hides a real regression behind alarm
  * fatigue, so the r13 gate adjudicates automatically: after the main
  * pass finishes (and its load transient with it), every flagged query
  * is RE-MEASURED serially — min-of-2 again, nothing else running — and
  * a flag is demoted when the re-measurement returns to baseline. A real
  * regression re-measures slow (the code is slow, not the box) and stays
  * flagged; a load artifact re-measures fast and is demoted with its
  * numbers recorded. Both artifacts carry the run's loadavg so a flagged
  * round is readable in context.
  */
object BenchGate {

  /** One adjudicated flag: `first` is the main-pass timing, `remeasured`
    * the serial end-of-run timing (-1 when the re-run failed), `now` the
    * better of the two (the number the artifact reports), `confirmed`
    * whether the regression survives adjudication.
    */
  final case class Flag(name: String, prior: Double, first: Double,
      remeasured: Double, now: Double, confirmed: Boolean)

  /** The r11 flag rule: >2x move that also costs >0.3s absolute (the
    * fixed job-latency floor makes pure ratios on sub-0.3s queries
    * noise).
    */
  def isRegression(prior: Double, now: Double): Boolean =
    prior >= 0 && now >= 0 && now > 2.0 * prior && now - prior > 0.3

  /** Names flagged by the main pass, worst absolute move first. */
  def candidates(results: Map[String, Double],
      prior: Map[String, Double]): Seq[(String, Double, Double)] =
    results.toSeq.collect {
      case (k, v) if v >= 0 && prior.get(k).exists(p => isRegression(p, v)) =>
        (k, prior(k), v)
    }.sortBy { case (_, p, v) => p - v }

  /** Adjudicate the main pass: re-measure each candidate via `remeasure`
    * (serial min-of-2 timing; MUST run after the main pass so the load
    * transient that inflated the first number has drained) and keep the
    * flag only when the BEST of the two timings still regresses. The
    * min is the right merge: either timing can be load-inflated, and a
    * genuine slowdown lower-bounds both.
    */
  def adjudicate(results: Map[String, Double], prior: Map[String, Double],
      remeasure: String => Double): Seq[Flag] =
    candidates(results, prior).map { case (k, p, first) =>
      val r = remeasure(k)
      val now = if (r >= 0) math.min(first, r) else first
      Flag(k, p, first, r, now, confirmed = isRegression(p, now))
    }

  /** 1-minute system load average, or -1 when the platform hides it. */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
}
