package graft

/** Pure cross-round drift/regression gate, factored out of [[Bench]] so its
  * behavior is unit-testable without a Spark session (r17 verdict ask #1d:
  * "a synthetic +3x slowdown injected into one operator on a drifting box is
  * caught by the gate in a test").
  *
  * Two r17 gate defects are fixed here:
  *
  *  1. '''Control-set drift normalization.''' The old gate normalized by the
  *     median warm/baseline ratio over ALL entries, so a code change that
  *     slowed most operators uniformly (a shared-helper regression in
  *     GraftSession/Tables/LoopFrames) was indistinguishable from machine
  *     drift and fired no gate. The normalizer now comes ONLY from a pinned
  *     control population — the `q*`/`f*` relational/scalar trivials, pure
  *     Spark SQL untouched for 10+ rounds — which drifts with the machine
  *     but cannot drift with operator code. A shared-helper regression moves
  *     the p/s entries but not the q/f controls, so it now surfaces as a
  *     broad regression list instead of being normalized away.
  *  2. '''Drift-ratio sanity alarm''' (ADVICE r17): a control-set ratio
  *     outside [0.4, 2.5] means the box (or the harness itself) is too sick
  *     for normalized gating to mean anything — the verdict record carries
  *     an explicit `drift_alarm` instead of silently scaling baselines by a
  *     wild factor.
  *
  * Thresholds: a regression is warm > 2x the drift-scaled baseline AND
  * >0.5 s absolute growth; a wobble is > band-x in either direction with
  * >0.5 s absolute movement, where band = max(1.5, control-ratio q75/q25)
  * — the band widens exactly as much as the box's own unchanged controls
  * dispersed (r19, VERDICT r18 ask #8). On drift alarm the gate scales by
  * 1.0, not the wild measured ratio (r19, ADVICE r18).
  */
object BenchGate {

  /** Short ids in the pinned control population: `q1..q45` relational and
    * `f1..f17` scalar-function entries. They are recognized by shape
    * (`^[qf]\d+$`) so new q/f entries join the controls automatically; an
    * entry whose WORKLOAD is redefined must be listed in
    * [[Bench.RedefinedQueries]], which removes it from both the baselines
    * and the controls.
    */
  def isControl(shortId: String): Boolean =
    shortId.length >= 2 && (shortId(0) == 'q' || shortId(0) == 'f') &&
      shortId.drop(1).forall(_.isDigit)

  /** Mid-weight shuffle-bound canary ids (r20, VERDICT r19 ask #3). The
    * q/f scan controls are sub-second and scan-bound, so they read 1.0x on
    * a box whose sustained-parallel-shuffle throughput has degraded 2-3x —
    * the exact dimension the heavy iterative entries drift along (README
    * r19 measurement notes). q46/q47 are pinned pure-SQL shuffle workloads
    * (multiplied high-cardinality hash agg / multiplied sort-merge join,
    * ~2-5 s at sf0.1, code never to change) whose median ratio is reported
    * separately as `canaryRatio`. They are EXCLUDED from the scan-control
    * normalizer so the two dimensions stay independently measurable: flat
    * scan controls + moved canaries = throughput drift, not code.
    */
  val CanaryIds: Set[String] = Set("q46", "q47")

  /** Sanity bounds for the control-drift ratio (ADVICE r17). */
  val DriftAlarmLow = 0.4
  val DriftAlarmHigh = 2.5

  /** Minimum control entries with a usable baseline before the measured
    * ratio is trusted over 1.0. 62 q/f entries exist; requiring 8 keeps the
    * gate alive on partial baselines without letting 2-3 noisy points set
    * the normalizer.
    */
  val MinControls = 8

  /** @param globalRatio  MEASURED control-set median ratio (reporting)
    * @param gatingRatio  the ratio the gates actually scale baselines by:
    *                     1.0 on drift alarm, else `globalRatio`. Callers
    *                     doing their own confirm/clear math (Bench's
    *                     fork-phase verdicts) MUST use this one — scaling
    *                     by the wild measured ratio after the alarm declared
    *                     it meaningless re-normalizes real regressions away
    *                     (ADVICE r19 #2).
    * @param canaryRatio  median warm/baseline ratio over the shuffle-bound
    *                     [[CanaryIds]]; None until the canaries have a
    *                     committed baseline. Reported, not used for gating.
    */
  final case class Verdict(globalRatio: Double,
                           controlCount: Int,
                           driftAlarm: Boolean,
                           regressions: Seq[String],
                           wobbles: Seq[String],
                           gatingRatio: Double,
                           canaryRatio: Option[Double],
                           canaryCount: Int)

  /** Evaluate the swept warm times against a prior-round baseline.
    *
    * @param warm     this round's warm seconds, keyed by FULL query name
    *                 (`p114_weighted_pagerank`); failed queries absent
    * @param baseline prior-round warm seconds keyed by SHORT id (`p114`),
    *                 already filtered of prior stalls/redefined entries
    */
  def evaluate(warm: Seq[(String, Double)],
               baseline: Map[String, Double]): Verdict = {
    def base(n: String): Option[Double] =
      baseline.get(n.split("_").head).filter(_ > 0)
    val controlRatios = warm.flatMap { case (n, wv) =>
      val id = n.split("_").head
      // the >0.2 s floor keeps sub-noise-floor controls (0.05 s -> 0.12 s is
      // scheduler jitter, not drift) from setting the normalizer; canaries
      // are the throughput dimension, kept out of the scan normalizer
      if (isControl(id) && !CanaryIds(id)) base(n).filter(_ > 0.2).map(wv / _)
      else None
    }.sorted
    val canaryRatios = warm.flatMap { case (n, wv) =>
      val id = n.split("_").head
      if (CanaryIds(id)) base(n).filter(_ > 0.2).map(wv / _) else None
    }.sorted
    val canaryRatio =
      if (canaryRatios.isEmpty) None
      else Some(canaryRatios(canaryRatios.length / 2))
    val measuredRatio =
      if (controlRatios.length < MinControls) 1.0
      else controlRatios(controlRatios.length / 2)
    val alarm = controlRatios.length >= MinControls &&
      (measuredRatio < DriftAlarmLow || measuredRatio > DriftAlarmHigh)
    // On alarm the measured ratio is REPORTED but not USED: scaling
    // baselines by a wild factor normalizes away real regressions of the
    // same magnitude (a "3x-sick box" that is actually a 3x shared-helper
    // regression would flag nothing). Gating falls back to ratio 1.0 so
    // the flags err toward over-reporting; the alarm bit tells the reader
    // every flag needs fresh-JVM adjudication (ADVICE r18).
    val ratio = if (alarm) 1.0 else measuredRatio
    val regressions = warm.collect {
      case (n, wv) if base(n).exists(p =>
        wv > 2 * p * ratio && wv - p * ratio > 0.5) => n
    }
    // The wobble band widens with CONTROL-SET DISPERSION, not just its
    // median: on a sick box the q75/q25 spread of the control ratios grows
    // (r18: 26 wobbles at 1.35x drift vs 14 on a quiet box — pure
    // dispersion, same code), and a fixed 1.5x band then stamps sweep
    // noise. The band is max(1.5, q75/q25 of the control ratios), so a
    // quiet box keeps the 1.5x sensitivity and a noisy one widens exactly
    // as much as its own unchanged controls moved (VERDICT r18 ask #8).
    val band = if (controlRatios.length < MinControls) 1.5 else {
      val q25 = controlRatios(controlRatios.length / 4)
      val q75 = controlRatios(3 * controlRatios.length / 4)
      math.max(1.5, if (q25 > 0) q75 / q25 else 1.5)
    }
    val wobbles = warm.collect {
      case (n, wv) if base(n).exists { p0 =>
        val p = p0 * ratio
        (wv > band * p || wv < p / band) && math.abs(wv - p) > 0.5
      } => n
    }.filterNot(regressions.contains)
    Verdict(measuredRatio, controlRatios.length, alarm, regressions, wobbles,
      gatingRatio = ratio, canaryRatio = canaryRatio,
      canaryCount = canaryRatios.length)
  }
}
