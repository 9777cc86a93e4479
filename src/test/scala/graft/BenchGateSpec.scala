package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the pure cross-round bench gate (r17 verdict ask #1d).
  * No Spark session needed — the gate is arithmetic over (name, seconds)
  * pairs, which is exactly why it was factored out of Bench.main.
  */
class BenchGateSpec extends AnyFunSuite {

  // 12 controls (q/f trivials) + 3 operators, baselines keyed by short id
  private val controls: Seq[String] =
    (1 to 8).map(i => s"q${i}_rel") ++ (1 to 4).map(i => s"f${i}_fn")
  private val baseline: Map[String, Double] =
    (controls.map(_.split("_").head -> 1.0) ++
      Seq("p10" -> 4.0, "p11" -> 2.0, "s5" -> 3.0)).toMap

  /** Warm times at a uniform machine-drift multiple; per-operator code
    * regressions multiply ON TOP of the drift (a real plan regression rides
    * whatever the box is doing).
    */
  private def warmAt(controlX: Double, opX: Map[String, Double]): Seq[(String, Double)] =
    controls.map(n => n -> controlX * baseline(n.split("_").head)) ++
      Seq("p10_graph" -> opX.getOrElse("p10", 1.0) * controlX * 4.0,
          "p11_dedup" -> opX.getOrElse("p11", 1.0) * controlX * 2.0,
          "s5_script" -> opX.getOrElse("s5", 1.0) * controlX * 3.0)

  test("synthetic 3x slowdown on one operator is caught through 1.5x machine drift") {
    // the r17 'done =' criterion: box drifts 1.5x uniformly (controls all
    // move), one operator additionally regresses to 3x its baseline
    val v = BenchGate.evaluate(warmAt(1.5, Map("p10" -> 3.0)), baseline)
    assert(math.abs(v.globalRatio - 1.5) < 1e-9)
    assert(!v.driftAlarm)
    assert(v.regressions == Seq("p10_graph"))
  }

  test("uniform machine drift alone fires nothing") {
    val v = BenchGate.evaluate(warmAt(1.8, Map.empty), baseline)
    assert(math.abs(v.globalRatio - 1.8) < 1e-9)
    assert(v.regressions.isEmpty && v.wobbles.isEmpty)
  }

  test("shared-helper regression (operators slow, controls flat) is NOT normalized away") {
    // the r17 blind spot: a change to shared infrastructure slows every
    // operator ~2.5x but cannot touch the pinned q/f controls — the old
    // all-entries median would have absorbed it when operators outnumber
    // controls; the control-set normalizer keeps ratio at 1.0 and flags all
    val v = BenchGate.evaluate(warmAt(1.0, Map("p10" -> 2.5, "p11" -> 2.5, "s5" -> 2.5)), baseline)
    assert(math.abs(v.globalRatio - 1.0) < 1e-9)
    assert(v.regressions.toSet == Set("p10_graph", "p11_dedup", "s5_script"))
  }

  test("control drift outside sanity bounds raises the alarm (ADVICE r17)") {
    val hot = BenchGate.evaluate(warmAt(3.0, Map.empty), baseline)
    assert(hot.driftAlarm && math.abs(hot.globalRatio - 3.0) < 1e-9)
    val cold = BenchGate.evaluate(warmAt(0.3, Map.empty), baseline)
    assert(cold.driftAlarm)
    assert(BenchGate.evaluate(warmAt(2.4, Map.empty), baseline).driftAlarm === false)
  }

  test("on alarm the gate scales by 1.0, not the wild ratio (ADVICE r18)") {
    // a uniform 3x move could be a sick box OR a 3x everything-regression;
    // an alarmed record must over-report (flag the moved entries) rather
    // than normalize them away with the 3x it just declared meaningless
    val v = BenchGate.evaluate(warmAt(3.0, Map.empty), baseline)
    assert(v.driftAlarm)
    assert(v.regressions.nonEmpty)
    assert(v.regressions.contains("p10_graph"))
  }

  test("wobble band widens with control-set dispersion (VERDICT r18 #8)") {
    // 7 controls at 1.0x, 5 at 2.0x: median ratio 1.0, q75/q25 band = 2.0.
    // An operator at 1.8x moved LESS than the box's own control spread, so
    // it is not stamped; on a quiet box (uniform controls) 1.8x still is.
    val spread = controls.take(7).map(n => n -> baseline(n.split("_").head)) ++
      controls.drop(7).map(n => n -> 2.0 * baseline(n.split("_").head)) ++
      Seq("p10_graph" -> 1.8 * 4.0)
    val v = BenchGate.evaluate(spread, baseline)
    assert(math.abs(v.globalRatio - 1.0) < 1e-9 && !v.driftAlarm)
    assert(!v.wobbles.contains("p10_graph"))
    val quiet = BenchGate.evaluate(warmAt(1.0, Map("p10" -> 1.8)), baseline)
    assert(quiet.wobbles.contains("p10_graph"))
  }

  test("too few usable controls falls back to ratio 1.0, no alarm") {
    val few = Seq("q1_rel" -> 5.0, "p10_graph" -> 9.0)
    val v = BenchGate.evaluate(few, Map("q1" -> 1.0, "p10" -> 4.0))
    assert(v.globalRatio == 1.0 && v.controlCount == 1 && !v.driftAlarm)
    // with ratio pinned at 1.0 genuine growth still gates — including the
    // control's own 5x (controls are normalizer inputs, not gate-exempt)
    assert(v.regressions == Seq("q1_rel", "p10_graph"))
  }

  test("sub-floor controls cannot set the normalizer") {
    // controls under 0.2 s baseline are scheduler jitter, not drift signal
    val tiny = (1 to 10).map(i => s"q${i}_x" -> 0.45) ++ Seq("p10_g" -> 4.2)
    val base = (1 to 10).map(i => s"q$i" -> 0.15).toMap + ("p10" -> 4.0)
    val v = BenchGate.evaluate(tiny, base)
    assert(v.controlCount == 0 && v.globalRatio == 1.0)
  }

  test("wobble detector: >1.5x either direction, >0.5s absolute, not already a regression") {
    val v = BenchGate.evaluate(warmAt(1.0, Map("p10" -> 1.8, "p11" -> 0.5)), baseline)
    assert(v.regressions.isEmpty)
    assert(v.wobbles.toSet == Set("p10_graph", "p11_dedup"))
  }

  test("absolute 0.5s floor keeps small-entry noise out of both gates") {
    val v = BenchGate.evaluate(
      Seq("p20_small" -> 0.3) ++ warmAt(1.0, Map.empty),
      baseline + ("p20" -> 0.1))
    assert(!v.regressions.contains("p20_small") && !v.wobbles.contains("p20_small"))
  }

  test("control-id shape: q/f + digits only") {
    assert(BenchGate.isControl("q1") && BenchGate.isControl("f17"))
    assert(!BenchGate.isControl("p114") && !BenchGate.isControl("s49") &&
      !BenchGate.isControl("q") && !BenchGate.isControl("q1a"))
  }

  // ---- r20: shuffle-bound canary dimension (VERDICT r19 ask #3) ----

  private val canaryBase = baseline ++ Map("q46" -> 3.0, "q47" -> 4.0)
  private def withCanaries(canaryX: Double, controlX: Double = 1.0) =
    warmAt(controlX, Map.empty) ++
      Seq("q46_canary_shuffle" -> canaryX * 3.0,
          "q47_canary_join" -> canaryX * 4.0)

  test("heavy-only slowdown with flat scan controls moves the canary ratio") {
    // the r19 blind spot: sustained-parallel-throughput degradation slowed
    // every heavy shuffle-bound entry 2-3x while the sub-second scan
    // controls read 1.0x, so the drift gate could neither exonerate nor
    // convict. The canaries now measure that dimension directly.
    val v = BenchGate.evaluate(withCanaries(canaryX = 2.5), canaryBase)
    assert(math.abs(v.globalRatio - 1.0) < 1e-9 && !v.driftAlarm)
    assert(v.canaryCount == 2)
    assert(math.abs(v.canaryRatio.get - 2.5) < 1e-9)
    // and at gating ratio 1.0 the moved canaries themselves flag
    assert(v.regressions.toSet ==
      Set("q46_canary_shuffle", "q47_canary_join"))
  }

  test("canaries are excluded from the scan-control normalizer") {
    // two canaries at 3x must not drag the scan-drift median: the two
    // dimensions stay independently measurable
    val v = BenchGate.evaluate(withCanaries(canaryX = 3.0), canaryBase)
    assert(math.abs(v.globalRatio - 1.0) < 1e-9)
    assert(v.controlCount == 12) // the q/f trivials only, no q46/q47
  }

  test("quiet canaries read ~1.0 and fire nothing") {
    val v = BenchGate.evaluate(withCanaries(canaryX = 1.0), canaryBase)
    assert(math.abs(v.canaryRatio.get - 1.0) < 1e-9)
    assert(v.regressions.isEmpty && v.wobbles.isEmpty)
  }

  test("no canary baseline yet -> canaryRatio None, nothing else changes") {
    val v = BenchGate.evaluate(withCanaries(canaryX = 1.0), baseline)
    assert(v.canaryRatio.isEmpty && v.canaryCount == 0)
  }

  // ---- r20: gatingRatio threading (ADVICE r19 #2) ----

  test("gatingRatio is 1.0 on alarm, the measured ratio otherwise") {
    val quiet = BenchGate.evaluate(warmAt(1.8, Map.empty), baseline)
    assert(!quiet.driftAlarm && math.abs(quiet.gatingRatio - 1.8) < 1e-9)
    val sick = BenchGate.evaluate(warmAt(3.0, Map.empty), baseline)
    assert(sick.driftAlarm && sick.gatingRatio == 1.0 &&
      math.abs(sick.globalRatio - 3.0) < 1e-9)
  }
}
