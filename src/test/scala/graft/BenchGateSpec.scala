package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the box-normalized regression-gate contract (VERDICT r13 #3).
  * The r14 live demos — an idle-box snapshot must produce zero false
  * flags, a genuine 3x regression must flag despite relax-only
  * scaling — are encoded here as permanent unit assertions over the
  * extracted arithmetic, so a future edit to the gate cannot silently
  * reintroduce either failure mode. */
class BenchGateSpec extends AnyFunSuite {

  // a snapshot in the EXACT roll format Bench writes (compact, no
  // whitespace), including a regression-entry object whose "name" and
  // "prev" fields must NOT pollute the parsed baseline
  private val snap =
    """{"metric":"total","value":76.7,"unit":"sec","queries":{"q_scan":0.2,""" +
      """"q_topk":0.35,"q_sbo_score":1.31},"over_budget":[],""" +
      """"regressed":[{"name":"q_fake","prev":9.9,"cur":19.9}],""" +
      """"calib":0.302,"box_scale":1.0,"sf":"/root/testdata/sf0.1"}"""

  test("parseSnapshot: same-tier snapshot yields queries + calib") {
    val (qs, c) = BenchGate.parseSnapshot(snap, "/root/testdata/sf0.1")
    assert(qs == Map("q_scan" -> 0.2, "q_topk" -> 0.35, "q_sbo_score" -> 1.31))
    assert(c.contains(0.302))
  }

  test("parseSnapshot: regression-entry objects do not pollute the baseline") {
    val (qs, _) = BenchGate.parseSnapshot(snap, "/root/testdata/sf0.1")
    assert(!qs.contains("q_fake"),
      "the flag list's name/prev fields leaked into the query baseline")
  }

  test("parseSnapshot: tier mismatch yields NO comparisons (not a partial set)") {
    assert(BenchGate.parseSnapshot(snap, "/root/testdata/sf0.01") ==
      (Map.empty, None))
  }

  test("parseSnapshot: legacy snapshot without calib parses queries, calib None") {
    val legacy = """{"queries":{"q_scan":0.2},"sf":"/root/testdata/sf0.1"}"""
    val (qs, c) = BenchGate.parseSnapshot(legacy, "/root/testdata/sf0.1")
    assert(qs == Map("q_scan" -> 0.2) && c.isEmpty)
  }

  test("parseSnapshot: a failed calibration (-1.0) is treated as absent") {
    val bad = """{"queries":{"q_scan":0.2},"calib":-1.0,"sf":"/root/testdata/sf0.1"}"""
    assert(BenchGate.parseSnapshot(bad, "/root/testdata/sf0.1")._2.isEmpty)
  }

  test("boxScale: relax-only — a faster current box clamps to 1.0") {
    assert(BenchGate.boxScale(0.15, Some(0.30)) == 1.0)
  }

  test("boxScale: slower box scales by the calibration ratio, capped at 3x") {
    assert(math.abs(BenchGate.boxScale(0.45, Some(0.30)) - 1.5) < 1e-9)
    assert(BenchGate.boxScale(3.0, Some(0.30)) == 3.0) // 10x -> cap
  }

  test("boxScale: missing or failed calibration on either side degrades to 1.0") {
    assert(BenchGate.boxScale(0.30, None) == 1.0)
    assert(BenchGate.boxScale(-1.0, Some(0.30)) == 1.0)
    assert(BenchGate.boxScale(0.30, Some(-1.0)) == 1.0)
  }

  test("isRegression: the same-box contract is unchanged at scale 1") {
    assert(BenchGate.isRegression(0.4, 0.81, 1.0))   // 0.4 -> 0.8 doubling
    assert(!BenchGate.isRegression(0.1, 0.25, 1.0))  // jitter band: delta < 0.3
    assert(!BenchGate.isRegression(0.4, 0.55, 1.0))  // < 1.5x
    assert(!BenchGate.isRegression(-1.0, 5.0, 1.0))  // failed prev never compares
  }

  test("isRegression: the r14 demo outcomes — idle snapshot does not flag, " +
      "a 3x regression flags despite the relaxed gate") {
    // demo (a): prev measured on a 2x-faster box (snapshot 0.65 s,
    // calib ratio -> scale ~2); current steady state 1.35 s is the SAME
    // plan under contention — must NOT flag
    val idleScale = BenchGate.boxScale(0.30, Some(0.151))
    assert(!BenchGate.isRegression(0.65, 1.35, idleScale))
    // demo (c): same-protocol 3x growth with a 1.42x-relaxed gate —
    // must STILL flag (relax-only scaling cannot mask a real regression)
    assert(BenchGate.isRegression(0.50, 1.50, 1.42))
  }

  test("gateCalib: the confirmed-flag gate sees the max of both probes " +
      "(VERDICT r14 #4 — the burst the start probe misses)") {
    // the r14 failure shape: start probe matched the snapshot (0.291 vs
    // 0.292) but the window was bursty; a confirm-pass probe at 0.60
    // must be the one the gate normalizes by
    assert(BenchGate.gateCalib(0.291, 0.60) == 0.60)
    assert(BenchGate.gateCalib(0.60, 0.291) == 0.60) // order-insensitive
    val burstScale =
      BenchGate.boxScale(BenchGate.gateCalib(0.291, 0.60), Some(0.292))
    assert(burstScale > 2.0, s"burst did not relax the gate: $burstScale")
    // a same-plan 2.1x transient (the r14 q_assortativity shape:
    // prev 1.50, confirm 3.12 in a window whose confirm probe shows
    // the burst) no longer mints a CONFIRMED flag...
    assert(!BenchGate.isRegression(1.50, 3.12, burstScale))
    // ...while a calm window (both probes matched) still flags it
    val calmScale =
      BenchGate.boxScale(BenchGate.gateCalib(0.291, 0.293), Some(0.292))
    assert(BenchGate.isRegression(1.50, 3.12, calmScale))
  }

  test("gateCalib: a failed probe on either side degrades to the other; " +
      "both failed degrades to scale 1.0") {
    assert(BenchGate.gateCalib(-1.0, 0.30) == 0.30)
    assert(BenchGate.gateCalib(0.30, -1.0) == 0.30)
    assert(BenchGate.boxScale(
      BenchGate.gateCalib(-1.0, -1.0), Some(0.30)) == 1.0)
  }

  test("shouldRoll: a contended full run must NOT become the comparison " +
      "base (VERDICT r14 #2 — the r14 driver window)") {
    // the r14 driver run: full set, zero failures, 1+10+2+19 = 32 flags
    // — rolled itself into the baseline and muted the next gate on
    // exactly the noisiest queries; must be rejected
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 32))
    // calm full runs (0-5 flags observed r11-r14) roll
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0))
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 5))
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0,
      nFlags = BenchGate.MaxRollFlags))
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0,
      nFlags = BenchGate.MaxRollFlags + 1))
  }

  test("shouldRoll: subset runs and failed runs never roll, however calm") {
    assert(!BenchGate.shouldRoll(fullSet = false, nFailed = 0, nFlags = 0))
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 1, nFlags = 0))
  }

  test("shouldRoll: a flag-clean run on a visibly slower box must NOT " +
      "replace a faster box's baseline (sustained contention is invisible " +
      "to flag counts because boxScale suppresses the flags)") {
    // the live r15 observation: calib 0.26 baseline, then a 0.355/0.432
    // window arrived flag-clean (box_scale 1.66 absorbed the slowdown)
    // and would have rolled its inflated numbers over the baseline
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 1,
      gateCalib = 0.432, prevCalib = Some(0.260)))
    // same-box drift (<= ~1.2 observed back-to-back) still rolls
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 1,
      gateCalib = 0.30, prevCalib = Some(0.260)))
    // a FASTER box always rolls (the healing direction)
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.21, prevCalib = Some(0.355)))
    // missing calibration on either side skips the criterion — a legacy
    // snapshot must remain replaceable, a failed probe must not wedge
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.50, prevCalib = None))
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = -1.0, prevCalib = Some(0.260)))
  }

  test("parseSnapshot: the r15 roll format (calib_confirm + rolled fields) " +
      "parses calib from the start probe only") {
    val r15 = """{"metric":"total","value":80.0,"unit":"sec","queries":""" +
      """{"q_scan":0.2},"calib":0.30,"calib_confirm":0.55,""" +
      """"box_scale":1.83,"rolled":true,"median_ratio":0.93,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    val (qs, c) = BenchGate.parseSnapshot(r15, "/root/testdata/sf0.1")
    assert(qs == Map("q_scan" -> 0.2),
      "median_ratio must not pollute the parsed query baseline")
    assert(c.contains(0.30),
      "calib_confirm must not shadow the start-probe calib")
  }

  test("medianRatio: a few-query regression cannot move the whole-workload " +
      "median; too few overlapping queries yields None") {
    val prev = (1 to 20).map(i => s"q_$i" -> 0.5).toMap
    // 18 queries at ~0.95x, two genuinely regressed 3x: median stays low
    val cur = (1 to 20).map(i =>
      s"q_$i" -> (if (i <= 2) 1.5 else 0.475))
    assert(BenchGate.medianRatio(cur, prev).contains(0.95))
    // failed queries (-1) and queries absent from the snapshot are
    // excluded from the evidence, not counted as ratios
    val curMixed = cur ++ Seq("q_new" -> 0.4, "q_21" -> -1.0)
    assert(BenchGate.medianRatio(curMixed, prev).contains(0.95))
    // a subset run below the overlap floor carries no workload claim
    assert(BenchGate.medianRatio(cur.take(BenchGate.MinMedianOverlap - 1),
      prev).isEmpty)
  }

  test("candidateScale: the r15 decoupled window (probe 2.83x, workload " +
      "median 0.93) must not blind the candidate sweep to a real 2x " +
      "regression") {
    // the live r15 numbers: fastest full run on record (median ratio
    // 0.93, 105/160 queries faster than the snapshot) while the CPU
    // probe read 0.598 vs snapshot 0.211 = 2.83x
    val clamped = BenchGate.candidateScale(2.83, Some(0.93))
    assert(clamped == 1.0)
    // a genuine 0.5 -> 1.0 s doubling IS a candidate under the clamp...
    assert(BenchGate.isRegression(0.5, 1.0, clamped))
    // ...and was INVISIBLE under the raw probe scale (the failure mode:
    // never collected, so never re-timed, so absent from the report)
    assert(!BenchGate.isRegression(0.5, 1.0, 2.83))
  }

  test("shouldRoll: workload path (VERDICT r15 #1) — the r15 driver window " +
      "(median 1.03, zero flags, probe calib 1.53x the snapshot's) rolls") {
    // the live wedge: 83.06 s, FASTER than the snapshot in total,
    // median_ratio 1.03, zero flags of any kind — refused purely on the
    // probe calib ratio 0.323/0.211 = 1.53x while the decoupled probe
    // profile persisted on the container class (4 probes, 2.5 h)
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.323, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(1.03)))
    // ...and the pre-r16 call shape (no workload evidence) still
    // refuses it — the calm path's calib criterion is unchanged
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.323, prevCalib = Some(0.211)))
  }

  test("shouldRoll: workload path — the 68 s window (median 0.86, " +
      "abnormally FAST) is still refused, as is sustained contention " +
      "(median above the band)") {
    // rolling the fast window would tighten the baseline ~14% below
    // calm-box level and mint false confirmed flags on the next normal
    // run (NOTES r15's rejection analysis — the band's lower bound)
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(0.86)))
    // sustained contention the median corroborates: no roll either
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(1.20)))
    // band edges inclusive
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(BenchGate.WorkloadRollBand._1)))
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(BenchGate.WorkloadRollBand._2)))
  }

  test("shouldRoll: workload path ignores TRANSIENT flags (ADVICE r15 #3 " +
      "— clamp-minted transients must not wedge rolls) but any CONFIRMED " +
      "flag blocks it") {
    // 30 transients under a decoupled-probe window, median normal: rolls
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 30,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 0, medianRatio = Some(1.02)))
    // one confirmed flag: the workload path closes; calm path's flag
    // count (30 > 8) and calib ratio both fail too — no roll
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 30,
      gateCalib = 0.55, prevCalib = Some(0.211),
      nConfirmed = 1, medianRatio = Some(1.02)))
    // subset and failed runs never roll, whatever the evidence
    assert(!BenchGate.shouldRoll(fullSet = false, nFailed = 0, nFlags = 0,
      nConfirmed = 0, medianRatio = Some(1.0)))
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 1, nFlags = 0,
      nConfirmed = 0, medianRatio = Some(1.0)))
  }

  test("shouldRoll: calm path requires EVERY probe family comparably fast " +
      "(VERDICT r15 #2 — the I/O family joins the criterion)") {
    // CPU probe matched but the I/O probe reads the box 1.67x slower:
    // sustained I/O contention must not roll over a faster box's base
    assert(!BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.21, prevCalib = Some(0.211),
      gateCalibIo = 0.50, prevCalibIo = Some(0.30)))
    // both families matched: rolls
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.21, prevCalib = Some(0.211),
      gateCalibIo = 0.31, prevCalibIo = Some(0.30)))
    // a legacy snapshot without calib_io skips the I/O criterion
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.21, prevCalib = Some(0.211),
      gateCalibIo = 0.50, prevCalibIo = None))
    // a failed I/O probe this run must not wedge the roll
    assert(BenchGate.shouldRoll(fullSet = true, nFailed = 0, nFlags = 0,
      gateCalib = 0.21, prevCalib = Some(0.211),
      gateCalibIo = -1.0, prevCalibIo = Some(0.30)))
  }

  test("parseCalib: extracts a named probe field, tier-gated, " +
      "failed-probe-filtered, and never cross-matches calib/calib_io") {
    val r16 = """{"metric":"total","value":80.0,"unit":"sec","queries":""" +
      """{"q_scan":0.2},"calib":0.30,"calib_confirm":0.55,""" +
      """"calib_io":0.42,"calib_io_confirm":0.44,""" +
      """"box_scale":1.0,"rolled":true,"sf":"/root/testdata/sf0.1"}"""
    assert(BenchGate.parseCalib(r16, "/root/testdata/sf0.1", "calib_io")
      .contains(0.42))
    // "calib" must still resolve to the start CPU probe, not calib_io
    assert(BenchGate.parseCalib(r16, "/root/testdata/sf0.1", "calib")
      .contains(0.30))
    assert(BenchGate.parseSnapshot(r16, "/root/testdata/sf0.1")
      ._2.contains(0.30))
    // tier mismatch and missing/failed fields degrade to None
    assert(BenchGate.parseCalib(r16, "/root/testdata/sf0.01", "calib_io").isEmpty)
    assert(BenchGate.parseCalib(snap, "/root/testdata/sf0.1", "calib_io").isEmpty)
    val failed = """{"queries":{"q_scan":0.2},"calib_io":-1.0,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(BenchGate.parseCalib(failed, "/root/testdata/sf0.1", "calib_io").isEmpty)
  }

  test("candidateScale: sustained contention the median corroborates " +
      "still relaxes; a matched probe cannot be raised by the median") {
    // probe and workload agree the box is slower: clamp to the
    // workload's own figure (the more honest of the two)
    assert(BenchGate.candidateScale(1.66, Some(1.13)) == 1.13)
    // relax-only: a faster-box median (<1) clamps to 1.0, never below
    assert(BenchGate.candidateScale(1.66, Some(0.80)) == 1.0)
    // the r14 burst shape (start probe matched the snapshot): min()
    // cannot RAISE the scale above the probe's 1.0 — burst handling
    // stays with the confirm-pass gate, not the candidate sweep
    assert(BenchGate.candidateScale(1.0, Some(1.40)) == 1.0)
    // no workload evidence (subset run): the probe scale stands
    assert(BenchGate.candidateScale(2.83, None) == 2.83)
  }
}
