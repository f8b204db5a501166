package graft

/** The pure arithmetic and snapshot parsing behind Bench's regression
  * gate, extracted from the timing main so the box-normalization
  * contract is pinned by a unit spec (BenchGateSpec) — the gate demo
  * runs of r14 (idle-snapshot comparison must not flag; a 3x
  * regression must flag despite relax-only scaling) live here as
  * permanent assertions instead of one-off measurements.
  *
  * Background (VERDICT r13 #3): regression baselines cross boxes — a
  * contended driver run compared against an idle-box snapshot flagged
  * 14 queries of which 3 were real. Each full Bench run therefore
  * times a fixed CPU-bound calibration probe and persists it in the
  * rolled snapshot; the next run scales the gate's thresholds by the
  * box slowdown ratio so `regressed` measures plans, not boxes.
  */
private[graft] object BenchGate {

  /** Parse a rolled snapshot: per-query seconds + the calibration
    * figure — but ONLY when the snapshot's sf dir matches this run's
    * (a mismatched tier yields zero comparisons and the next same-tier
    * roll heals it). The format matched is the exact roll format Bench
    * writes (compact JSON, no whitespace around ':'); anything else —
    * including a hand-edited file — parses to empty rather than to a
    * partial, misleading baseline. Names inside regression-entry
    * objects (`"name":"q_x","prev":…`) do NOT match the query pattern
    * (no `":"number` follows the name there), so a snapshot's own flag
    * lists never pollute the baseline. */
  def parseSnapshot(txt: String, sfDir: String): (Map[String, Double], Option[Double]) = {
    val prevSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    if (!prevSf.contains(sfDir)) (Map.empty, None)
    else {
      val qs = """"(q_[a-z0-9_]+)":(-?[0-9][0-9.eE+-]*)""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      val c = """"calib":(-?[0-9][0-9.eE+-]*)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble).filter(_ > 0)
      (qs, c)
    }
  }

  /** Box-provenance scale: the ratio of this run's calibration time to
    * the snapshot's, RELAX-ONLY (a faster current box must not tighten
    * the gate below its absolute thresholds — real regressions still
    * have to clear them un-shrunk) and capped at 3x so a pathological
    * calibration sample can never mask a genuine plan regression
    * outright. Missing calibration on either side (legacy snapshot,
    * failed probe) degrades to 1.0 — the exact pre-r14 behavior. */
  def boxScale(curCalib: Double, prevCalib: Option[Double]): Double =
    (for { p <- prevCalib; if p > 0 && curCalib > 0 }
      yield math.min(math.max(curCalib / p, 1.0), 3.0)).getOrElse(1.0)

  /** A regression grew BOTH >1.5x and >0.3 s vs the previous full
    * same-tier run, with both thresholds stretched by the box scale —
    * the two-sided gate keeps the ~0.2 s scheduling-jitter band on
    * sub-second queries from flagging noise while still catching a
    * 0.4 -> 0.8 s doubling on the same box. */
  def isRegression(prev: Double, cur: Double, scale: Double): Boolean =
    prev >= 0 && cur > 1.5 * prev * scale && cur - prev * scale > 0.3
}
