package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the UNTIMED shared-cache prewarm set (VERDICT r16 #6): the
  * bench excludes these builds from per-query timings by design (they
  * are the once-per-corpus memoized artifacts every consumer reuses),
  * which is only honest while the set's membership is frozen and
  * visible. Growing it must be a deliberate edit to
  * Prewarm.SharedTableNames reviewed against this spec — never a
  * silent drift that quietly moves query cost into the untimed region.
  * The per-table build seconds travel in the bench report's
  * `prewarm_build_sec` field.
  */
class PrewarmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("the shared prewarm set is exactly the frozen name list") {
    val built = graft.queries.Prewarm.shared(spark, sf).map(_._1)
    assert(built == graft.queries.Prewarm.SharedTableNames,
      s"prewarm set drifted: built=$built vs " +
        s"pinned=${graft.queries.Prewarm.SharedTableNames} — if the " +
        "change is deliberate, update Prewarm.SharedTableNames AND " +
        "record the new untimed build in OPTIMIZATION notes")
  }

  test("every prewarm build succeeds (negative time = failed build)") {
    val times = graft.queries.Prewarm.shared(spark, sf)
    val failed = times.collect { case (n, t) if t < 0 => n }
    assert(failed.isEmpty, s"prewarm builds failed: $failed")
  }
}
