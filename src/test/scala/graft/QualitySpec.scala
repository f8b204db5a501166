package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Quality

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observeIngest rides the job: counts + freshness, no extra pass") {
    val df = Seq(
      (Some("a"), Some(java.sql.Timestamp.valueOf("2024-02-01 10:00:00"))),
      (None, Some(java.sql.Timestamp.valueOf("2024-02-02 10:00:00"))),
      (Some("c"), None))
      .toDF("id", "ts")
    val (instrumented, obs) = Quality.observeIngest(df, "id", "ts")
    // the action that triggers metrics is the NORMAL downstream action
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("null_keys") == 1L)
    assert(m("null_times") == 1L)
    assert(m("min_time").toString.startsWith("2024-02-01"))
    assert(m("max_time").toString.startsWith("2024-02-02"))
  }
}
