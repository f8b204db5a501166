package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Analytics

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val news = Seq(
    ("n1", "t1", ts("2024-02-01 10:00:00"), "Politics"),
    ("n2", "t2", ts("2024-02-02 11:00:00"), "Politics"),
    ("n3", "t3", ts("2024-02-02 12:00:00"), "Tech"),
    ("n4", "t4", ts("2024-03-01 09:00:00"), "Health")
  ).toDF("id", "title", "published_time", "category")

  private lazy val actors = Seq(
    ("n1", "Alice", "politician", true),
    ("n1", "BBC News", "publisher", false),   // excluded: name ~ bbc
    ("n2", "Bob", "senior reporter", false),  // excluded: role ~ reporter
    ("n2", "Alice", "politician", true),
    ("n3", "Carol", null, false),             // null role must survive (na=False)
    ("n4", "Dave", "doctor", true)
  ).toDF("news_id", "actor_name", "actor_role", "is_main_actor")

  test("filterNews: category isin + date range (visualizer.py:87-91)") {
    val f = Analytics.filterNews(news, Seq("Politics", "Tech"),
      Date.valueOf("2024-02-01"), Date.valueOf("2024-02-28"))
    assert(f.select("id").collect().map(_.getString(0)).toSet == Set("n1", "n2", "n3"))
  }

  test("relevantActors: semi-join + negated contains with null-safe semantics (visualizer.py:93-99)") {
    val f = Analytics.filterNews(news, Seq("Politics", "Tech"),
      Date.valueOf("2024-02-01"), Date.valueOf("2024-02-28"))
    val out = Analytics.relevantActors(actors, f)
      .select("news_id", "actor_name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // pandas .str.contains(na=False) negated => null-role row KEPT
    assert(out == Set(("n1", "Alice"), ("n2", "Alice"), ("n3", "Carol")))
  }

  test("metrics: counts in one pass (visualizer.py:105-112)") {
    val m = Analytics.metrics(news, actors).collect()(0)
    assert(m.getLong(0) == 4)
    assert(m.getLong(1) == 5) // distinct actor names
    assert(m.getLong(2) == 3) // main actors
  }

  test("timeline groups by day (visualizer.py:115)") {
    val t = Analytics.timeline(news).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(t.toSeq == Seq(("2024-02-01", 1L), ("2024-02-02", 2L), ("2024-03-01", 1L)))
  }

  test("topActors deterministic tie-break (visualizer.py:136)") {
    val top = Analytics.topActors(actors, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("Alice", 2L))
    // ties broken by name asc
    assert(top.drop(1).map(_._1).toSeq == top.drop(1).map(_._1).sorted.toSeq)
  }

  test("detailView left join keeps articles without actors (visualizer.py:175-180)") {
    val noActors = Seq.empty[(String, String, String, Boolean)]
      .toDF("news_id", "actor_name", "actor_role", "is_main_actor")
    assert(Analytics.detailView(news, noActors).count() == 4)
    val dv = Analytics.detailView(news, actors)
    assert(dv.count() == 6) // one row per (article, actor) + none lost
  }

  test("Tables.events works in a session WITHOUT the nanosAsLong builder conf, and leaves the conf untouched") {
    // an isolated session whose conf does NOT carry the legacy flag —
    // the load must set it only for resolution and restore afterwards,
    // and execution (physical planning captures hadoopConf at action
    // time) must still read the timestamp[ns] column correctly
    val s2 = spark.newSession()
    s2.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val before = s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") // default: false
    assert(before == "false")
    val df = graft.engine.Tables.events(s2, "/root/testdata/sf0.001")
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == before,
      "load must not leak the legacy conf into the session")
    assert(df.count() > 0)
    // nanos-generation data converts to zoned timestamp; native
    // timestamp[us] reads as NTZ — both are micros-precision wall time
    assert(Set("timestamp", "timestamp_ntz")
      .contains(df.schema("ts").dataType.typeName))
  }

  test("Tables.events surfaces unrelated read failures as-is (retry only on the parquet-type rejection)") {
    // a missing path must throw ITS error, not a second read's under the
    // legacy conf masking the original cause
    val e = intercept[Exception] {
      graft.engine.Tables.events(spark, "/root/testdata/no-such-sf").collect()
    }
    val m = Option(e.getMessage).getOrElse("")
    assert(m.contains("PATH_NOT_FOUND") ||
      m.toLowerCase.contains("path does not exist"), m)
  }
}
