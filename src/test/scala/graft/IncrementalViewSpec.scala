package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{IncrementalView, VersionedParquetSink}

/** The CDF consumer path: a per-key aggregate view maintained from
  * changesBetween must equal a full recompute after every refresh —
  * across appends, compactions (fast path), deletes and merges (diff
  * path), including replayed refreshes. */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the documented reference semantics: sum(coalesce(v, 0)) — an
  // incremental maintainer cannot reproduce SQL's null-skipping sum for
  // all-NULL keys without extra per-key state (see IncrementalView doc)
  private def fullRecompute(src: DataFrame): DataFrame =
    src.groupBy("k").agg(count(lit(1)).as("n"),
      sum(coalesce(col("v"), lit(0)).cast("decimal(18,2)")).as("total"))

  private def assertViewMatches(sink: VersionedParquetSink): Unit = {
    val view = sink.read(spark, "view").select("k", "n", "total")
    val full = fullRecompute(sink.read(spark, "src"))
    assert(view.exceptAll(full).isEmpty && full.exceptAll(view).isEmpty,
      s"view ${view.collect().toSeq} != full ${full.collect().toSeq}")
  }

  test("incremental refresh equals full recompute across appends, compact, DML") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("ivm"))

    // bootstrap from two appends
    sink.append(Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v"), "src")
    sink.append(Seq(("b", 5.0), ("c", 7.0)).toDF("k", "v"), "src")
    var last = IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", fromV = -1L, toV = sink.latestVersion(spark, "src").get)
    assertViewMatches(sink)

    // appends + a compaction: the refresh stays on the CDF fast path
    sink.append(Seq(("a", 3.0), ("d", 1.5)).toDF("k", "v"), "src")
    sink.compact(spark, "src")
    sink.append(Seq(("d", 2.5)).toDF("k", "v"), "src")
    val to2 = sink.latestVersion(spark, "src").get
    val changes = sink.changesBetween(spark, "src", last, to2)
    assert(changes.queryExecution.optimizedPlan.toString.indexOf("Except") < 0,
      "append+compact range should use the CDF fast path")
    last = IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", last, to2)
    assertViewMatches(sink)

    // delete empties key b entirely and trims a; merge upserts c
    sink.delete(spark, "src", col("k") === "b" || col("v") === 1.0)
    sink.merge(spark, "src",
      Seq(("c", 100.0)).toDF("k", "v"), Seq("k")) // replaces c's single row
    val to3 = sink.latestVersion(spark, "src").get
    last = IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", last, to3)
    assertViewMatches(sink)
    // key b must be GONE from the view, not present with n=0
    assert(sink.read(spark, "view").filter($"k" === "b").isEmpty)

    // a crashed-and-replayed refresh of the same range is a no-op
    val versionsBefore = sink.versions(spark, "view").size
    IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", to2, to3)
    assertViewMatches(sink)
    assert(sink.versions(spark, "view").size == versionsBefore,
      "replayed refresh must not commit new view versions")
  }

  test("replayed refresh whose first run deleted nothing cannot delete live keys") {
    // regression: with the two-commit (merge + delete) design, a replay
    // re-derived the delta against the already-updated view, saw n drop
    // to 0 and deleted a LIVE key; the single applyChanges commit makes
    // the whole refresh a keyed no-op instead
    val sink = new VersionedParquetSink(TestSpark.tmpDir("ivmrep"))
    sink.append(Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v"), "src")
    var last = IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", -1L, sink.latestVersion(spark, "src").get)
    // one row of x deleted: dn = -1, x stays live at n=1, NO delete commit
    sink.delete(spark, "src", $"v" === 2.0)
    val to = sink.latestVersion(spark, "src").get
    IncrementalView.refreshAggregate(spark, sink, "src", "view", "k", "v", last, to)
    assert(sink.read(spark, "view").filter($"k" === "x").head().getLong(1) == 1L)
    // crash-and-replay of the same range: x must SURVIVE with n=1
    IncrementalView.refreshAggregate(spark, sink, "src", "view", "k", "v", last, to)
    val x = sink.read(spark, "view").filter($"k" === "x").collect()
    assert(x.length == 1 && x.head.getLong(1) == 1L,
      s"replay corrupted the view: ${x.toSeq}")
  }

  test("crashed-and-retried bootstrap cannot double the view") {
    // regression: the bootstrap committed under `rangeKey` but a retry
    // took the merge path keyed `rangeKey:merge`, doubling every count;
    // both paths now share the same key
    val sink = new VersionedParquetSink(TestSpark.tmpDir("ivmboot"))
    sink.append(Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v"), "src")
    val to = sink.latestVersion(spark, "src").get
    IncrementalView.refreshAggregate(spark, sink, "src", "view", "k", "v", -1L, to)
    // caller crashed before persisting toV; same bootstrap range retried
    IncrementalView.refreshAggregate(spark, sink, "src", "view", "k", "v", -1L, to)
    assertViewMatches(sink)
    assert(sink.read(spark, "view").filter($"k" === "a").head().getLong(1) == 2L)
  }

  test("all-NULL-value keys: bootstrap and incremental agree on total 0.00") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("ivmnull"))
    val nullV: Option[Double] = None
    sink.append(Seq(("a", Some(1.0)), ("n", nullV)).toDF("k", "v"), "src")
    var last = IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", -1L, sink.latestVersion(spark, "src").get)
    assertViewMatches(sink)
    // the all-null key reads total 0.00 — the documented coalesce
    // semantics, identical on the bootstrap and incremental paths
    val n0 = sink.read(spark, "view").filter($"k" === "n")
      .select("total").head()
    assert(n0.getDecimal(0).compareTo(new java.math.BigDecimal("0.00")) == 0)
    sink.append(Seq(("n", nullV), ("a", nullV)).toDF("k", "v"), "src")
    IncrementalView.refreshAggregate(spark, sink, "src", "view",
      "k", "v", last, sink.latestVersion(spark, "src").get)
    assertViewMatches(sink)
  }

  test("deleteMatching removes exactly the listed keys, distributed") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("ivmdel"))
    sink.append((1 to 100).map(i => (i.toLong, s"u$i")).toDF("id", "v"), "t")
    val doomed = Seq(3L, 7L, 50L).toDF("id")
    sink.deleteMatching(spark, "t", doomed, Seq("id"))
    val ids = sink.read(spark, "t").select("id").as[Long].collect().toSet
    assert(ids == (1L to 100L).toSet -- Set(3L, 7L, 50L))
  }
}
