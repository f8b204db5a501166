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

  // ---- Efraimidis-Spirakis weighted sampling -----------------------------

  /** Sequential A-Res reference sharing the engine's hash: key =
    * ln((hex4(md5(id))+1)/65536)/max(w,1), top-k, ties on id. */
  private def seqSample(rows: Seq[(Long, Long)], k: Int): Seq[Long] = {
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (Integer.parseInt(md.map("%02x".format(_)).mkString.take(4), 16) + 1)
        .toDouble / 65536.0
    }
    rows.map { case (id, w) => (id, math.log(u(id)) / math.max(w, 1L)) }
      .sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)
  }

  test("q_weighted_sample agrees exactly with the sequential reference") {
    val docs = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = seqSample(docs, 20)
    val got = run("q_weighted_sample").collect().map(_.getAs[Long]("doc_id"))
    assert(got.sorted.toSeq == want.sorted,
      s"selection diverged: got ${got.toSeq.sorted} want ${want.sorted}")
  }

  test("es_key is monotone in the weight (fixed id, heavier never worse)") {
    import spark.implicits._
    val keys = (1L to 50L).toDF("id")
      .select(col("id"),
        graft.engine.Sampling.esKey(col("id"), lit(1)).as("k1"),
        graft.engine.Sampling.esKey(col("id"), lit(1000)).as("k1000"))
      .collect()
    keys.foreach(r => assert(r.getAs[Double]("k1000") >= r.getAs[Double]("k1")))
    // strict for any id whose u < 1 (ln u < 0); u = 1 is a 1/65536 tie
    assert(keys.count(r =>
      r.getAs[Double]("k1000") > r.getAs[Double]("k1")) >= 45)
  }

  test("q_weighted_strata: per-source quotas agree with the reference") {
    val docs = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      seqSample(rows.map(r => (r._1, r._3)).toSeq, 5).map(src -> _)
    }.toSet
    val got = run("q_weighted_strata").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id")).toSet
    assert(got == want, s"per-source selection diverged")
    // quota: exactly min(5, source size) rows per source
    val bySrc = got.groupBy(_._1).view.mapValues(_.size)
    val sizes = docs.groupBy(_._2).view.mapValues(_.length)
    sizes.foreach { case (s2, n) =>
      assert(bySrc.getOrElse(s2, 0) == math.min(5, n))
    }
  }

  test("published es_key never carries a -0.0 bit pattern (r9 hash fail)") {
    import spark.implicits._
    // A heavy weight drives ln(u)/w into (-5e-5, 0): DuckDB's C round
    // emits -0.0 there while Spark's BigDecimal round emits +0.0 — the
    // r9 q_weighted_sample/q_weighted_strata oracle-hash regression.
    // Both engines now publish via the r4 floor form, whose output can
    // never be -0.0; pin that on a key that rounds to exactly zero.
    val tiny = Seq((1L, 10000000L)).toDF("doc_id", "wt")
      .select(graft.queries.Helpers.r4(
        graft.engine.Sampling.esKey(col("doc_id"), col("wt"))).as("k"))
      .head().getAs[Double]("k")
    assert(tiny == 0.0, s"expected a key rounding to zero, got $tiny")
    assert(java.lang.Double.doubleToRawLongBits(tiny) == 0L,
      "r4 of a tiny negative key must be +0.0, not -0.0")
    // and the full published artifacts are -0.0-free
    for (q <- Seq("q_weighted_sample", "q_weighted_strata")) {
      val bad = run(q).collect().count(r =>
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("es_key"))
          == java.lang.Double.doubleToRawLongBits(-0.0))
      assert(bad == 0, s"$q published $bad -0.0 es_key values")
    }
  }

  test("weighted sample: without replacement, heavy weights dominate") {
    import spark.implicits._
    // 100 light docs (w=1) + 5 heavy (w=10000): a heavy doc misses only
    // if 20 light keys beat ~-1e-4, each a ~1e-4 event — deterministic
    // under the md5 hash, and the expected miss count is ~0.01
    val df = ((1L to 100L).map((_, 1)) ++ (101L to 105L).map((_, 10000)))
      .toDF("doc_id", "wt")
    val got = graft.engine.Sampling
      .weightedTopK(df, col("doc_id"), col("wt"), 20)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(got.length == 20 && got.distinct.length == 20)
    assert((101L to 105L).forall(got.contains),
      s"heavy docs not all selected: ${got.toSeq.sorted}")
  }
}
