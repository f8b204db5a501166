package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{UrlAudit, Winnow}
import graft.queries.AuditQueries

/** Audit-wave operators (queries/AuditQueries.scala) on SELF-INJECTED
  * fixtures — the PiiScrubSpec pattern: the synthetic corpus contains
  * zero URLs (q_url_audit's oracle rows correctly assert zeros), so
  * positive behavior is pinned here; URL expectations below were
  * cross-checked against DuckDB's RE2 on the literally identical
  * patterns. Winnowing is held to the PAPER's guarantees (window
  * coverage; shared-substring locality), not just examples. Full
  * query impls run against a fixture documents.parquet dir, so the
  * end-to-end path (Tables.documents -> query -> result schema) is
  * the thing tested. */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    AuditQueries.all.find(_.name == name).get.impl

  /** Writes (doc_id, text, lang, source) fixtures as a documents table
    * in a fresh dir and returns the dir. */
  private def fixtureDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("audit_fix").toFile.getAbsolutePath
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def byeSource(df: DataFrame): Map[String, Map[String, Any]] =
    df.collect().map { r =>
      r.getAs[String]("source") ->
        df.columns.map(c => c -> r.getAs[Any](c)).toMap
    }.toMap

  // ---- URL audit --------------------------------------------------------

  private val urlFixtures = Seq(
    (1L, "see https://example.com/page?x=1 and " +
      "http://cdn.assets.example.com/lib.js now", "en", "sa"),
    (2L, "port http://api.service.io:8080/v1 plain", "en", "sa"),
    (3L, "bare domain example.com no scheme", "en", "sb"),
    (4L, "dup https://example.com/a https://example.com/b", "en", "sb"))

  test("UrlAudit.annotate: counts on original text, scrub to [URL]") {
    val ann = UrlAudit.annotate(
      urlFixtures.toDF("doc_id", "text", "lang", "source"), "text")
      .orderBy("doc_id").collect()
    assert(ann.map(_.getAs[Int]("n_url")).toSeq == Seq(2, 1, 0, 2))
    assert(ann(0).getAs[String]("text_clean") == "see [URL] and [URL] now")
    assert(ann(1).getAs[String]("text_clean") == "port [URL] plain")
    assert(ann(2).getAs[String]("text_clean") ==
      "bare domain example.com no scheme")
  }

  test("UrlAudit host/registered extraction matches the RE2 check") {
    val got = spark.range(1)
      .select(
        UrlAudit.registered(UrlAudit.host(
          lit("http://cdn.assets.example.com/lib.js"))).as("a"),
        UrlAudit.registered(UrlAudit.host(
          lit("http://api.service.io:8080/v1"))).as("b"))
      .collect()(0)
    assert(got.getString(0) == "example.com")
    assert(got.getString(1) == "service.io")
  }

  test("q_url_audit end-to-end on fixtures: per-source rollup") {
    val dir = fixtureDir(urlFixtures)
    val out = byeSource(q("q_url_audit")(spark, dir))
    assert(out("sa")("n_urls") == 3L && out("sa")("docs_with_url") == 2L)
    // sa hosts: example.com, cdn.assets.example.com, api.service.io
    //   -> registered example.com, example.com, service.io = 2 distinct
    assert(out("sa")("n_domains") == 2L)
    assert(out("sb")("n_urls") == 2L && out("sb")("docs_with_url") == 1L)
    assert(out("sb")("n_domains") == 1L)
  }

  test("null text: zero URL count, no crash") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = UrlAudit.annotate(df, "text").collect()(0)
    assert(r.getAs[Int]("n_url") == 0)
  }

  // ---- blocklist --------------------------------------------------------

  test("q_blocklist: hits, integer threshold flagging") {
    val dir = fixtureDir(Seq(
      (1L, "slow merge dup slow x y z w q r", "en", "sa"), // 4/10 hits
      (2L, "clean words only here", "en", "sa"), //           0/4
      (3L, "slow a b c d e f g h i j k l m n o p q r s", "en", "sb"))) // 1/20
    val out = byeSource(q("q_blocklist")(spark, dir))
    assert(out("sa")("hits") == 4L && out("sa")("n_tokens") == 14L)
    assert(out("sa")("docs_flagged") == 1L) // only doc 1: 40 > 10%
    assert(out("sb")("docs_flagged") == 0L) // 10*1 > 20 is false
  }

  // ---- Jensen-Shannon ---------------------------------------------------

  test("q_js_div: single source = corpus gives jsd 0; bounded by ln 2") {
    val one = fixtureDir(Seq(
      (1L, "a b c a", "en", "only"), (2L, "b c d", "en", "only")))
    val r = q("q_js_div")(spark, one).collect()
    assert(r.length == 1 && r(0).getAs[Double]("jsd") == 0.0)

    val two = fixtureDir(Seq(
      (1L, "a a a a a a a a a a a a a a a a", "en", "sa"),
      (2L, "b b b b b b b b b b b b b b b b", "en", "sb")))
    val rows = q("q_js_div")(spark, two).collect()
    // each source is half the corpus with a DISJOINT vocabulary:
    // JSD(P, M-ish corpus) = ½ln2 + ¼ln... analytically ~0.4774/2 each;
    // the pinned bound is the invariant: 0 < jsd <= ln 2
    rows.foreach { r =>
      val v = r.getAs[Double]("jsd")
      assert(v > 0.0 && v <= 0.6932, s"jsd $v out of bounds")
    }
    // symmetric construction -> identical divergence for both sources
    assert(rows.map(_.getAs[Double]("jsd")).distinct.length == 1)
  }

  // ---- boilerplate ------------------------------------------------------

  test("q_boilerplate: trigram in >= 3 docs flags; unique text does not") {
    val boiler = "all rights reserved"
    val dir = fixtureDir(Seq(
      (1L, s"unique alpha words $boiler", "en", "sa"),
      (2L, s"different beta tokens $boiler", "en", "sa"),
      (3L, s"other gamma phrasing $boiler", "en", "sb"),
      (4L, "totally original content nothing shared", "en", "sb"),
      (5L, s"$boiler x", "en", "sb")))
    val out = byeSource(q("q_boilerplate")(spark, dir))
    // "all rights reserved" occurs in docs 1,2,3,5 (df=4 >= 3): boiler;
    // every other trigram is unique to its doc (df=1)
    assert(out("sa")("n_boiler") == 2L && out("sa")("n_tri") == 8L)
    assert(out("sa")("docs_flagged") == 0L) // 4*1 > 4 is false per doc
    assert(out("sb")("n_boiler") == 2L && out("sb")("n_tri") == 9L)
    assert(out("sb")("docs_flagged") == 1L) // doc 5: 4*1 > 2
  }

  // ---- winnowing --------------------------------------------------------

  /** Deterministic word-salad text from a seed (no Math.random — specs
    * must be replayable). */
  private def salad(seed: Int, n: Int): String = {
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wolf",
      "moon", "star", "rain", "leaf", "sand", "snow", "fire", "dust")
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("winnowing window guarantee: every w-window holds a selection") {
    val docs = Seq((1L, salad(7, 60)), (2L, salad(11, 23)), (3L, salad(13, 8)))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", 4, 5)
      .collect().groupBy(_.getLong(0))
    docs.collect().foreach { d =>
      val id = d.getLong(0)
      val m = d.getString(1).split(" ").length - 3
      val sel = fp(id).map(_.getAs[Long]("pos")).toSet
      val starts = 1L to math.max(m - 4, 1).toLong
      starts.foreach { p =>
        assert((p until p + 5).exists(sel.contains),
          s"doc $id window at $p uncovered (sel=$sel)")
      }
      // selections fall inside the doc and m is reported right
      assert(fp(id).forall(_.getAs[Long]("m") == m))
      assert(sel.forall(p => p >= 1 && p <= m))
    }
  }

  test("winnowing locality: a shared >= w+k-1 word run shares a fingerprint") {
    // 12 shared words (> 5+4-1=8) embedded in unrelated salads
    val shared = "omega kappa sigma delta theta lambda micro nano " +
      "pico femto atto zepto"
    val docs = Seq(
      (1L, s"${salad(17, 30)} $shared ${salad(19, 30)}"),
      (2L, s"${salad(23, 11)} $shared ${salad(29, 44)}"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", 4, 5)
      .collect().groupBy(_.getLong(0))
    val h1 = fp(1L).map(_.getAs[Long]("h")).toSet
    val h2 = fp(2L).map(_.getAs[Long]("h")).toSet
    assert(h1.intersect(h2).nonEmpty,
      "no shared fingerprint across a 12-word shared run")
  }

  test("winnowing short docs: fewer kgrams than the window still select") {
    val docs = Seq((1L, "one two three four five"), // m=2 < w
      (2L, "a b c d")) // m=1
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", 4, 5)
      .collect().groupBy(_.getLong(0))
    assert(fp(1L).length == 1 && fp(2L).length == 1)
  }

  test("q_auc: separable corpus scores high; label-only corpus near 0.5") {
    // separable: en docs are stopword-rich AND long (both score terms
    // fire); non-en docs are short stopword-free salads
    val enDoc = ("the a of to in and " * 8).trim // 48 tokens, all stopwords
    val sep = fixtureDir(
      (1L to 6L).map(i => (i, enDoc + s" extra$i", "en", "sa")) ++
        (7L to 12L).map(i => (i, salad(i.toInt, 8), "zz", "sa")))
    val r = q("q_auc")(spark, sep).head()
    assert(r.getAs[Long]("n_pos") == 6L && r.getAs[Long]("n_neg") == 6L)
    assert(r.getAs[Double]("auc") >= 0.95, s"separable auc ${r.get(2)}")

    // label-only: identical text distribution across labels -> ~0.5
    val same = fixtureDir((1L to 10L).map(i =>
      (i, "the a of gold iron wolf moon star rain leaf",
        if (i % 2 == 0) "en" else "zz", "sa")))
    val r2 = q("q_auc")(spark, same).head()
    assert(r2.getAs[Double]("auc") == 0.5, s"tied corpus auc ${r2.get(2)}")
  }

  test("q_winnow_pairs: shared-run docs pair up; unrelated docs do not") {
    val shared = "omega kappa sigma delta theta lambda micro nano " +
      "pico femto atto zepto yocto quecto ronto" // 15 words >> w+k-1
    val dir = fixtureDir(Seq(
      (1L, s"${salad(31, 40)} $shared ${salad(37, 40)}", "en", "sa"),
      (2L, s"${salad(41, 25)} $shared ${salad(43, 55)}", "en", "sa"),
      (3L, salad(47, 90), "en", "sb"),
      (4L, salad(53, 90), "en", "sb")))
    val pairs = q("q_winnow_pairs")(spark, dir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 2L)),
      s"planted 15-word shared run not detected: $pairs")
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"unrelated salads paired: $pairs")
  }

  // ---- Stupid Backoff ----------------------------------------------------

  test("q_sbo_score: in-model held-out text scores 0; unseen text pays " +
    "the exact backoff penalty") {
    // train split (doc_id % 10 != 0): every head is followed by exactly
    // one word, so every seen bigram has S = cb/cu = 1 -> ln 0. Held-out
    // doc 10 uses only seen bigrams -> score exactly 0; doc 20 is all
    // unseen words -> every bigram backs off to S = 0.4*(0+1)/(N+1)
    // with N = 36 training tokens, i.e. ln(0.4/37) r4'd
    val dir = fixtureDir(
      (1L to 9L).map(i => (i, "alpha beta gamma delta", "en", "sa")) ++
        Seq((10L, "alpha beta gamma delta", "en", "sa"),
          (20L, "zork quux blivet frobnitz", "en", "sa")))
    val got = SparkEntry.queries("q_sbo_score")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("sbo_score"))
      .toMap
    assert(got.keySet == Set(10L, 20L))
    assert(got(10L) == 0.0, s"seen-bigram doc scored ${got(10L)}")
    val wantPenalty =
      math.floor(math.floor(math.log(0.4 / 37.0) * 1e6 + 0.5) / 1e6
        * 1e4 + 0.5) / 1e4
    assert(got(20L) == wantPenalty,
      s"backoff penalty ${got(20L)} != $wantPenalty")
  }

  // ---- calibration ------------------------------------------------------

  /** 40 distinct tokens, 4 of them stopwords: every quality-score term
    * saturates exactly (len 40/40, TTR 40/40, stop 10*4/40), so the
    * r4-rounded score is EXACTLY 1.0 — which must fold into bin 9, not
    * mint a phantom bin 10. */
  private def perfectDoc(i: Int): String =
    ("the a of to" +: (1 to 36).map(j => s"w${i}x$j")).mkString(" ")

  test("q_calibration: score exactly 1.0 folds into bin 9; conf/acc exact") {
    val dir = fixtureDir(
      (1L to 4L).map(i => (i, perfectDoc(i.toInt), "en", "sa")) ++
        (5L to 8L).map(i => (i, perfectDoc(i.toInt), "de", "sa")))
    val rows = q("q_calibration")(spark, dir).collect()
    assert(rows.length == 1, s"expected one bin, got ${rows.toSeq}")
    val r = rows(0)
    assert(r.getAs[Long]("bin") == 9L, "score 1.0 must clamp into bin 9")
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("pos") == 4L)
    assert(r.getAs[Double]("conf") == 1.0)
    assert(r.getAs[Double]("acc") == 0.5)
  }

  test("q_ece: perfectly-calibrated fixture 0; inverted labels 1") {
    // every doc scores 1.0 and is en -> conf == acc in the only bin
    val calib = fixtureDir(
      (1L to 5L).map(i => (i, perfectDoc(i.toInt), "en", "sa")))
    assert(q("q_ece")(spark, calib).head().getAs[Double]("ece") == 0.0)
    // same scores, all labels negative -> |acc - conf| = 1 at full mass
    val inv = fixtureDir(
      (1L to 5L).map(i => (i, perfectDoc(i.toInt), "de", "sa")))
    assert(q("q_ece")(spark, inv).head().getAs[Double]("ece") == 1.0)
  }

  test("winnowing rightmost tie-break: equal hashes pick the later pos") {
    // identical kgrams everywhere -> every window's min hash ties at all
    // positions; rightmost rule must select the LAST position per window
    val docs = Seq((1L, Seq.fill(10)("same").mkString(" ")))
      .toDF("doc_id", "text")
    val sel = Winnow.fingerprints(docs, "doc_id", "text", 4, 5)
      .collect().map(_.getAs[Long]("pos")).sorted.toSeq
    // m=7, window starts 1..3 select pos p+4: {5, 6, 7}
    assert(sel == Seq(5L, 6L, 7L))
  }
}
