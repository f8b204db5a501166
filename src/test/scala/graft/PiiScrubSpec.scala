package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PiiScrub

/** PII / pattern scrub (engine/PiiScrub.scala) on SELF-INJECTED
  * fixtures — the synthetic corpus contains zero PII (q_pii_scrub's
  * oracle row correctly asserts all-zeros), so the positive-match
  * behavior is pinned here. The expected redactions below were
  * cross-checked against DuckDB's RE2 on the literally identical
  * patterns and replacement order, so a Java-regex semantic drift from
  * the oracle's RE2 fails this spec. */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = Seq(
    (1L, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
    (2L, "call +1 (555) 123-4567 or 555-123-4567 or 555.123.4567"),
    (3L, "server at 10.0.0.1 and 192.168.255.254 but not 1.2.3"),
    (4L, "leaked sk-abcdef0123456789abcd and api_ABCDEF0123456789xyz ok"),
    (5L, "mixed: eve@host.io from 8.8.8.8 phone 212-555-0100 " +
      "token-aaaabbbbccccdddd1234"),
    (6L, "clean row with no pii at all"),
    (7L, null.asInstanceOf[String]))

  private lazy val ann = PiiScrub
    .annotate(fixtures.toDF("doc_id", "text"), "text")
    .orderBy("doc_id").collect()

  private def row(id: Long) = ann.find(_.getLong(0) == id).get

  test("per-class counts measured on the original text") {
    def counts(id: Long) = {
      val r = row(id)
      (r.getAs[Int]("n_email"), r.getAs[Int]("n_key"),
        r.getAs[Int]("n_phone"), r.getAs[Int]("n_ip"))
    }
    assert(counts(1L) == ((2, 0, 0, 0)))
    assert(counts(2L) == ((0, 0, 3, 0)))
    assert(counts(3L) == ((0, 0, 0, 2)))
    assert(counts(4L) == ((0, 2, 0, 0)))
    assert(counts(5L) == ((1, 1, 1, 1)))
    assert(counts(6L) == ((0, 0, 0, 0)))
  }

  test("redaction chain output matches the RE2-checked expectation") {
    def clean(id: Long) = row(id).getAs[String]("text_clean")
    assert(clean(1L) == "contact [EMAIL] or [EMAIL] today")
    assert(clean(2L) == "call [PHONE] or [PHONE] or [PHONE]")
    assert(clean(3L) == "server at [IP] and [IP] but not 1.2.3")
    assert(clean(4L) == "leaked [KEY] and [KEY] ok")
    assert(clean(5L) == "mixed: [EMAIL] from [IP] phone [PHONE] [KEY]")
    assert(clean(6L) == "clean row with no pii at all")
  }

  test("null text: zero counts, null clean, no crash") {
    val r = row(7L)
    assert(r.getAs[Int]("n_email") == 0 && r.getAs[Int]("pii_total") == 0)
    assert(r.getAs[String]("text_clean") == null)
  }

  test("pii_total sums the classes; flagged rows identifiable") {
    assert(row(5L).getAs[Int]("pii_total") == 4)
    val flagged = ann.filter(r => r.getAs[Int]("pii_total") > 0)
      .map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("near-misses stay untouched (precision guards)") {
    val tricky = Seq(
      (1L, "version 1.2.3 released"), // 3-part dotted — not an IP
      (2L, "a 5551234567 raw integer"), // separator-less phone not flagged
      (3L, "short sk-tooShort123 key"), // under 16 key chars
      (4L, "not-an-email @ host.com")) // spaced @ never matches
    val out = PiiScrub.annotate(tricky.toDF("doc_id", "text"), "text")
      .agg(sum("pii_total")).collect()(0).getLong(0)
    assert(out == 0L)
  }
}
