package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern scrubbing — the classic LLM-pipeline curation stage
  * that redacts personal identifiers and leaked credentials from a
  * corpus BEFORE training (the reference's curation slot is its
  * analyze/curate stage, collector.py:136-154; this is the scrub every
  * production pipeline adds next to it).
  *
  * Everything is row-local `regexp_count` / `regexp_replace` over the
  * text column — codegen'd built-ins, no UDFs, no shuffle: the stage
  * costs one map pass regardless of corpus size, so it composes freely
  * into a 100 TB curation pipeline.
  *
  * Pattern catalog rules:
  *  - Patterns are BOTH Java-regex and RE2 compatible (no lookaround,
  *    no backreferences, explicit character classes) so the DuckDB
  *    oracle runs the literally identical pattern.
  *  - Redaction applies in a FIXED order (email → key → phone → IP):
  *    with overlapping matches the order changes the output, so both
  *    engines must chain identically.
  *  - Counts are measured on the ORIGINAL text (audit numbers do not
  *    depend on redaction order).
  */
object PiiScrub {

  /** user@host.tld — local part liberal, TLD alphabetic 2+. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone with optional +CC: `+1 (555) 123-4567`,
    * `555-123-4567`, `555.123.4567`. Separators required (a bare
    * 10-digit integer is NOT flagged — too many false positives on
    * numeric data). */
  val Phone =
    "(\\+[0-9]{1,2}[ .-])?(\\([0-9]{3}\\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}"

  /** Dotted-quad IPv4 (no octet-range check — scrubbing favors recall;
    * `\b` is an ASCII word boundary in both Java and RE2). */
  val Ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Credential-shaped tokens: a known prefix then 16+ key chars
    * (`sk-...`, `api_...`, `token-...`). */
  val SecretKey =
    "\\b(sk|pk|api|key|token|secret)[-_][A-Za-z0-9]{16,}\\b"

  /** (pattern, replacement) in the FIXED redaction order. */
  val Catalog: Seq[(String, String, String)] = Seq(
    ("email", Email, "[EMAIL]"),
    ("key", SecretKey, "[KEY]"),
    ("phone", Phone, "[PHONE]"),
    ("ip", Ipv4, "[IP]"))

  /** The redacted form of `text`: every catalog pattern replaced by its
    * placeholder, applied in catalog order. */
  def redact(text: Column): Column =
    Catalog.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, lit(re), lit(repl))
    }

  /** Audit + scrub columns for one text column: per-class match counts
    * `n_<class>` (measured on the original text), `pii_total`, and the
    * redacted text as `<textCol>_clean`. Null text yields zero counts
    * and null clean text (null-tolerant like the analyzer stage). */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val counted = Catalog.foldLeft(df) { case (d, (name, re, _)) =>
      d.withColumn(s"n_$name",
        when(t.isNull, lit(0)).otherwise(regexp_count(t, lit(re))))
    }
    counted
      .withColumn("pii_total",
        Catalog.map { case (n, _, _) => col(s"n_$n") }.reduce(_ + _))
      .withColumn(s"${textCol}_clean", redact(t))
  }
}
