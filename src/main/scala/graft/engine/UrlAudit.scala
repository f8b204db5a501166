package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain audit — the provenance-and-safety screen a training
  * pipeline runs next to PII scrubbing (the reference's curation slot,
  * collector.py:136-154): surface which documents embed links, which
  * domains dominate, and strip URLs before tokenization when the
  * training recipe calls for it.
  *
  * Same engineering contract as [[PiiScrub]]:
  *  - row-local `regexp_count` / `regexp_extract_all` / `regexp_replace`
  *    over the text column — codegen'd built-ins, one map pass, no
  *    shuffle until the caller aggregates;
  *  - patterns are BOTH Java-regex and RE2 compatible (no lookaround,
  *    no backreferences) so a DuckDB oracle can run the literally
  *    identical pattern;
  *  - the synthetic corpus legitimately contains zero URLs — positive
  *    behavior is pinned by UrlAuditSpec's self-injected fixtures.
  */
object UrlAudit {

  /** http(s) URL: scheme, host, optional port, optional path (path
    * stops at explicit whitespace — not `\s`, which Java and RE2
    * disagree on for U+000B). */
  val Url =
    "https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ \\t\\n\\f\\r]*)?"

  /** Applied to an already-extracted URL: capture group 1 is the host
    * (no port, no path). */
  val HostOfUrl = "https?://([A-Za-z0-9.-]+)"

  /** Applied to a host: the registered domain = last two labels
    * (`cdn.assets.example.com` -> `example.com`). Public-suffix lists
    * are out of scope — two labels is the deterministic approximation
    * both engines agree on. */
  val RegisteredOfHost = "[A-Za-z0-9-]+\\.[A-Za-z0-9-]+$"

  /** Placeholder the scrub substitutes for each URL. */
  val Placeholder = "[URL]"

  /** Per-row URL count on the original text (null text counts 0). */
  def countUrls(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(regexp_count(text, lit(Url)))

  /** Text with every URL replaced by [[Placeholder]]. */
  def scrub(text: Column): Column = regexp_replace(text, lit(Url), lit(Placeholder))

  /** All URLs in the text as an array (empty for null/no-match). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(Url), lit(0))

  /** Host of one URL value. */
  def host(url: Column): Column = regexp_extract(url, HostOfUrl, 1)

  /** Registered (two-label) domain of one host value. */
  def registered(hostCol: Column): Column =
    regexp_extract(hostCol, RegisteredOfHost, 0)

  /** Audit columns for one text column: `n_url` (count on the original
    * text) and `<textCol>_clean` (URLs replaced by [[Placeholder]]). */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_url", countUrls(t))
      .withColumn(s"${textCol}_clean", scrub(t))
  }
}
