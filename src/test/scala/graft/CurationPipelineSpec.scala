package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{BudgetFill, PiiScrub, UrlAudit, VersionedParquetSink}

/** The LLM-training-data curation pipeline as ONE composition over the
  * engine's own stages — the corpus-side counterpart of the flagship
  * reference flow (EndToEndSpec / FlagshipCatalogSpec cover
  * RSS→ingest→dashboard; this covers corpus→training-set):
  *
  *   real documents (+ injected PII / URL / blocklist / dup fixtures)
  *     → PII scrub (redact, audit)          [PiiScrub]
  *     → URL scrub (links → [URL])          [UrlAudit]
  *     → quality screen (token floor)       [row-local]
  *     → blocklist screen (10% integer rule) [row-local]
  *     → exact dedup (text fingerprint)     [hash groupBy]
  *     → budget allocation per source       [BudgetFill waterfilling]
  *     → contiguous-fill selection to the allocation
  *     → versioned sink with identity + CDF [VersionedParquetSink]
  *
  * Asserts the properties a pipeline owner actually relies on: PII and
  * raw URLs never reach the sink, blocklist-saturated docs are cut,
  * duplicates land exactly once, per-source token spend never exceeds
  * its allocation (+ one doc of granularity), identity values are
  * unique, and the change feed shows the load. */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corpus -> scrub -> screen -> dedup -> budget -> versioned sink") {
    val sf = "/root/testdata/sf0.001"
    val base = TestSpark.tmpDir("curpipe")
    val sink = new VersionedParquetSink(base)

    // real corpus + fixtures: one PII-bearing doc, one exact duplicate
    // of doc 0, one sub-quality stub
    val real = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source")
    val dupText = real.filter(col("doc_id") === 0L)
      .head().getAs[String]("text")
    val fixtures = Seq(
      (9001L, "contact alice@example.com about key sk-abcdef0123456789abcd " +
        "and more words to pass the quality floor here", "en", "srcPII"),
      (9002L, dupText, "en", "src0"), // exact dup of doc 0
      (9003L, "too short", "en", "src0"),
      (9004L, "see https://tracker.example.com/pixel plus enough filler " +
        "words to pass the quality floor", "en", "src1"),
      (9005L, "slow merge dup slow merge dup slow merge", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val corpus = real.unionByName(fixtures)

    // 1. scrub: redacted text becomes THE text downstream
    val scrubbed = PiiScrub.annotate(corpus, "text")
      .withColumn("text", col("text_clean"))
      .drop("text_clean")

    // 1b. URL scrub: links become [URL] before tokenization
    val unlinked = UrlAudit.annotate(scrubbed, "text")
      .withColumn("text", col("text_clean"))
      .drop("text_clean")

    // 2. quality screen: token floor
    val screened0 = unlinked
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok") >= 5L)

    // 2b. blocklist screen: cut docs over 10% blocklist mass (the
    // q_blocklist integer rule)
    val block = graft.queries.AuditQueries.BlockWords
    val screened = screened0
      .withColumn("hits",
        size(filter(split(col("text"), " "), w => w.isin(block: _*)))
          .cast("long"))
      .filter(lit(10) * col("hits") <= col("n_tok"))
      .drop("hits")

    // 3. exact dedup on the scrubbed text fingerprint (keep min doc_id)
    val deduped = screened
      .withColumn("fp", md5(col("text")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("fp", "keep_id")

    // 4. waterfill a half-supply budget across sources
    val per = deduped.groupBy("source")
      .agg(count(lit(1)).as("d"), sum("n_tok").as("t"))
    val alloc = BudgetFill.waterfill(per)
      .select(col("source"), col("alloc"))

    // 5. contiguous fill: take docs in doc_id order until the source's
    // allocation is spent (the q_pack discipline — deterministic)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val selected = deduped.join(broadcast(alloc), "source")
      .withColumn("cum", sum("n_tok").over(w))
      .filter(col("cum") - col("n_tok") < col("alloc"))
      .select("doc_id", "text", "lang", "source", "n_tok")

    // 6. land in a governed table: identity + CDF, exactly-once
    sink.append(selected.limit(0), "train") // schema seed
    sink.setIdentityColumn(spark, "train", "row_id")
    assert(sink.appendOnce(selected, "train", "curation-batch-1"))
    assert(!sink.appendOnce(selected, "train", "curation-batch-1"),
      "keyed replay must no-op")

    val out = sink.read(spark, "train").cache()
    // PII never reaches the sink
    assert(out.filter(col("text").contains("alice@example.com")).isEmpty)
    assert(out.filter(col("text").contains("sk-abcdef")).isEmpty)
    val pii = out.filter(col("doc_id") === 9001L)
    if (!pii.isEmpty) { // srcPII's tiny supply may or may not be cut
      val t = pii.head().getAs[String]("text")
      assert(t.contains("[EMAIL]") && t.contains("[KEY]"), t)
    }
    // raw URLs never reach the sink; the URL doc (if budgeted) is scrubbed
    assert(out.filter(col("text").contains("https://")).isEmpty)
    val urlDoc = out.filter(col("doc_id") === 9004L)
    if (!urlDoc.isEmpty)
      assert(urlDoc.head().getAs[String]("text").contains("[URL]"))
    // the blocklist-saturated fixture is cut (8 hits / 8 tokens)
    assert(out.filter(col("doc_id") === 9005L).isEmpty,
      "blocklist-saturated doc survived the screen")
    // the exact duplicate landed exactly once (the original doc 0 kept)
    assert(out.filter(col("doc_id") === 9002L).isEmpty, "dup survived")
    assert(out.filter(col("doc_id") === 0L).count() == 1L)
    // sub-quality stub screened out
    assert(out.filter(col("doc_id") === 9003L).isEmpty)
    // per-source spend <= alloc + one doc of granularity (contiguous fill)
    val spend = out.groupBy("source").agg(sum("n_tok").as("spent"),
        max("n_tok").as("mx"))
      .join(alloc, "source")
      .filter(col("spent") > col("alloc") + col("mx"))
    assert(spend.isEmpty, "a source overspent its allocation")
    // identity unique
    val ids = out.select("row_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    // the change feed shows the load as inserts
    val toV = sink.latestVersion(spark, "train").get
    val cdf = sink.changesBetween(spark, "train", -1L, toV)
    assert(cdf.filter(col("_change_type") === "insert").count() ==
      out.count())

    // 7. held-out eval sample: a size-12 weighted reservoir (weight =
    // token count) drawn from the landed training set through the
    // incremental sampling index — keyed, so a replayed batch appends
    // nothing, and the draw equals the one-shot weighted top-k
    val pool = out.select(col("doc_id"), col("n_tok").as("wt"))
    graft.engine.SampleIndex.absorb(spark, sink, pool, 12,
      table = "eval_sample", batchKey = Some("eval-1"))
    graft.engine.SampleIndex.absorb(spark, sink, pool, 12,
      table = "eval_sample", batchKey = Some("eval-1")) // replay no-ops
    val got = graft.engine.SampleIndex
      .sample(spark, sink, 12, table = "eval_sample")
      .collect().map(_.getAs[Long]("doc_id")).toSeq.sorted
    val want = graft.engine.Sampling
      .weightedTopK(pool, col("doc_id"), col("wt"), 12)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == want, "eval sample diverged from the one-shot draw")
    val trainIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(trainIds.contains), "eval doc not in the train set")
    out.unpersist()
  }
}
