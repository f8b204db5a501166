package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication — the production shape of dedup at
  * 100 TB: new documents are checked against a PERSISTED index of the
  * corpus seen so far (exact fingerprints + MinHash band signatures),
  * and only survivors (plus their signatures) are appended. Nothing ever
  * recomputes over the full historical corpus; each ingest round costs
  * O(new batch) plus an equi-join against the index on fingerprint /
  * (band, signature) — both bucketed shuffle keys, never all-pairs.
  *
  * Index tables (on any [[TableSink]]):
  *  - `<prefix>_fp`:  (doc_id, fp) — md5 of normalized text (exact dup)
  *  - `<prefix>_sig`: (doc_id, band, bsig) — 4 LSH bands of 2 sliced
  *    16-bit minhashes each, the q_dedup_minhash scheme
  *
  * Semantics: exact-duplicate and band-collision (near-dup candidate)
  * rows are dropped; first occurrence wins, including WITHIN the new
  * batch itself. Band collision as the drop criterion is the recall-
  * leaning choice for a candidate stage; a verify pass (exact jaccard on
  * collisions, as in q_minhash_est) slots in front of the drop if
  * precision matters more.
  */
object DedupIndex {

  private def normText(c: org.apache.spark.sql.Column) =
    md5(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")).cast("binary"))

  /** (doc_id, fp) for a documents frame (doc_id, text). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), normText(col("text")).as("fp"))

  /** (doc_id, band, bsig): the 8-slice/4-band minhash signature scheme
    * shared with q_dedup_minhash. */
  def signatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sh = docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.functions.Text.shingleSet(t, 3).map((id, _)) }
      .toDF("doc_id", "s")
      .select(col("doc_id"), md5(col("s").cast("binary")).as("h"))
    val mins = sh.groupBy("doc_id").agg(
      min(substring(col("h"), 1, 4)).as("m0"),
      (1 until 8).map(j =>
        min(substring(col("h"), 4 * j + 1, 4)).as(s"m$j")): _*)
    mins.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          concat_ws("|", col(s"m${2 * b}"), col(s"m${2 * b + 1}"))
            .as("bsig"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
  }

  final case class Result(appended: Long, droppedExact: Long, droppedNear: Long)

  /** Dedup `newDocs` against the index AND itself, append survivors to
    * `docsTable` and their fingerprints/signatures to the index tables.
    * Returns the kept/dropped accounting. */
  def appendDeduped(spark: SparkSession, sink: TableSink, newDocs: DataFrame,
      docsTable: String = "corpus", indexPrefix: String = "dedup"): Result = {
    val fpTable = s"${indexPrefix}_fp"
    val sigTable = s"${indexPrefix}_sig"

    val inBatch = newDocs.cache()
    var exactSurvivorsRef: Option[DataFrame] = None
    try {
      val total = inBatch.count()
      // ---- exact: drop known fingerprints, keep first per fp in batch
      val fps = fingerprints(inBatch)
      val knownFp =
        if (sink.exists(spark, fpTable)) sink.read(spark, fpTable).select("fp")
        else spark.emptyDataFrame.select(lit("").as("fp")).limit(0)
      val freshFp = fps.join(knownFp, Seq("fp"), "left_anti")
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id", "fp")
      // ---- near: drop band-signature collisions vs index and in-batch
      val exactSurvivors = inBatch.join(
        freshFp.select("doc_id"), Seq("doc_id"), "left_semi").cache()
      exactSurvivorsRef = Some(exactSurvivors)
      val sigs = signatures(spark, exactSurvivors)
      val knownSig =
        if (sink.exists(spark, sigTable))
          sink.read(spark, sigTable).select("band", "bsig")
        else spark.emptyDataFrame
          .select(lit(0).as("band"), lit("").as("bsig")).limit(0)
      val hitIndex = sigs.join(knownSig, Seq("band", "bsig"), "left_semi")
        .select("doc_id").distinct()
      // in-batch near-dups: per (band,bsig) bucket keep the min doc_id
      val hitBatch = sigs.as("a")
        .join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id")).distinct()
      val nearVictims = hitIndex.union(hitBatch).distinct()
      val kept = exactSurvivors
        .join(broadcast(nearVictims), Seq("doc_id"), "left_anti")
        .cache()
      try {
        val nKept = kept.count()
        val nExactSurvived = exactSurvivors.count()
        if (nKept > 0) {
          sink.append(kept, docsTable)
          sink.append(fingerprints(kept), fpTable)
          sink.append(signatures(spark, kept), sigTable)
        }
        Result(nKept,
          droppedExact = total - nExactSurvived,
          droppedNear = nExactSurvived - nKept)
      } finally kept.unpersist()
    } finally {
      exactSurvivorsRef.foreach(_.unpersist())
      inBatch.unpersist()
    }
  }
}
