package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE minhash/LSH signature scheme shared by the dedup queries
  * (q_dedup_minhash, q_minhash_est) and the persisted incremental index
  * (engine/DedupIndex.scala): 8 minhashes = minima of disjoint 4-hex-char
  * slices of ONE md5 per 3-gram shingle, folded into 4 bands of 2.
  *
  * Centralized because the index PERSISTS signatures: any drift between
  * producers (a tuning change to band count or slice width in one copy)
  * would silently break compatibility with already-stored signatures.
  * md5 + substring keep the scheme reproducible in DuckDB for the
  * oracle-side mirrors.
  */
object MinHashLsh {

  val NumHashes = 8
  val NumBands = 4

  /** (doc_id, h): one md5 per distinct 3-gram shingle per doc. */
  def shingleHashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) => Text.shingleSet(t, 3).map((id, _)) }
      .toDF("doc_id", "s")
      .select(col("doc_id"), md5(col("s").cast("binary")).as("h"))
  }

  /** (doc_id, m0..m7): per-doc minima of the 8 disjoint hex slices. */
  def sliceMins(hashed: DataFrame): DataFrame =
    hashed.groupBy("doc_id").agg(
      min(substring(col("h"), 1, 4)).as("m0"),
      (1 until NumHashes).map(j =>
        min(substring(col("h"), 4 * j + 1, 4)).as(s"m$j")): _*)

  /** (doc_id, band, bsig): 4 bands of 2 adjacent minhashes each. */
  def bandSignatures(mins: DataFrame): DataFrame =
    mins.select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band"),
          concat_ws("|", col(s"m${2 * b}"), col(s"m${2 * b + 1}"))
            .as("bsig"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bsig").as("bsig"))

  /** docs (doc_id, text) -> (doc_id, band, bsig), the full pipeline. */
  def signatures(spark: SparkSession, docs: DataFrame): DataFrame =
    bandSignatures(sliceMins(shingleHashes(spark, docs)))
}
