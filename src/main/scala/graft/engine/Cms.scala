package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame: the
  * classic mergeable frequency estimator — answers "how often does key
  * x occur" for EVERY key in O(depth × width) state, where Misra-Gries
  * (functions/Sketches.scala) answers only "which keys are frequent".
  *
  * Scale shape — why this survives 100 TB:
  *  - The sketch is built FROM the (key, count) aggregate, not the raw
  *    stream: CMS is linear in its input (cms(A ⊎ B) = cms(A) + cms(B)
  *    bucket-wise — property-tested in CmsSpec), so folding counts in
  *    via one map-side-combinable groupBy is semantically identical to
  *    streaming every occurrence and never multiplies the corpus-sized
  *    shuffle by depth. Only the vocab-sized aggregate fans out ×depth.
  *  - The materialized sketch is depth × width rows TOTAL (1024 at the
  *    defaults) at ANY corpus size — it broadcasts for free, ships to a
  *    dashboard, or merges across days by bucket-wise addition.
  *  - Estimates are point lookups: re-hash the probe key per row,
  *    equi-join against the sketch, take min over depth — the probe
  *    side is whatever bounded key set the caller audits.
  *
  * Hashing is md5-derived (depth-index-prefixed, so rows are pairwise
  * independent in practice) and engine-portable: DuckDB replays the
  * identical bucket function, so q_cms_err's estimates hash-match
  * exactly. Guarantees (both property-tested): est ≥ true always
  * (collisions only ADD), and P[est − true > (e/width)·N] ≤ e^−depth.
  */
object Cms {

  val Depth = 4
  val Width = 256

  /** Bucket of `key` in sketch row `r`: 16-bit md5 hash of the
    * row-prefixed key, folded mod width. */
  def bucket(r: Int, key: Column, width: Int = Width): Column =
    graft.queries.Helpers.hash16(concat(lit(s"$r:"), key)) % width

  /** Builds the sketch from a (key, cnt) aggregate: (r, b, cnt) with
    * depth × width rows at most — each input row fans out ×depth, then
    * one keyed groupBy folds collisions. */
  def build(counts: DataFrame, key: String = "w", cnt: String = "cnt",
      depth: Int = Depth, width: Int = Width): DataFrame =
    counts
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col(key), width).as("b"),
          col(cnt).as("n"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.b").as("b"))
      .agg(sum("e.n").as("cnt"))

  /** Merges any number of same-shape sketches bucket-wise (pass their
    * UNION) — the linearity that makes CMS the 100 TB counting sketch:
    * build one 1024-row sketch per day/partition/source, store them,
    * and answer any window by adding the relevant sketches, never
    * re-touching the data. cms(A ⊎ B) = merge(cms(A) ∪ cms(B)) exactly
    * (property-tested in CmsSpec). */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy("r", "b").agg(sum("cnt").as("cnt"))

  /** Point estimates for the keys of `probes` (any DataFrame with a
    * string `key` column): min over depth of the hashed bucket's count.
    * The sketch side is ≤ depth × width rows — broadcast it. */
  def estimate(sketch: DataFrame, probes: DataFrame, key: String = "w",
      depth: Int = Depth, width: Int = Width): DataFrame = {
    val hashed = probes
      .select(col("*"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col(key), width).as("b"))): _*)).as("h"))
      .select(col("*"), col("h.r").as("r"), col("h.b").as("b"))
      .drop("h")
    hashed
      // reserved name: the probe side may legitimately carry a `cnt`.
      // LEFT join + coalesce-to-0: a bucket the sketch never wrote is
      // an EMPTY bucket (count 0), not a missing depth row — an inner
      // join would drop it, weakening the min-over-depth bound and
      // losing entirely-absent probe keys from the output instead of
      // answering est_n = 0.
      .join(broadcast(sketch.withColumnRenamed("cnt", "__cms_cnt")),
        Seq("r", "b"), "left")
      .withColumn("__cms_cnt", coalesce(col("__cms_cnt"), lit(0L)))
      .groupBy(probes.columns.map(col): _*)
      .agg(min("__cms_cnt").as("est_n"))
  }
}
