package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join topology (SURVEY.md §0 scale notes).
  *
  * At 100 TB a handful of hot keys (one viral article id, one dominant
  * feed) can pin an entire shuffle partition to one task. AQE's skew-join
  * split handles sort-merge cases adaptively
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Bench); this utility is
  * the explicit fallback for topologies AQE can't split — e.g. when the
  * hot side must stay hash-partitioned for a downstream stateful op.
  *
  * Mechanics: the probe (large, skewed) side spreads each key's rows over
  * `salt` sub-keys; the build side replicates each row `salt` times; the
  * join key becomes (key, salt), so a hot key fans out across `salt`
  * tasks. Replication multiplies the build side — use only when build is
  * orders of magnitude smaller (the usual skew shape).
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `key`, fanned out over `salt` sub-keys.
    * Result is row-identical to the plain join for inner/left joins.
    *
    * `spread` must distribute rows *within* a key (a function of the key
    * alone would re-concentrate the hot key); the default spreads by
    * physical row position, which is correctness-neutral. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int, joinType: String = "inner",
      spread: Column = spark_partition_id() * 31 + monotonically_increasing_id()): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    // right/full joins would emit every unmatched build row `salt` times
    // (one per replica) — reject instead of returning silently wrong rows
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, got $joinType")
    // withColumn would silently OVERWRITE a pre-existing __salt column
    // and drop() would then remove the user's data — fail loudly
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs must not contain a __salt column (saltedJoin internal)")
    val p = probe.withColumn("__salt", pmod(spread, lit(salt)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Plan-time skew probe: the hottest key's share among (up to)
    * `sampleRows` rows of `df` — ONE tiny job over a prefix sample (no
    * full scan; the hot key of a skewed table dominates any prefix).
    * 0.0 on an empty input. */
  def topKeyShare(df: DataFrame, key: String,
      sampleRows: Int = 50000): Double = {
    val agg = df.select(key).filter(col(key).isNotNull)
      .limit(sampleRows)
      .groupBy(key).count()
      .agg(coalesce(max("count"), lit(0L)), coalesce(sum("count"), lit(0L)))
      .head()
    val n = agg.getLong(1)
    if (n == 0L) 0.0 else agg.getLong(0).toDouble / n
  }

  /** [[saltedJoin]] behind a skew-threshold heuristic: salts ONLY when
    * the sampled top-key share crosses `threshold`, otherwise returns
    * the untouched plain equi-join plan. This is the form production
    * paths embed (q_funnel's per-stage user_id joins use it): mild skew
    * is AQE's job and salting unconditionally would replicate the build
    * side for nothing, but a viral key that owns a fifth of the shuffle
    * needs the explicit fan-out. Costs one prefix-sample job at plan
    * time. */
  def adaptiveJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int = 8, threshold: Double = 0.2,
      joinType: String = "inner"): DataFrame =
    if (topKeyShare(probe, key) >= threshold)
      saltedJoin(probe, build, key, salt, joinType)
    else probe.join(build, Seq(key), joinType)
}
