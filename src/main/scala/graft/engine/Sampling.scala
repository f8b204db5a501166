package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
  * "A-Res"): each row gets the order statistic key u^(1/w) — taking the
  * top-k keys draws a weighted sample without replacement, exactly as
  * if items were drawn sequentially with probability ∝ weight among the
  * remainder. Evaluated in log space (key = ln(u)/w, same ordering,
  * no underflow at large weights).
  *
  * The importance-weighted corpus-sampling primitive (sample documents
  * ∝ quality/length/domain weight for a training mix) with the scale
  * shape a 100 TB corpus needs: the key is ROW-LOCAL (one deterministic
  * hash + one ln), selection is a top-k — Spark plans
  * TakeOrderedAndProject, i.e. per-partition heaps + a k-row driver
  * merge, ZERO shuffles of the corpus at any size (plan-pinned).
  *
  * Randomness is the repo's deterministic 16-bit md5 hash (the
  * q_train_split acceptance-hash discipline): u = (hash16(id)+1)/65536
  * ∈ (0,1], exactly representable (denominator 2^16), so DuckDB replays
  * the identical ln — selection AND scores hash-match across engines.
  * A salt re-keys the draw; inclusion monotonicity in the weight is
  * property-tested.
  */
object Sampling {

  /** The A-Res key ln(u)/w for deterministic u derived from `id` and
    * `salt`. Larger is better (ln u ≤ 0 shrinks toward 0 as w grows);
    * weights are clamped to ≥ 1 so zero/negative never divides. */
  def esKey(id: Column, weight: Column, salt: String = ""): Column = {
    val u = (graft.queries.Helpers.hash16(concat(lit(salt), id.cast("string")))
      + 1).cast("double") / 65536.0
    log(u) / greatest(weight, lit(1)).cast("double")
  }

  /** Top-k weighted sample of `df`: appends `es_key` and keeps the k
    * best rows (ties broken on the id for determinism). */
  def weightedTopK(df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = ""): DataFrame =
    df.withColumn("es_key", esKey(id, weight, salt))
      .orderBy(col("es_key").desc, id.asc)
      .limit(k)
}
