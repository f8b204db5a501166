package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget waterfilling: realize a weight-proportional mixture
  * under per-source supply caps (the allocation step between "what
  * should the mix be" and materializing the corpus). Classic
  * waterfilling, closed form — no iteration:
  *
  * sort sources by cap-per-weight ascending; the saturated set (caps
  * below the water line λ = remaining-budget / remaining-weight) is a
  * PREFIX of that order. Row i is saturated iff
  * `t_i·(W − prefD_{i−1}) ≤ (B − prefT_{i−1})·d_i` — the cross-
  * multiplied integer form of `r_i ≤ λ_{i−1}` — with a running AND
  * (min over the prefix) enforcing the monotone-saturation lemma
  * exactly, so a spurious flip after the first unsaturated row cannot
  * happen. Unsaturated rows get `(B − satT)·d DIV (W − satD)` tokens;
  * everything is BIGINT-exact (the only double is the sort ratio,
  * whose small-integer quotients are separated far above ulp).
  *
  * Scale: all windows run over the |sources|-row aggregate — the
  * input is already a per-source rollup; nothing here touches corpus
  * rows.
  *
  * @param per (source, d, t) — weight (e.g. doc count) and supply cap
  *            (e.g. token count) per source, both BIGINT
  * @param budgetNum/budgetDen budget = totalSupply·num DIV den
  * @return per + (B, saturated, alloc); Σ alloc ≤ B with at most
  *         |unsaturated| tokens unallocated from integer flooring
  */
object BudgetFill {
  def waterfill(per: DataFrame, budgetNum: Long = 1L,
      budgetDen: Long = 2L): DataFrame = {
    val tot = per.agg(sum("d").as("totW"), sum("t").as("totT"))
    val wOrd = Window.orderBy(col("ratio"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // the cross-multiplications pair corpus-scale BIGINTs (t·W, B·d) —
    // at the 100 TB target those products pass 2^63, so they run in
    // DECIMAL(38,0) (good to ~1e19·1e19, the q_ks_drift treatment);
    // DuckDB's HUGEINT mirror is 128-bit and agrees
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    per.crossJoin(broadcast(tot))
      .withColumn("B", expr(s"(totT * $budgetNum) DIV $budgetDen"))
      .withColumn("ratio", col("t").cast("double") / col("d").cast("double"))
      .withColumn("prefT", sum("t").over(wOrd))
      .withColumn("prefD", sum("d").over(wOrd))
      .withColumn("chk",
        when(d38(col("t")) * d38(col("totW") - (col("prefD") - col("d"))) <=
          d38(col("B") - (col("prefT") - col("t"))) * d38(col("d")), 1L)
          .otherwise(0L))
      .withColumn("saturated", min(col("chk")).over(wOrd) === 1L)
      .withColumn("satT",
        coalesce(sum(when(col("saturated"), col("t"))).over(wAll), lit(0L)))
      .withColumn("satD",
        coalesce(sum(when(col("saturated"), col("d"))).over(wAll), lit(0L)))
      .withColumn("alloc",
        when(col("saturated"), col("t"))
          // DIV (IntegralDivide) on DECIMAL operands truncates exactly;
          // a `/`-then-floor would round at the quotient's result scale
          // first and can round a ...99999x quotient UP across an
          // integer boundary
          .otherwise(expr("CAST((CAST(B - satT AS DECIMAL(38,0)) * " +
            "CAST(d AS DECIMAL(38,0))) DIV " +
            "CAST(totW - satD AS DECIMAL(38,0)) AS BIGINT)")))
      .drop("ratio", "prefT", "prefD", "chk", "satT", "satD",
        "totW", "totT")
  }
}
