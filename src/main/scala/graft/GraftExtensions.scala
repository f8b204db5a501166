package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, NormalizeNfc}

/** Session extensions for the graft engine — the public, cluster-safe way
  * to register custom Catalyst expressions (set
  * `spark.sql.extensions=graft.GraftExtensions`, as Verify/Bench do).
  *
  * Functions:
  *  - `graft_dot(array<double>, array<double>) -> double`: codegen'd
  *    dot product ([[graft.functions.DotProduct]]);
  *  - `graft_nfc(string) -> string`: codegen'd Unicode NFC
  *    normalization ([[graft.functions.NormalizeNfc]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // Operator-optimization rule: implied raw-long bounds for predicates
    // over the nanos->timestamp conversion chain, restoring parquet
    // pushdown on events.ts (idempotent, fixed-point safe).
    ext.injectOptimizerRule(_ => graft.plans.NanosRangePushdown)
    // Catalog-read substitution: reads of GraftCatalog tables plan
    // through the engine's V1 relation (stats skipping + vectorized
    // parquet), exactly like format("graft") loads.
    ext.injectResolutionRule(s => graft.plans.GraftCatalogReads(s))
    // SQL UPDATE / MERGE INTO on catalog tables: the resolved logical
    // DML commands become sink operations (merge-on-read update, keyed
    // serializable merge) via the Delta-style command substitution.
    ext.injectResolutionRule(s => graft.plans.GraftDmlRewrite(s))
  }
}

object GraftExtensions {
  private val registrations = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new IllegalArgumentException(
          s"graft_dot requires exactly 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_nfc requires exactly 1 argument, got ${children.size}")
        NormalizeNfc(children.head)
      }),
    (FunctionIdentifier("graft_destutter"),
      new ExpressionInfo(classOf[graft.functions.Destutter].getName,
        "graft_destutter"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_destutter requires exactly 1 argument, got ${
            children.size}")
        graft.functions.Destutter(children.head)
      }))

  /** Late registration for sessions built without the extensions conf
    * (e.g. a host harness's own SparkSession): queries that need the
    * graft functions call this first, so they are self-sufficient. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    registrations.foreach { case (id, _, builder) =>
      if (!spark.catalog.functionExists(id.funcName)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
      }
    }
    // Sessions built without the extensions conf still get the pushdown
    // rule via the experimental hook (it runs in a later batch, but the
    // filter is already adjacent to the relation by then, which is all
    // the v1 pushdown needs). Double registration is harmless: the rule
    // is idempotent.
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.NanosRangePushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NanosRangePushdown
    }
  }
}
