package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session extensions for the graft engine — the public, cluster-safe way
  * to register custom Catalyst expressions (set
  * `spark.sql.extensions=graft.GraftExtensions`, as Verify/Bench do).
  *
  * Functions:
  *  - `graft_dot(array<double>, array<double>) -> double`: codegen'd
  *    dot product ([[graft.functions.DotProduct]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotRegistration)
  }
}

object GraftExtensions {
  private val dotRegistration = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      if (children.size != 2) throw new IllegalArgumentException(
        s"graft_dot requires exactly 2 arguments, got ${children.size}")
      DotProduct(children.head, children(1))
    })

  /** Late registration for sessions built without the extensions conf
    * (e.g. a host harness's own SparkSession): queries that need
    * `graft_dot` call this first, so they are self-sufficient. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.catalog.functionExists("graft_dot")) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", dotRegistration._3, "scala_udf")
    }
}
