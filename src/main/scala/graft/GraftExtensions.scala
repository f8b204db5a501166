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
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
  }
}
