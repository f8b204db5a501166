package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** Minimal bridge into two `private[sql]` seams every V1 streaming
  * connector needs (the established third-party-connector pattern —
  * a tiny object inside the `org.apache.spark.sql` namespace):
  *
  *  - a micro-batch SOURCE must hand the planner a DataFrame whose leaf
  *    is `LogicalRelation(..., isStreaming = true)` (what
  *    FileStreamSource builds);
  *  - a micro-batch SINK receives a DataFrame bound to the streaming
  *    plan and must rebind its rows as a batch frame before writing
  *    (the `LogicalRDD.fromDataset(isStreaming = false)` recipe
  *    ForeachBatchSink uses).
  */
object SqlBridge {

  /** `relation` wrapped as a STREAMING leaf, for Source.getBatch. */
  def streamingFrame(spark: SparkSession, relation: BaseRelation): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      LogicalRelation(relation, isStreaming = true))

  /** `relation` as a batch leaf REUSING the given output attributes —
    * the catalog-read substitution ([[graft.plans.GraftCatalogReads]])
    * must keep the V2 relation's exprIds so references above it stay
    * bound. */
  def relationWithOutput(relation: BaseRelation,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      catalogTable: Option[
        org.apache.spark.sql.catalyst.catalog.CatalogTable] = None):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    // the CatalogTable descriptor keeps catalog-management paths alive
    // on the substituted V1 relation — Catalog.refreshTable's cache
    // invalidation does `.catalogTable.get` on LogicalRelation, so a
    // bare substitution breaks every post-batch refresh of a streamed-
    // into catalog table
    LogicalRelation(relation,
      output.map(_.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.AttributeReference]),
      catalogTable, isStreaming = false, stream = None)

  /** An arbitrary batch frame's rows rebound as a STREAMING frame, for
    * Source.getBatch when the batch is a DERIVED plan (e.g. a change-
    * feed diff) rather than a single relation — the dual of
    * [[rebindBatch]]. */
  def streamingRebind(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[_]]
    classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = true))
  }

  /** The micro-batch's rows rebound as a plain batch frame, for
    * Sink.addBatch. */
  def rebindBatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[_]]
    classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = false))
  }

  /** A resolved logical plan as a DataFrame (the SQL DML commands
    * execute their captured MERGE source plan this way). */
  def frameOf(spark: SparkSession, plan:
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A resolved expression as a Column usable on the SAME plan it was
    * resolved against (exprIds preserved). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression):
      org.apache.spark.sql.Column = classic.ExpressionUtils.column(e)

  /** A resolved expression as a Column REBOUND BY NAME: every attribute
    * reference becomes unresolved again, so the column can be applied to
    * a different scan of the same table (the SQL UPDATE command captures
    * its WHERE/SET expressions at analysis time but evaluates them
    * against the sink's own fresh read). */
  def rebindableColumn(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quoted(a.name)
    })
}

/** Re-export of the `private[sql]` `V2TableWithV1Fallback` (the seam
  * Delta's own `DeltaTableV2` rides for catalog streaming): a DSv2
  * `Table` implementing this gets its `v1Table` substituted on BOTH
  * streaming faces — the analyzer's streaming-relation branch
  * (`readStream.table`) and `DataStreamWriter`'s fallback arm
  * (`writeStream.toTable`) — while batch resolution ignores it
  * entirely. Public subtrait so code outside `org.apache.spark.sql`
  * can implement it. */
trait V1FallbackTable
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
