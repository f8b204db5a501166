package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftTable

/** Analyzer rule (injected by [[graft.GraftExtensions]]) that replaces
  * every READ of a [[GraftTable]] — `SELECT ... FROM g.tbl [VERSION AS
  * OF v | TIMESTAMP AS OF ts]`, `spark.read.table("g.tbl")` — with the
  * engine's planner-integrated V1 relation
  * ([[graft.engine.GraftRelation]]): commit-log stats skipping inside
  * `FileIndex.listFiles`, stock vectorized parquet, whole-stage
  * codegen, parquet row-group pushdown. This is how Delta wires its own
  * catalog tables into scan planning; without this rule the table still
  * answers correctly through its built-in `V1Scan` fallback, just
  * without the file-skipping plan.
  *
  * WRITE targets must stay V2 relations — `InsertIntoStatement` (still
  * unresolved), the resolved `V2WriteCommand`s, and the DML commands
  * bind to the relation object itself — so the rule recurses around
  * those slots and only substitutes read-side occurrences. The output
  * attributes (exprIds) are reused, so references above the relation
  * stay valid. */
case class GraftCatalogReads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  /** Recurse into every child except `keep` (a write-target slot). */
  private def around(p: LogicalPlan, keep: LogicalPlan): LogicalPlan =
    p.withNewChildren(p.children.map(c =>
      if (c eq keep) c else rewrite(c)))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoStatement => around(i, i.table)
    case w: V2WriteCommand => around(w, w.table)
    case d: DeleteFromTable => around(d, d.table)
    case u: UpdateTable => around(u, u.table)
    case m: MergeIntoTable => around(m, m.targetTable)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      // reader-option time travel (versionAsOf/timestampAsOf) composes
      // here: the relation's options carry what spark.read.option(...)
      // set, and the pinned table resolves them SQL-pins-win
      val t = r.table.asInstanceOf[GraftTable].withOptionPins(r.options)
      org.apache.spark.sql.graft.SqlBridge.relationWithOutput(
        t.sink.baseRelation(spark, t.table, t.versionAsOf, t.timestampAsOf),
        r.output, Some(t.catalogDescriptor))
    case other => other.withNewChildren(other.children.map(rewrite))
  }
}
