package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.SqlBridge

import graft.engine.VersionedParquetSink
import graft.sources.GraftTable

/** Analyzer rule (injected by [[graft.GraftExtensions]]) that gives
  * [[graft.sources.GraftCatalog]] tables SQL `UPDATE` and `MERGE INTO` —
  * the two DML verbs DSv2 only grants to `SupportsRowLevelOperations`
  * implementors (a group-based rewrite protocol built for engines that
  * let SPARK rewrite their files; the sink does its own serializable
  * commit, so the right integration is the command substitution Delta
  * uses: catch the resolved logical command, hand it to the engine).
  *
  *  - `UPDATE g.t SET c = expr [, ...] [WHERE p]` →
  *    [[VersionedParquetSink.updateVectored]]: merge-on-read, one commit
  *    carrying the updated row images plus the positional mask of the
  *    old ones — updating 3 rows of a 100 TB table writes 3 rows + a
  *    kilobyte mask, never a table rewrite.
  *  - `MERGE INTO g.t USING src ON g.t.k = src.k ...` →
  *    [[VersionedParquetSink.merge]]/`applyChanges`: one serializable
  *    keyed anti-join + union commit. Supported arms (the Delta-CDC
  *    shape): unconditional `WHEN MATCHED THEN UPDATE SET *` (or a SET
  *    covering every column) / `WHEN MATCHED THEN DELETE`, plus
  *    unconditional `WHEN NOT MATCHED THEN INSERT *` (or full-column
  *    INSERT). Conditional arms, partial-column arms, and
  *    `WHEN NOT MATCHED BY SOURCE` raise a loud unsupported error
  *    rather than silently wrong results.
  *
  * The commands capture resolved catalyst expressions; UPDATE rebinds
  * them by name against the sink's fresh read (the sink re-plans its own
  * scan), MERGE executes its source plan as-is (exprIds preserved). */
case class GraftDmlRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      graftTableOf(target) match {
        case Some(t) =>
          noSubqueries("UPDATE", condition.toSeq ++ assignments.map(_.value))
          timeTravelGuard("UPDATE", t)
          GraftUpdateCommand(t.base, t.table,
            assignments.map(a => assignName(a) -> a.value), condition)
        case None => plan
      }

    case m @ MergeIntoTable(target, source, cond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution) if m.resolved =>
      graftTableOf(target) match {
        case Some(t) =>
          timeTravelGuard("MERGE INTO", t)
          require(!withSchemaEvolution, "MERGE INTO a graft table does " +
            "not support WITH SCHEMA EVOLUTION (evolve via append first)")
          if (notMatchedBySource.nonEmpty) throw new
            UnsupportedOperationException("MERGE INTO a graft table does " +
              "not support WHEN NOT MATCHED BY SOURCE arms")
          noSubqueries("MERGE INTO", Seq(cond))
          val tgtOut = relationOf(target).get.outputSet
          val keys = keyEqualities(cond, tgtOut, source.outputSet)
          GraftMergeCommand(t.base, t.table, source,
            keys.map { case (a, e) => a.name -> e },
            matchedShape(matched, keys),
            insertShape(notMatched, keys))
        case None => plan
      }

    case _ => plan
  }

  private def relationOf(p: LogicalPlan): Option[DataSourceV2Relation] =
    EliminateSubqueryAliases(p) match {
      case r: DataSourceV2Relation => Some(r)
      case _ => None
    }

  private def graftTableOf(p: LogicalPlan): Option[GraftTable] =
    relationOf(p).map(_.table).collect { case t: GraftTable => t }

  private def timeTravelGuard(verb: String, t: GraftTable): Unit =
    require(t.versionAsOf.isEmpty && t.timestampAsOf.isEmpty,
      s"cannot $verb the time-traveled snapshot '${t.table}'")

  private def noSubqueries(verb: String, es: Seq[Expression]): Unit =
    if (es.exists(_.exists(_.isInstanceOf[SubqueryExpression])))
      throw new UnsupportedOperationException(
        s"$verb on a graft table does not support subqueries in its " +
          "predicates or SET expressions")

  private def assignName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"graft UPDATE/MERGE assigns top-level columns only, got $other")
  }

  /** The ON condition as target-key -> source-expression pairs; anything
    * beyond a conjunction of such equalities is unsupported (the sink's
    * merge is keyed). */
  private def keyEqualities(cond: Expression,
      tgtOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      srcOut: org.apache.spark.sql.catalyst.expressions.AttributeSet):
      Seq[(AttributeReference, Expression)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def sourceOnly(e: Expression): Boolean =
      e.references.subsetOf(srcOut)
    conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b)
          if tgtOut.contains(a) && sourceOnly(b) => (a, b)
      case EqualTo(b, a: AttributeReference)
          if tgtOut.contains(a) && sourceOnly(b) => (a, b)
      case other => throw new UnsupportedOperationException(
        "MERGE INTO a graft table requires ON to be a conjunction of " +
          s"target-column = source-expression equalities; got $other")
    }
  }

  /** Validate the WHEN MATCHED arm. `Some(assignments)` = replace the
    * matched row with this full-column image; `None` = delete it. */
  private def matchedShape(actions: Seq[MergeAction],
      keys: Seq[(AttributeReference, Expression)]):
      Option[Seq[(String, Expression)]] = actions match {
    case Nil => Some(Nil) // no matched arm: matched rows untouched
    case Seq(DeleteAction(None)) => None
    case Seq(UpdateAction(None, assigns, _)) =>
      Some(checkKeyStable("UPDATE SET", assigns, keys))
    case Seq(UpdateAction(Some(_), _, _)) | Seq(DeleteAction(Some(_))) =>
      throw new UnsupportedOperationException("MERGE INTO a graft table " +
        "does not support conditional WHEN MATCHED AND ... arms")
    case _ => throw new UnsupportedOperationException("MERGE INTO a " +
      "graft table supports at most one WHEN MATCHED arm")
  }

  private def insertShape(actions: Seq[MergeAction],
      keys: Seq[(AttributeReference, Expression)]):
      Option[Seq[(String, Expression)]] = actions match {
    case Nil => None
    case Seq(InsertAction(None, assigns)) =>
      Some(checkKeyStable("INSERT", assigns, keys))
    case Seq(InsertAction(Some(_), _)) =>
      throw new UnsupportedOperationException("MERGE INTO a graft table " +
        "does not support conditional WHEN NOT MATCHED AND ... arms")
    case _ => throw new UnsupportedOperationException("MERGE INTO a " +
      "graft table supports at most one WHEN NOT MATCHED arm")
  }

  /** The sink merges BY KEY: an arm that writes a key column anything
    * other than the ON equality's source expression would silently
    * diverge from MERGE semantics — reject it. */
  private def checkKeyStable(arm: String, assigns: Seq[Assignment],
      keys: Seq[(AttributeReference, Expression)]):
      Seq[(String, Expression)] = {
    keys.foreach { case (k, src) =>
      assigns.find(a => assignName(a) == k.name).foreach { a =>
        if (!a.value.semanticEquals(src) && !a.value.semanticEquals(k))
          throw new UnsupportedOperationException(
            s"MERGE INTO a graft table: $arm writes key column " +
              s"'${k.name}' a value other than the ON join key")
      }
    }
    assigns.map(a => assignName(a) -> a.value)
  }
}

/** `UPDATE g.t SET ... WHERE ...` — executes as the sink's
  * merge-on-read [[VersionedParquetSink.updateVectored]] (old positions
  * masked, updated images appended, one serializable commit). */
case class GraftUpdateCommand(base: String, table: String,
    set: Seq[(String, Expression)], condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val sink = new VersionedParquetSink(base)
    val schema = sink.read(spark, table).schema
    val setCols: Map[String, Column] = set.map { case (name, value) =>
      require(schema.fieldNames.contains(name),
        s"UPDATE $table: column '$name' does not exist")
      // align the assignment to the column's declared type (Spark SQL
      // UPDATE semantics; the sink never changes schema on update)
      name -> SqlBridge.rebindableColumn(value).cast(schema(name).dataType)
    }.toMap
    val cond = condition.map(SqlBridge.rebindableColumn).getOrElse(lit(true))
    sink.updateVectored(spark, table, cond, setCols)
    Seq.empty
  }
}

/** `MERGE INTO g.t USING src ON ...` — executes as ONE serializable
  * [[VersionedParquetSink.applyChanges]] commit (keyed anti-join +
  * union; broadcast when the source is a CDC trickle, shuffle when not —
  * nothing collects).
  *
  * `matched = Some(assigns)` replaces each matched row with its
  * source-built image (empty assigns = leave matched rows untouched);
  * `matched = None` deletes matched rows. `insert = Some(assigns)`
  * inserts unmatched source rows. */
case class GraftMergeCommand(base: String, table: String,
    source: LogicalPlan, keys: Seq[(String, Expression)],
    matched: Option[Seq[(String, Expression)]],
    insert: Option[Seq[(String, Expression)]])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val sink = new VersionedParquetSink(base)
    val schema = sink.read(spark, table).schema
    val src = SqlBridge.frameOf(spark, source).cache()
    try {
      // the source keyed by TARGET column names (the sink joins on them)
      def keyed = src.select(keys.map { case (n, e) =>
        SqlBridge.columnOf(e).cast(schema(n).dataType).as(n) }: _*)
      // a full-column row image per source row, in table-schema order
      def image(assigns: Seq[(String, Expression)], arm: String) = {
        val byName = assigns.toMap
        src.select(schema.fields.toSeq.map { f =>
          val e = byName.getOrElse(f.name, throw new
            UnsupportedOperationException(s"MERGE INTO $table: $arm " +
              s"must cover every column (missing '${f.name}'); use " +
              "SET * / INSERT *"))
          SqlBridge.columnOf(e).cast(f.dataType).as(f.name)
        }: _*)
      }
      val keyCols = keys.map(_._1)
      val empty = sink.read(spark, table).limit(0)
      (matched, insert) match {
        // upsert: matched replaced, unmatched inserted — the two images
        // must agree (star arms always do) for the single-frame merge
        case (Some(up), Some(ins)) if up.nonEmpty =>
          val insMap = ins.toMap
          require(up.toMap.keySet == insMap.keySet &&
            up.forall { case (n, e) => insMap(n).semanticEquals(e) },
            s"MERGE INTO $table: UPDATE SET and INSERT write different " +
              "images; only the symmetric (SET * / INSERT *) shape is " +
              "supported")
          sink.merge(spark, table, image(up, "UPDATE SET"), keyCols)
        // update-only: replace matched rows, insert nothing
        case (Some(up), None) if up.nonEmpty =>
          val tgtKeys = sink.read(spark, table)
            .select(keyCols.map(col): _*).distinct()
          sink.merge(spark, table,
            image(up, "UPDATE SET").join(tgtKeys, keyCols, "left_semi"),
            keyCols)
        // no matched arm: pure insert of unmatched source rows
        case (Some(Nil), Some(ins)) =>
          val tgtKeys = sink.read(spark, table)
            .select(keyCols.map(col): _*).distinct()
          sink.merge(spark, table,
            image(ins, "INSERT").join(tgtKeys, keyCols, "left_anti"),
            keyCols)
        // matched-delete (+ optional insert of unmatched rows): one
        // applyChanges commit — all-or-none across both arms. Unmatched
        // = source keys absent from the TARGET.
        case (None, ins) =>
          val tgtKeys = sink.read(spark, table)
            .select(keyCols.map(col): _*).distinct()
          sink.applyChanges(spark, table,
            ins.map(a => image(a, "INSERT")
              .join(tgtKeys, keyCols, "left_anti"))
              .getOrElse(empty),
            keyed, keyCols)
        case (Some(Nil), None) =>
          throw new UnsupportedOperationException(
            s"MERGE INTO $table has no WHEN MATCHED and no WHEN NOT " +
              "MATCHED arm — nothing to do")
      }
      Seq.empty
    } finally { src.unpersist(); () }
  }
}
