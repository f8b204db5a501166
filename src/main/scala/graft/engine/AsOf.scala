package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — an operator Spark lacks natively (SURVEY.md §2.4
  * note; DuckDB/kdb/pandas `merge_asof` semantics): for each left row,
  * attach the single right row with the greatest `rightTime <=
  * leftTime` within the same key. Inclusive on equal timestamps.
  *
  * Implementation is the scalable union-tag pattern, not a join at all:
  * both sides are tagged and unioned, then ONE shuffle on the key sorts
  * each partition by (time, side) and a running `last(value,
  * ignoreNulls)` window fills every left row with the most recent right
  * values seen so far. Cost = one shuffle + one sort, O(n) per
  * partition — versus the naive range-join's quadratic per-key blow-up.
  * Skewed keys shard exactly like any keyed window (AQE or salting).
  *
  * Right rows sharing (key, time) are disambiguated by the caller
  * pre-deduplicating (recommended — DuckDB's ASOF is also ambiguous
  * there) or they resolve to the row latest in (time) sort order.
  */
object AsOf {

  /** @param valueCols right-side columns to attach (must not collide
    *                  with left column names) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"valueCols collide with left: $collisions")
    val reserved = Set("__t", "__side", "__vals")
      .intersect(left.columns.toSet ++ right.columns.toSet)
    require(reserved.isEmpty,
      s"input columns collide with asofJoin internals: $reserved")
    val leftCols = left.columns.toSeq
    // SQL ASOF semantics: a NULL key or NULL timestamp on the right can
    // never match anything (NULL = NULL and ts >= NULL are never true) —
    // unfiltered, a NULL-time row would sort FIRST in the window and
    // become the fabricated match for every early left row, and NULL
    // keys would pair with NULL-key left rows via partitionBy
    val matchableRight = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // Right values travel as ONE struct so the fill is row-atomic: a
    // per-column last(ignoreNulls) would back-fill a null column of the
    // matched right row from an OLDER right row, fabricating a torn row
    // that never existed.
    val valueStruct = struct(valueCols.map(col): _*)
    val structType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, rightTypes(c))))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(col("__t") +: col("__side") +:
        lit(null).cast(structType).as("__vals") +: leftCols.map(col): _*)
    val rTagged = matchableRight
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(col("__t") +: col("__side") +: valueStruct.as("__vals") +:
        leftCols.map(c =>
          if (c == key) col(key)
          else lit(null).cast(leftTypes(c)).as(c)): _*)

    // side 0 sorts before side 1 at equal time -> inclusive (<=) semantics
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__vals.$c").as(c)): _*)
  }
}
