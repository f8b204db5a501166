package graft.engine

import java.nio.charset.StandardCharsets
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file column statistics for data skipping — the read-path feature
  * that makes Delta's storage layer fast (per-file min/max in the commit
  * log lets a selective read open a fraction of the files; the reference
  * leans on Delta storage, README.md:12). The JSON shape matches Delta's
  * add-action `stats` field ({"numRecords", "minValues", "maxValues",
  * "nullCount"}), so the same payload serves both the sink's own marker
  * (`statsB64`) and the external `_delta_log` mirror.
  *
  * Collection is ONE distributed aggregation over the freshly written
  * directory grouped by `input_file_name()` — Delta computes the same
  * stats inline during its write; without a write hook, the post-write
  * pass (over files still hot in page cache) is the honest equivalent,
  * and it yields EXACT values (footer stats can be writer-truncated for
  * strings, which would make max-prefix pruning unsound).
  *
  * Pruning ([[mayMatch]]) is deliberately conservative: it only ever
  * answers "this file CANNOT satisfy the predicate" for the shapes it
  * fully understands (And/Or, comparisons and In between a bare column
  * and literals, IsNull/IsNotNull); everything else keeps the file.
  * Correctness never depends on it — callers re-apply the full filter.
  */
object FileStats {

  /** Delta's default: stats on the first 32 eligible columns. */
  val MaxStatsColumns = 32

  /** numRecords + per-column min/max (absent when all-null or non-finite)
    * and null counts for one data file. */
  final case class PerFile(numRecords: Long, minV: Map[String, JsonNode],
      maxV: Map[String, JsonNode], nulls: Map[String, Long])

  private val mapper = new ObjectMapper()

  private def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The columns stats are collected for (orderable primitives, first
    * [[MaxStatsColumns]] — nested/array/binary columns are never
    * prunable here, same as Delta). */
  def statsColumns(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => eligible(f.dataType)).take(MaxStatsColumns)

  /** One aggregation pass over `dir`: per-file stats, serialized as
    * `{"<fileName>": {"numRecords":N,"minValues":{...},"maxValues":{...},
    * "nullCount":{...}}}`. Returns None when the schema has no eligible
    * columns AND the dir is empty of use (still records numRecords). */
  def collect(spark: SparkSession, dir: String, schema: StructType): String = {
    val cols = statsColumns(schema)
    val df = spark.read.schema(schema).parquet(dir)
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("_n") +: cols.flatMap { f =>
        Seq(min(col(f.name)).as(s"__min_${f.name}"),
          max(col(f.name)).as(s"__max_${f.name}"),
          sum(when(col(f.name).isNull, 1L).otherwise(0L))
            .as(s"__null_${f.name}"))
      }
    val rows = df.groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val root = mapper.createObjectNode()
    // zero-row part files never reach the aggregation but still exist on
    // disk; record them with numRecords 0 so (a) every data file has a
    // stats entry (the _delta_log mirror attaches stats per add action)
    // and (b) the pruner can skip them outright
    df.inputFiles.map(_.split('/').last)
      .filterNot(f => rows.exists(_.getString(0).split('/').last == f))
      .foreach { f =>
        val entry = root.putObject(f)
        entry.put("numRecords", 0L)
        entry.putObject("minValues")
        entry.putObject("maxValues")
        entry.putObject("nullCount")
      }
    rows.foreach { r =>
      val fileName = r.getString(0).split('/').last
      val entry = root.putObject(fileName)
      entry.put("numRecords", r.getLong(1))
      val minN = entry.putObject("minValues")
      val maxN = entry.putObject("maxValues")
      val nullN = entry.putObject("nullCount")
      cols.zipWithIndex.foreach { case (f, i) =>
        val minVal = r.get(2 + i * 3)
        val maxVal = r.get(3 + i * 3)
        val nulls = r.getLong(4 + i * 3)
        nullN.put(f.name, nulls)
        // NaN/Infinity are not JSON and their ordering is engine-specific
        // — omit the bound, leaving the column un-prunable for this file
        def finite(v: Any): Boolean = v match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite
          case fl: java.lang.Float => !fl.isNaN && !fl.isInfinite
          case _ => true
        }
        if (minVal != null && maxVal != null && finite(minVal) && finite(maxVal)) {
          putValue(minN, f, minVal)
          putValue(maxN, f, maxVal)
        }
      }
    }
    mapper.writeValueAsString(root)
  }

  private def putValue(node: com.fasterxml.jackson.databind.node.ObjectNode,
      f: StructField, v: Any): Unit = v match {
    case b: java.lang.Boolean => node.put(f.name, b.booleanValue)
    case b: java.lang.Byte => node.put(f.name, b.longValue)
    case s: java.lang.Short => node.put(f.name, s.longValue)
    case i: java.lang.Integer => node.put(f.name, i.longValue)
    case l: java.lang.Long => node.put(f.name, l.longValue)
    case fl: java.lang.Float => node.put(f.name, fl.doubleValue)
    case d: java.lang.Double => node.put(f.name, d.doubleValue)
    case d: java.math.BigDecimal => node.put(f.name, d)
    case s: String => node.put(f.name, s)
    case d: java.sql.Date => node.put(f.name, d.toString) // yyyy-MM-dd
    case t: java.sql.Timestamp => node.put(f.name, t.toInstant.toString)
    case t: LocalDateTime => node.put(f.name, t.toString) // NTZ
    case other => node.put(f.name, other.toString)
  }

  def parse(json: String): Map[String, PerFile] = {
    val root = mapper.readTree(json)
    root.properties().asScala.map { e =>
      val v = e.getValue
      def obj(name: String): Map[String, JsonNode] =
        Option(v.get(name)).map(_.properties().asScala
          .map(p => p.getKey -> p.getValue).toMap).getOrElse(Map.empty)
      e.getKey -> PerFile(
        Option(v.get("numRecords")).map(_.asLong).getOrElse(0L),
        obj("minValues"), obj("maxValues"),
        obj("nullCount").map { case (k, n) => k -> n.asLong })
    }.toMap
  }

  // ---- pruning ----------------------------------------------------------

  /** Spark compares strings as unsigned UTF-8 bytes (UTF8String order),
    * which differs from String.compareTo for supplementary characters —
    * pruning must use the SAME order the stats were min/max'd under. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Normalized ordering domain: numerics/dates/timestamps → BigDecimal,
    * strings → String (UTF-8 order), booleans → Boolean. */
  private sealed trait Key { def cmp(o: Key): Option[Int] }
  private final case class NumKey(v: BigDecimal) extends Key {
    def cmp(o: Key): Option[Int] = o match {
      case NumKey(w) => Some(v.compare(w)); case _ => None }
  }
  private final case class StrKey(v: String) extends Key {
    def cmp(o: Key): Option[Int] = o match {
      case StrKey(w) => Some(utf8Compare(v, w)); case _ => None }
  }
  private final case class BoolKey(v: Boolean) extends Key {
    def cmp(o: Key): Option[Int] = o match {
      case BoolKey(w) => Some(v.compare(w)); case _ => None }
  }

  private def statKey(dt: DataType, n: JsonNode): Option[Key] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType =>
        Some(NumKey(BigDecimal(n.asText)))
      case StringType => Some(StrKey(n.asText))
      case BooleanType => Some(BoolKey(n.asBoolean))
      case DateType =>
        Some(NumKey(BigDecimal(LocalDate.parse(n.asText).toEpochDay)))
      case TimestampType =>
        val inst = java.time.Instant.parse(n.asText)
        Some(NumKey(BigDecimal(inst.getEpochSecond) * 1000000L +
          BigDecimal(inst.getNano / 1000)))
      case TimestampNTZType =>
        val ldt = LocalDateTime.parse(n.asText)
        val inst = ldt.toInstant(ZoneOffset.UTC)
        Some(NumKey(BigDecimal(inst.getEpochSecond) * 1000000L +
          BigDecimal(inst.getNano / 1000)))
      case _ => None
    } catch { case _: Exception => None }

  /** Catalyst literal → ordering key. Timestamp/date literals carry
    * micros/days internally, matching [[statKey]]'s normalization. */
  private def litKey(l: Literal): Option[Key] = l.value match {
    case null => None
    case b: java.lang.Boolean => Some(BoolKey(b))
    case b: java.lang.Byte => Some(NumKey(BigDecimal(b.longValue)))
    case s: java.lang.Short => Some(NumKey(BigDecimal(s.longValue)))
    case i: java.lang.Integer => l.dataType match {
      case DateType => Some(NumKey(BigDecimal(i.longValue))) // epoch days
      case _ => Some(NumKey(BigDecimal(i.longValue)))
    }
    case lo: java.lang.Long => Some(NumKey(BigDecimal(lo.longValue))) // incl ts micros
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None else Some(NumKey(BigDecimal(f.doubleValue)))
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some(NumKey(BigDecimal(d.doubleValue)))
    case d: Decimal => Some(NumKey(d.toBigDecimal))
    case d: java.math.BigDecimal => Some(NumKey(BigDecimal(d)))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(StrKey(u.toString))
    case s: String => Some(StrKey(s))
    case _ => None
  }

  /** The DATE literal caveat: an Int literal is only epoch-days when its
    * dataType is DateType, and comparing it against a date column's stat
    * (also epoch-days) is sound; Int-vs-Int is trivially sound. A literal
    * whose type domain can't match the column's (e.g. string literal vs
    * long column after an implicit cast was stripped) yields None from
    * `cmp` and keeps the file. */
  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Literal, possibly under the implicit Cast type coercion inserts
    * around it during analysis (`col("id") === 4500` casts the Int
    * literal up to the column's Long) — folded eagerly, since pruning
    * runs before the optimizer would fold it. */
  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case c: Cast if c.child.isInstanceOf[Literal] =>
        try Some(Literal.create(c.eval(null), c.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Resolve a user predicate against `schema` the same way a real read
    * would: analyze `dummy.filter(condition)` and pull the resolved
    * Filter condition — attribute references bound, comparison functions
    * resolved to their catalyst nodes, type coercion applied. Returns
    * None (prune nothing) if the shape is unexpected. */
  def resolvePredicate(spark: SparkSession, schema: StructType,
      condition: org.apache.spark.sql.Column): Option[Expression] = {
    val dummy = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    dummy.filter(condition).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
  }

  private final case class ColStats(dt: DataType, lo: Option[Key],
      hi: Option[Key], nulls: Option[Long], numRecords: Long) {
    def allNull: Boolean = numRecords > 0 && nulls.contains(numRecords)
  }

  private def colStats(schema: StructType, pf: PerFile,
      name: String): Option[ColStats] =
    schema.fields.find(_.name == name).map { f =>
      ColStats(f.dataType,
        pf.minV.get(name).flatMap(statKey(f.dataType, _)),
        pf.maxV.get(name).flatMap(statKey(f.dataType, _)),
        pf.nulls.get(name), pf.numRecords)
    }

  /** Can any row of the file with stats `pf` satisfy `pred`? Answers
    * false ONLY on certain impossibility; true whenever uncertain. */
  def mayMatch(pred: Expression, schema: StructType, pf: PerFile): Boolean = {
    if (pf.numRecords == 0) return false // an empty file satisfies nothing
    def cmpPred(attr: Expression, lit: Literal,
        test: (ColStats, Key) => Boolean): Boolean = {
      (attrName(attr), litKey(lit)) match {
        case (Some(name), Some(k)) =>
          colStats(schema, pf, name) match {
            case Some(cs) =>
              if (cs.allNull) false // comparison with all-null column: no row matches
              else test(cs, k)
            case None => true
          }
        case (Some(_), None) =>
          // `col <op> NULL` is NULL for every row — never satisfied;
          // a literal we can't key (NaN etc.) keeps the file
          lit.value != null
        case _ => true
      }
    }
    // range tests; an absent bound (no stats / non-finite) keeps the file
    def geLo(cs: ColStats, k: Key) = cs.lo.flatMap(_.cmp(k)).forall(_ <= 0)
    def gtLo(cs: ColStats, k: Key) = cs.lo.flatMap(_.cmp(k)).forall(_ < 0)
    def leHi(cs: ColStats, k: Key) = cs.hi.flatMap(_.cmp(k)).forall(_ >= 0)
    def ltHi(cs: ColStats, k: Key) = cs.hi.flatMap(_.cmp(k)).forall(_ > 0)
    def inRange(cs: ColStats, k: Key) = geLo(cs, k) && leHi(cs, k)

    pred match {
      case And(l, r) => mayMatch(l, schema, pf) && mayMatch(r, schema, pf)
      case Or(l, r) => mayMatch(l, schema, pf) || mayMatch(r, schema, pf)
      case EqualTo(a, Lit(l)) => cmpPred(a, l, inRange)
      case EqualTo(Lit(l), a) => cmpPred(a, l, inRange)
      case EqualNullSafe(a, Lit(l)) if l.value != null => cmpPred(a, l, inRange)
      case EqualNullSafe(Lit(l), a) if l.value != null => cmpPred(a, l, inRange)
      // attr < lit possible iff file min < lit, etc.
      case LessThan(a, Lit(l)) => cmpPred(a, l, gtLo)
      case LessThan(Lit(l), a) => cmpPred(a, l, ltHi) // lit < attr ≡ attr > lit
      case LessThanOrEqual(a, Lit(l)) => cmpPred(a, l, geLo)
      case LessThanOrEqual(Lit(l), a) => cmpPred(a, l, leHi)
      case GreaterThan(a, Lit(l)) => cmpPred(a, l, ltHi)
      case GreaterThan(Lit(l), a) => cmpPred(a, l, gtLo)
      case GreaterThanOrEqual(a, Lit(l)) => cmpPred(a, l, leHi)
      case GreaterThanOrEqual(Lit(l), a) => cmpPred(a, l, geLo)
      case In(a, vs) if vs.forall(Lit.unapply(_).isDefined) =>
        vs.exists(v => cmpPred(a, Lit.unapply(v).get, inRange))
      case IsNull(a) =>
        attrName(a).flatMap(n => colStats(schema, pf, n)) match {
          case Some(cs) => cs.numRecords == 0 || cs.nulls.forall(_ > 0)
          case None => true
        }
      case IsNotNull(a) =>
        attrName(a).flatMap(n => colStats(schema, pf, n)) match {
          case Some(cs) => !cs.allNull && cs.numRecords > 0
          case None => true
        }
      case _ => true
    }
  }
}
