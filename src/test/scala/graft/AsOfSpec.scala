package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the latest right row at or before each left time") {
    val quotes = Seq( // (key, time, px)
      ("A", ts("2024-01-01 10:00:00"), 10.0),
      ("A", ts("2024-01-01 10:05:00"), 11.0),
      ("B", ts("2024-01-01 10:02:00"), 20.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq( // (key, time, qty)
      ("A", ts("2024-01-01 10:00:00"), 1L), // equal ts -> inclusive match 10.0
      ("A", ts("2024-01-01 10:04:59"), 2L), // before second quote -> 10.0
      ("A", ts("2024-01-01 10:06:00"), 3L), // after -> 11.0
      ("B", ts("2024-01-01 10:01:00"), 4L), // before any B quote -> null
      ("C", ts("2024-01-01 10:10:00"), 5L)  // key with no right rows -> null
    ).toDF("sym", "tt", "qty")

    val out = AsOf.asofJoin(trades, quotes, "sym", "tt", "qt", Seq("px"))
      .orderBy("qty")
      .collect().map(r => (r.getLong(r.fieldIndex("qty")),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(10.0)), (2L, Some(10.0)), (3L, Some(11.0)),
      (4L, None), (5L, None)))
  }

  test("asofJoin fills row-atomically: null columns of the matched right row stay null") {
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), None: Option[Double]),
      ("A", ts("2024-01-01 10:05:00"), None: Option[Double], Some(2.0))
    ).toDF("k", "rt", "a", "b")
    val leftDf = Seq(("A", ts("2024-01-01 10:06:00"), 1L)).toDF("k", "lt", "id")
    val r = AsOf.asofJoin(leftDf, right, "k", "lt", "rt", Seq("a", "b")).collect()(0)
    // matched right row is t=10:05 -> (a=null, b=2.0); a MUST NOT be
    // back-filled to 1.0 from the older row
    assert(r.isNullAt(r.fieldIndex("a")))
    assert(r.getDouble(r.fieldIndex("b")) == 2.0)
  }

  test("asofJoin: NULL right keys/timestamps never match (SQL ASOF semantics)") {
    val quotes = Seq(
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 66.0), // null key
      (Option("A"), Option.empty[Timestamp], 77.0),                    // null time
      (Option("A"), Option(ts("2024-01-01 10:00:00")), 10.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      (Option("A"), ts("2024-01-01 09:30:00"), 1L), // BEFORE real quote -> null
      (Option("A"), ts("2024-01-01 10:30:00"), 2L), // after -> 10.0
      (Option.empty[String], ts("2024-01-01 10:30:00"), 3L) // null-key left -> null
    ).toDF("sym", "tt", "qty")
    val out = AsOf.asofJoin(trades, quotes, "sym", "tt", "qt", Seq("px"))
      .orderBy("qty")
      .collect().map(r => (r.getLong(r.fieldIndex("qty")),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq((1L, None), (2L, Some(10.0)), (3L, None)))
  }

  test("asofJoin rejects inputs that collide with its internal columns") {
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1)).toDF("sym", "tt", "__side")
    val r = Seq(("A", ts("2024-01-01 09:00:00"), 2.0)).toDF("sym", "qt", "px")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, "sym", "tt", "qt", Seq("px"))
    }
    assert(e.getMessage.contains("__side"))
  }

  test("asofJoin preserves left row count and rejects column collisions") {
    val l = Seq(("A", ts("2024-01-01 00:00:00"), "x")).toDF("k", "t", "v")
    val r = Seq(("A", ts("2023-12-31 00:00:00"), "y")).toDF("k", "rt", "rv")
    assert(AsOf.asofJoin(l, r, "k", "t", "rt", Seq("rv")).count() == 1)
    intercept[IllegalArgumentException](
      AsOf.asofJoin(l, r, "k", "t", "rt", Seq("v")))
  }
}
