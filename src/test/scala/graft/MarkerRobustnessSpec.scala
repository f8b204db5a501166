package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** The commit-marker format is load-bearing (keys drive exactly-once,
  * props drive governance) and parsed by flat regexes — every
  * string-valued field must roundtrip HOSTILE content (quotes,
  * newlines, unicode, JSON fragments) through its base64 armor. */
class MarkerRobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hostile = Seq(
    """quote" and \ backslash""",
    "line\nbreak\tand tab",
    "unicode: é中文 😀",
    """{"json":"fragment","n":1}""",
    "trailing space ",
    "comma,separated,things")

  test("idempotency keys roundtrip hostile content exactly") {
    val base = TestSpark.tmpDir("mr1")
    val sink = new VersionedParquetSink(base)
    hostile.zipWithIndex.foreach { case (k, i) =>
      assert(sink.appendOnce(Seq((i.toLong, "v")).toDF("id", "v"), "t", k),
        s"first append under key <$k> did not land")
      assert(!sink.appendOnce(Seq((i.toLong, "dup")).toDF("id", "v"), "t", k),
        s"replay under key <$k> double-appended — key corrupted in marker")
    }
    assert(sink.read(spark, "t").count() == hostile.size.toLong)
    // keys survive a checkpointed manifest identically
    val h = sink.history(spark, "t").collect()
      .flatMap(r => Option(r.getAs[String]("commitKey"))).toSet
    assert(h == hostile.toSet, s"keys mangled: $h")
  }

  test("userMetadata and TBLPROPERTIES values roundtrip hostile content") {
    val base = TestSpark.tmpDir("mr2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    hostile.foreach { m =>
      spark.conf.set("spark.graft.commitInfo.userMetadata", m)
      try sink.append(Seq((1L, "x")).toDF("id", "v"), "t")
      finally spark.conf.unset("spark.graft.commitInfo.userMetadata")
      val latest = sink.history(spark, "t").collect()
        .maxBy(_.getLong(0)).getAs[String]("userMetadata")
      assert(latest == m, s"userMetadata mangled: <$latest> != <$m>")
    }
    sink.setProperties(spark, "t", Map("note" -> hostile.mkString("|")))
    assert(sink.propertiesOf(spark, "t")("note") == hostile.mkString("|"))
  }
}
