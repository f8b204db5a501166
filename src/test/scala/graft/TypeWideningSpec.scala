package graft

import org.scalatest.funsuite.AnyFunSuite

/** Type widening (Delta 4.0 parity): an evolution append may widen a
  * column along the lossless chain (byte->short->int->long,
  * float->double). The commit log adopts the wider type; files written
  * before the widening stay readable because Spark's parquet readers
  * upcast natively — no rewrite, no copy. */
class TypeWideningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  import graft.engine.VersionedParquetSink

  test("parquet reader upcasts int->long and float->double") {
    val dir = TestSpark.tmpDir("tw0")
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").write.parquet(s"$dir/p")
    val rows = spark.read.schema("i BIGINT, f DOUBLE").parquet(s"$dir/p")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5)))
  }

  test("evolution append widens int->long; history stays readable") {
    val base = TestSpark.tmpDir("tw1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // id: INT
    sink.append(Seq((5000000000L, "b")).toDF("id", "v"), "t",
      allowEvolution = true) // id: BIGINT — beyond int range
    val cur = sink.read(spark, "t")
    assert(cur.schema("id").dataType.typeName == "long")
    assert(cur.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 5000000000L))
    // time travel below the widening shows the narrow type
    assert(sink.readAt(spark, "t", 0)
      .schema("id").dataType.typeName == "integer")
    // the format read path upcasts the old file identically
    assert(spark.read.format("graft").load(s"$base/t")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5000000000L))
  }

  test("float->double widening composes with stats pruning") {
    val base = TestSpark.tmpDir("tw2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, 1.5f)).toDF("id", "x"), "t")
    sink.append(Seq((2L, 9.25)).toDF("id", "x"), "t",
      allowEvolution = true)
    val rows = spark.read.format("graft").load(s"$base/t")
      .where(org.apache.spark.sql.functions.col("x") > 2.0)
      .collect().map(_.getDouble(1))
    assert(rows.toSeq == Seq(9.25))
  }

  test("narrowing and arbitrary retypes stay rejected") {
    val base = TestSpark.tmpDir("tw3")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((5000000000L, "a")).toDF("id", "v"), "t") // BIGINT
    val e = intercept[IllegalArgumentException] {
      sink.append(Seq((1, "b")).toDF("id", "v"), "t",
        allowEvolution = true) // INT: narrowing
    }
    assert(e.getMessage.contains("narrowed"), e.getMessage)
    intercept[IllegalArgumentException] {
      sink.append(Seq(("x", "b")).toDF("id", "v"), "t",
        allowEvolution = true) // STRING: retype
    }
    assert(sink.read(spark, "t").count() == 1L)
  }

  test("widening via format write with mergeSchema option") {
    val base = TestSpark.tmpDir("tw4")
    Seq((1, "a")).toDF("id", "v").write.format("graft")
      .mode("append").save(s"$base/t")
    Seq((6000000000L, "b")).toDF("id", "v").write.format("graft")
      .option("mergeSchema", "true").mode("append").save(s"$base/t")
    assert(spark.read.format("graft").load(s"$base/t")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 6000000000L))
  }
}
