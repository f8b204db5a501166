package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Generated columns on the versioned sink (Delta writer feature v4):
  * a declared column is COMPUTED when a write omits it and VALIDATED
  * per row when a write provides it; UPDATE recomputes it when its
  * sources change. */
class GeneratedColumnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("declaration validates existing rows; appends compute or validate") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc1"))
    sink.append(Seq((1, 10, 20), (2, 5, 10)).toDF("id", "n", "n2"), "t")
    // existing rows must already satisfy the expression
    intercept[IllegalArgumentException] {
      sink.setGeneratedColumn(spark, "t", "n2", "n * 3")
    }
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2")
    assert(sink.generatedColumnsOf(spark, "t") == Map("n2" -> "n * 2"))
    // an append OMITTING the column gets it computed (schema-exact)
    sink.append(Seq((3, 7)).toDF("id", "n"), "t")
    assert(sink.read(spark, "t").filter(col("id") === 3)
      .head().getInt(2) == 14)
    // an append PROVIDING a correct value passes, a wrong one throws
    sink.append(Seq((4, 8, 16)).toDF("id", "n", "n2"), "t")
    val e = intercept[Exception] {
      sink.append(Seq((5, 9, 99)).toDF("id", "n", "n2"), "t")
    }
    assert(e.getMessage.contains("n2") ||
      Option(e.getCause).exists(_.getMessage.contains("n2")))
    assert(sink.read(spark, "t").count() == 4) // failed append invisible
  }

  test("updateVectored recomputes generated columns, rejects direct SET") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc2"))
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t")
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2")
    intercept[IllegalArgumentException] {
      sink.updateVectored(spark, "t", col("id") === 1,
        Map("n2" -> org.apache.spark.sql.functions.lit(99)))
    }
    // updating the SOURCE recomputes the generated column
    sink.updateVectored(spark, "t", col("id") === 1,
      Map("n" -> (col("n") + 1)))
    val r = sink.read(spark, "t").head()
    assert(r.getInt(1) == 11 && r.getInt(2) == 22)
  }

  test("merge computes omitted generated columns and validates provided") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc3"))
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t")
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2")
    // upsert WITHOUT the generated column: computed
    sink.merge(spark, "t", Seq((1, 50), (2, 6)).toDF("id", "n"), Seq("id"))
    val rows = sink.read(spark, "t").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1, 50, 100), (2, 6, 12)))
    // upsert WITH a wrong value: rejected, table unchanged
    intercept[Exception] {
      sink.merge(spark, "t", Seq((2, 6, 13)).toDF("id", "n", "n2"), Seq("id"))
    }
    assert(sink.read(spark, "t").filter(col("id") === 2)
      .head().getInt(2) == 12)
  }

  test("rename migrates the declaration; dropping a source is rejected") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc4"))
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t")
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2")
    // renaming the SOURCE column is rejected (expression references it)
    intercept[IllegalArgumentException] {
      sink.renameColumn(spark, "t", "n", "base")
    }
    // dropping the source is rejected too
    intercept[IllegalArgumentException] { sink.dropColumn(spark, "t", "n") }
    // renaming the GENERATED column migrates the declaration
    sink.renameColumn(spark, "t", "n2", "doubled")
    assert(sink.generatedColumnsOf(spark, "t") == Map("doubled" -> "n * 2"))
    sink.append(Seq((2, 4)).toDF("id", "n"), "t") // still computed
    assert(sink.read(spark, "t").filter(col("id") === 2)
      .head().getInt(2) == 8)
    // dropping the generated column drops its declaration
    sink.dropColumn(spark, "t", "doubled")
    assert(sink.generatedColumnsOf(spark, "t").isEmpty)
    sink.append(Seq((3, 5)).toDF("id", "n"), "t")
    assert(sink.read(spark, "t").columns.toSeq == Seq("id", "n"))
  }

  test("restore brings back the declaration set as of the target version") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc5"))
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t") // v0
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2") // v1
    sink.dropGeneratedColumn(spark, "t", "n2") // v2
    sink.restore(spark, "t", 1L) // v3: declaration back
    assert(sink.generatedColumnsOf(spark, "t") == Map("n2" -> "n * 2"))
    sink.append(Seq((2, 3)).toDF("id", "n"), "t") // computed again
    assert(sink.read(spark, "t").filter(col("id") === 2)
      .head().getInt(2) == 6)
  }

  test("_delta_log: writer 4 upgrade + delta.generationExpression metadata") {
    val store = TestSpark.tmpDir("gc6")
    val sink = new VersionedParquetSink(store)
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t") // v0
    sink.setGeneratedColumn(spark, "t", "n2", "n * 2") // v1
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val src = scala.io.Source.fromFile(
        new java.io.File(s"$store/t/_delta_log", f"$v%020d.json"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
      finally src.close()
    }
    val proto = actions(1).flatMap(a => Option(a.get("protocol"))).head
    assert(proto.get("minReaderVersion").asInt == 1)
    assert(proto.get("minWriterVersion").asInt == 4)
    val meta = actions(1).flatMap(a => Option(a.get("metaData"))).head
    val fields = mapper.readTree(meta.get("schemaString").asText).get("fields")
    val n2 = (0 until fields.size).map(fields.get)
      .find(_.get("name").asText == "n2").get
    assert(n2.get("metadata").get("delta.generationExpression")
      .asText == "n * 2")
  }

  test("declarations survive checkpoints and compaction; keyed replay") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("gc7"),
      checkpointInterval = 3)
    sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t")
    val g1 = sink.setGeneratedColumn(spark, "t", "n2", "n * 2",
      commitKey = Some("g-1"))
    val g2 = sink.setGeneratedColumn(spark, "t", "n2", "n * 2",
      commitKey = Some("g-1")) // replay: no "already generated" error
    assert(g1 == g2)
    (2 to 5).foreach(i => sink.append(Seq((i, i)).toDF("id", "n"), "t"))
    sink.compact(spark, "t", targetFiles = Some(1))
    assert(sink.generatedColumnsOf(spark, "t") == Map("n2" -> "n * 2"))
    sink.append(Seq((9, 9)).toDF("id", "n"), "t")
    assert(sink.read(spark, "t").filter(col("id") === 9)
      .head().getInt(2) == 18)
  }
}
