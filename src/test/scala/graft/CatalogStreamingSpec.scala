package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** The catalog STREAMING face: `spark.readStream.table("g.tbl")` and
  * `writeStream.format("graft").toTable("g.tbl")`, wired through
  * [[graft.sources.GraftTable]]'s `V2TableWithV1Fallback` (Delta's own
  * integration shape) into the tested V1 `format("graft")`
  * source/sink. Reference analogue: the continuous-ingest loop
  * (`/root/reference/news_insights/collector.py:231-240`) — here the
  * whole loop is a catalog-addressed streaming query. */
class CatalogStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def catalog(name: String): String = {
    val base = TestSpark.tmpDir(s"cstr-$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path", base)
    base
  }

  test("readStream.table tails a catalog table across commits") {
    catalog("gsr")
    spark.sql("CREATE TABLE gsr.ev (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gsr.ev VALUES (1, 'a')")
    val stream = spark.readStream.table("gsr.ev")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("cstr_out")
      .option("checkpointLocation", TestSpark.tmpDir("cstr-rc"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cstr_out").count() == 1)
      spark.sql("INSERT INTO gsr.ev VALUES (2, 'b'), (3, 'c')")
      q.processAllAvailable()
      assert(spark.table("cstr_out").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("writeStream.toTable commits micro-batches exactly once") {
    val base = catalog("gsw")
    spark.sql("CREATE TABLE gsw.out (id INT, v STRING)")
    val ckpt = TestSpark.tmpDir("cstr-wc")
    val mem = MemoryStream[(Int, String)](spark)
    // .format("graft") is required before .toTable: Spark's V1 fallback
    // enforces source == provider (same as OSS Delta)
    val q = mem.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).toTable("gsw.out")
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT id FROM gsw.out").collect().map(_.getInt(0))
      .sorted.toSeq == Seq(1, 2))
    // restart on the same checkpoint: no replayed duplicates, new data
    // lands — and the writes are ordinary versioned commits (history
    // grows, time travel still works)
    val q2 = mem.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).toTable("gsw.out")
    try {
      mem.addData((3, "c"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.sql("SELECT id FROM gsw.out").collect().map(_.getInt(0))
      .sorted.toSeq == Seq(1, 2, 3), "replay duplicated or lost rows")
    val sink = new VersionedParquetSink(base)
    assert(sink.read(spark, "out").count() == 3)
  }

  test("catalog streaming writes enforce table governance per batch") {
    // the V1-fallback route was chosen precisely so streaming writes
    // ride the sink's governed append — a CHECK constraint must fail
    // the violating micro-batch exactly like a batch INSERT
    val base = catalog("gsg")
    spark.sql("CREATE TABLE gsg.gov (id INT, v STRING)")
    new VersionedParquetSink(base)
      .addConstraint(spark, "gov", "pos_id", "id > 0")
    val mem = MemoryStream[(Int, String)](spark)
    val q = mem.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", TestSpark.tmpDir("cstr-gc"))
      .toTable("gsg.gov")
    try {
      mem.addData((1, "ok"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gsg.gov").count() == 1)
      mem.addData((-5, "bad"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("pos_id") ||
        Option(e.getCause).exists(_.getMessage.contains("pos_id")) ||
        e.toString.contains("pos_id"),
        s"constraint name missing from failure: $e")
    } finally q.stop()
    // the violating batch landed nowhere
    assert(spark.sql("SELECT * FROM gsg.gov").count() == 1)
  }

  test("streaming a time-traveled snapshot fails loudly; batch unaffected") {
    catalog("gst")
    spark.sql("CREATE TABLE gst.t (id INT)")
    spark.sql("INSERT INTO gst.t VALUES (1)")
    spark.sql("INSERT INTO gst.t VALUES (2)")
    // batch time travel still resolves through the V2 relation
    assert(spark.sql("SELECT * FROM gst.t VERSION AS OF 1").count() == 1)
    val e = intercept[Exception] {
      new graft.sources.GraftTable(
        spark.conf.get("spark.sql.catalog.gst.path"), "t", Some(1L), None)
        .v1Table
    }
    assert(e.getMessage.contains("time-traveled"))
  }
}
