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
    // (with the DSv2 StreamingWrite, .format("graft") is optional —
    // kept here to pin that the explicit-format spelling still works)
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

  test("writeStream.toTable with NO .format: the DSv2 StreamingWrite path, crash-replay exactly-once") {
    val base = catalog("gsv2")
    spark.sql("CREATE TABLE gsv2.out (id INT, v STRING)")
    val ckpt = TestSpark.tmpDir("cstr-v2")
    val mem = MemoryStream[(Int, String)](spark)
    // the natural Delta-style spelling — no .format("graft") anywhere
    val q = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable("gsv2.out")
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      mem.addData((3, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT id FROM gsv2.out").collect().map(_.getInt(0))
      .sorted.toSeq == Seq(1, 2, 3))
    // crash-replay: a fresh query on the SAME checkpoint re-offers the
    // committed epochs; the (appId, batchId) keyed claims no-op them and
    // only genuinely new data lands
    val q2 = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt).toTable("gsv2.out")
    try {
      mem.addData((4, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.sql("SELECT id FROM gsv2.out").collect().map(_.getInt(0))
      .sorted.toSeq == Seq(1, 2, 3, 4), "replay duplicated or lost rows")
    // the epochs are ordinary versioned ACID commits: history records
    // them, per-file stats landed (the direct-claim path collects them),
    // and the sink API reads the same rows
    val sink = new VersionedParquetSink(base)
    assert(sink.read(spark, "out").count() == 4)
    assert(spark.sql("SELECT version FROM gsv2.out.history").count() >= 3)
    // stats-based pruning works on streamed commits like on batch ones:
    // a selective id predicate must not open every file
    val pruned = spark.read.format("graft").load(s"$base/out")
      .where($"id" === 4)
    assert(pruned.collect().map(_.getInt(0)).toSeq == Seq(4))
  }

  test("streaming change feed works through the catalog path") {
    val base = catalog("gcdf")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    val q = spark.readStream.table("gcdf.t.changes")
      .writeStream.format("memory").queryName("gcdf_out")
      .option("checkpointLocation", TestSpark.tmpDir("cstr-cdf")).start()
    try {
      q.processAllAvailable()
      sink.deleteVectored(spark, "t",
        org.apache.spark.sql.functions.col("id") === 1)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("gcdf_out").collect()
      .map(r => (r.getInt(0), r.getString(2))).sorted.toSeq
    assert(rows == Seq((1, "delete"), (1, "insert"), (2, "insert")),
      s"catalog CDF stream wrong: $rows")
  }

  test("readStream reader options (startingVersion) reach the catalog source") {
    val base = catalog("gro")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // v0
    sink.append(Seq((2, "b")).toDF("id", "v"), "t") // v1
    // startingVersion is EXCLUSIVE of the named version's predecessor
    // range: versions > 0 stream, so only v1's row arrives
    val q = spark.readStream.option("startingVersion", 0).table("gro.t")
      .writeStream.format("memory").queryName("gro_out")
      .option("checkpointLocation", TestSpark.tmpDir("cstr-ro")).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("gro_out").collect().map(_.getInt(0)).toSeq == Seq(2),
      "startingVersion reader option was dropped on the catalog path")
  }

  test("toTable CREATES a missing catalog table from the stream's schema") {
    catalog("gnew")
    val mem = MemoryStream[(Int, String)](spark)
    val q = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", TestSpark.tmpDir("cstr-new"))
      .toTable("gnew.fresh")
    try {
      mem.addData((1, "a"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT id, v FROM gnew.fresh").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a")))
    // the auto-created table is a full citizen: history + later batch SQL
    assert(spark.sql("SELECT count(*) FROM gnew.fresh.history")
      .head().getLong(0) >= 1)
    spark.sql("INSERT INTO gnew.fresh VALUES (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM gnew.fresh").head().getLong(0) == 2)
  }

  test("complete-mode streaming aggregation REPLACES the table per epoch (keyed rewrite)") {
    import org.apache.spark.sql.functions._
    catalog("gsc")
    spark.sql("CREATE TABLE gsc.agg (k INT, n BIGINT)")
    val ckpt = TestSpark.tmpDir("cstr-cm")
    val mem = MemoryStream[Int](spark)
    val agg = mem.toDF()
      .groupBy((col("value") % 2).cast("int").as("k"))
      .agg(count(lit(1)).as("n"))
    def current(): Map[Int, Long] =
      spark.sql("SELECT k, n FROM gsc.agg").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt).toTable("gsc.agg")
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      assert(current() == Map(0 -> 1L, 1 -> 2L), current())
      mem.addData(4)
      q.processAllAvailable()
      // replaced, not appended: the running totals, once each
      assert(current() == Map(0 -> 2L, 1 -> 2L), current())
    } finally q.stop()
    // the epochs are logged rewrites: history is travelable and the
    // previous epoch's totals resolve below the latest rewrite
    assert(spark.sql("SELECT count(*) FROM gsc.agg.history")
      .head().getLong(0) >= 3) // create + 2 epoch rewrites
    // crash-replay on the same checkpoint: the keyed rewrite no-ops,
    // totals unchanged
    val q2 = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt).toTable("gsc.agg")
    try {
      mem.addData(5)
      q2.processAllAvailable()
      assert(current() == Map(0 -> 2L, 1 -> 3L), current())
    } finally q2.stop()
  }

  test("DSv2 streaming write serializes timestamps/arrays/decimals like a batch append") {
    import org.apache.spark.sql.functions._
    val base = catalog("gsv2t")
    spark.sql("CREATE TABLE gsv2t.t " +
      "(id INT, ts TIMESTAMP, xs ARRAY<DOUBLE>, d DECIMAL(18,2))")
    def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
      col("value").as("id"),
      to_timestamp(lit("2026-01-02 03:04:05.123456")).as("ts"),
      array(col("value") * 1.5, lit(2.25)).as("xs"),
      lit("12.34").cast("decimal(18,2)").as("d"))
    val mem = MemoryStream[Int](spark)
    val q = shaped(mem.toDF()).writeStream
      .option("checkpointLocation", TestSpark.tmpDir("cstr-v2t"))
      .toTable("gsv2t.t")
    try {
      mem.addData(1, 2)
      q.processAllAvailable()
    } finally q.stop()
    // the identical rows through the batch append path — the executor
    // parquet writer must produce value-identical bytes-on-read
    new graft.engine.VersionedParquetSink(base)
      .append(shaped(Seq(1, 2).toDF("value")), "t2")
    val streamed = spark.sql("SELECT * FROM gsv2t.t ORDER BY id").collect()
    val batch = new graft.engine.VersionedParquetSink(base)
      .read(spark, "t2").orderBy("id").collect()
    assert(streamed.toSeq == batch.toSeq,
      s"streamed ${streamed.mkString(";")} != batch ${batch.mkString(";")}")
    // micros precision survived
    assert(streamed.head.getTimestamp(1).getNanos == 123456000)
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
