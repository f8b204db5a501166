package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Identity columns (Delta GENERATED ALWAYS AS IDENTITY parity):
  * engine-assigned BIGINTs — unique, moving in the increment's
  * direction, gaps allowed; writers may never supply them; concurrent
  * appends serialize through the allocation's base-version pin. */
class IdentityColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("appends allocate unique increasing values from START WITH") {
    val base = TestSpark.tmpDir("idc1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("a", "b").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id", startWith = 100L)
    sink.append(Seq("c", "d", "e").toDF("v"), "t")
    sink.append(Seq("f").toDF("v"), "t")
    val rows = sink.read(spark, "t").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
    val byV = rows.toMap
    // pre-declaration rows read NULL (metadata-only column add)
    assert(byV("a").isEmpty && byV("b").isEmpty)
    val assigned = rows.flatMap(_._2)
    assert(assigned.length == 4)
    assert(assigned.distinct.length == 4, s"duplicate ids: ${assigned.toSeq}")
    assert(assigned.forall(_ >= 100L), s"below START WITH: ${assigned.toSeq}")
    // second append's values are strictly above the first's (direction)
    val batch1 = rows.filter(r => Set("c", "d", "e")(r._1)).flatMap(_._2)
    val batch2 = rows.filter(_._1 == "f").flatMap(_._2)
    assert(batch2.min > batch1.max,
      s"allocation direction broken: $batch1 then $batch2")
  }

  test("negative increment descends") {
    val base = TestSpark.tmpDir("idc2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("a").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id",
      startWith = 0L, incrementBy = -2L)
    sink.append(Seq("b").toDF("v"), "t")
    sink.append(Seq("c").toDF("v"), "t")
    val ids = sink.read(spark, "t").collect()
      .flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    assert(ids.length == 2 && ids.distinct.length == 2)
    assert(ids.forall(_ <= 0L), ids.toSeq)
  }

  test("GENERATED ALWAYS: supplying the column is rejected") {
    val base = TestSpark.tmpDir("idc3")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("a").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id")
    val e = intercept[IllegalArgumentException] {
      sink.append(Seq(("b", 7L)).toDF("v", "id"), "t")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
  }

  test("concurrent appends never collide (allocation races retry)") {
    val base = TestSpark.tmpDir("idc4")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("seed").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id")
    val pool = Executors.newFixedThreadPool(4)
    val go = new CountDownLatch(1)
    val futures = (0 until 4).map { k =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          go.await()
          sink.append(
            (0 until 5).map(i => s"w$k-$i").toDF("v"), "t")
        }
      })
    }
    go.countDown()
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val ids = sink.read(spark, "t").collect()
      .flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    assert(ids.length == 20, s"lost rows: ${ids.length}")
    assert(ids.distinct.length == 20,
      s"identity collision across racing appends: ${ids.sorted.toSeq}")
  }

  test("CALL g.identity declares from SQL; INSERT INTO allocates") {
    val base = TestSpark.tmpDir("idc6")
    spark.conf.set("spark.sql.catalog.idc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.idc.path", base)
    spark.sql("CREATE TABLE idc.t (v STRING)")
    spark.sql(
      "CALL idc.identity(table => 't', column => 'id', start_with => 10)")
    spark.sql("INSERT INTO idc.t (v) VALUES ('a'), ('b')")
    val rows = spark.sql("SELECT v, id FROM idc.t").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.length == 2)
    assert(rows.map(_._2).distinct.length == 2)
    assert(rows.map(_._2).forall(_ >= 10L), rows.toSeq)
  }

  test("streaming epochs allocate identity values (governed re-stage)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = TestSpark.tmpDir("idc7")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("seed").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id")
    val mem = MemoryStream[String](spark)
    val q = mem.toDF().toDF("v").writeStream.format("graft")
      .option("checkpointLocation", TestSpark.tmpDir("idc7c"))
      .start(s"$base/t")
    try {
      mem.addData("a", "b")
      q.processAllAvailable()
      mem.addData("c")
      q.processAllAvailable()
    } finally q.stop()
    val ids = sink.read(spark, "t").collect()
      .flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    assert(ids.length == 3, s"missing allocations: ${ids.toSeq}")
    assert(ids.distinct.length == 3, s"collisions: ${ids.sorted.toSeq}")
  }

  test("wide table (identity outside the 32-column stats cap) still " +
      "advances the high water — no duplicates") {
    // FileStats caps stats at the first 32 eligible columns; with 32
    // long columns ahead of it, the appended identity column gets NO
    // per-file stats. The allocation must then derive the extreme
    // directly — a stale high water would mint duplicates on the next
    // append.
    val base = TestSpark.tmpDir("idc8")
    val sink = new VersionedParquetSink(base)
    val wideCols = (0 until 32).map(i => s"c$i")
    def wide(vals: Seq[Long]) = {
      val df = vals.toDF("c0")
      wideCols.drop(1).foldLeft(df)((d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.col("c0")))
    }
    sink.append(wide(Seq(1L)), "t")
    sink.setIdentityColumn(spark, "t", "id", startWith = 100L)
    sink.append(wide(Seq(2L, 3L)), "t")
    sink.append(wide(Seq(4L)), "t")
    sink.append(wide(Seq(5L, 6L)), "t")
    val ids = sink.read(spark, "t").select("id").collect()
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    assert(ids.length == 5, s"missing allocations: ${ids.toSeq}")
    assert(ids.distinct.length == 5,
      s"stats-cap high-water stall minted duplicates: ${ids.sorted.toSeq}")
    assert(ids.forall(_ >= 100L), ids.toSeq)
  }

  test("_delta_log mirror: writer 6 + delta.identity.* field metadata, " +
      "high water re-emitted per allocation") {
    val store = TestSpark.tmpDir("idc9")
    val sink = new VersionedParquetSink(store)
    sink.append(Seq("a").toDF("v"), "t") // v0
    sink.setIdentityColumn(spark, "t", "id", startWith = 100L,
      incrementBy = 2L) // v1
    sink.append(Seq("b", "c").toDF("v"), "t") // v2: allocates
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val src = scala.io.Source.fromFile(
        new java.io.File(s"$store/t/_delta_log", f"$v%020d.json"), "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
      finally src.close()
    }
    def identMeta(v: Long): com.fasterxml.jackson.databind.JsonNode = {
      val meta = actions(v).flatMap(a => Option(a.get("metaData"))).head
      val fields = mapper.readTree(meta.get("schemaString").asText)
        .get("fields")
      (0 until fields.size).map(fields.get)
        .find(_.get("name").asText == "id").get.get("metadata")
    }
    // the declaration commit upgrades the protocol and carries the seed
    val proto = actions(1).flatMap(a => Option(a.get("protocol"))).head
    assert(proto.get("minWriterVersion").asInt == 6)
    val m1 = identMeta(1)
    assert(m1.get("delta.identity.start").asLong == 100L)
    assert(m1.get("delta.identity.step").asLong == 2L)
    assert(!m1.get("delta.identity.allowExplicitInsert").asBoolean)
    val hw1 = m1.get("delta.identity.highWaterMark").asLong
    // the allocation commit re-emits metaData with the advanced water
    val m2 = identMeta(2)
    val hw2 = m2.get("delta.identity.highWaterMark").asLong
    assert(hw2 > hw1, s"high water did not advance in the mirror: $hw1 -> $hw2")
    val ids = sink.read(spark, "t").select("id").collect()
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    assert(hw2 == ids.max, s"mirror water $hw2 vs actual max ${ids.max}")
  }

  test("keyed replay of an identity append is a no-op") {
    val base = TestSpark.tmpDir("idc5")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq("a").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id")
    assert(sink.appendOnce(Seq("b").toDF("v"), "t", "k1"))
    assert(!sink.appendOnce(Seq("b").toDF("v"), "t", "k1"))
    assert(sink.read(spark, "t").count() == 2L)
  }
}
