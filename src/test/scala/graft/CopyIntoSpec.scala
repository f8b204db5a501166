package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** COPY INTO (Delta parity): file-granular idempotent bulk load — each
  * source file loads exactly once across any number of re-runs, the
  * loaded-file ledger rides the commit marker (atomic with the rows),
  * and write governance applies to copied rows like any append. */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Writes `rows` as one parquet file named `name` directly in `dir`. */
  private def srcFile(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = TestSpark.tmpDir("cisrc")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles).toSeq.flatten
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("loads each file once; re-runs load only the delta") {
    val base = TestSpark.tmpDir("ci1")
    val src = TestSpark.tmpDir("ci1s")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    srcFile(src, "a.parquet", Seq((1L, "a")))
    srcFile(src, "b.parquet", Seq((2L, "b")))
    assert(sink.copyInto(spark, "t", src) == 2L)
    assert(sink.copyInto(spark, "t", src) == 0L, "re-run double-loaded")
    srcFile(src, "c.parquet", Seq((3L, "c")))
    assert(sink.copyInto(spark, "t", src) == 1L, "delta not detected")
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
    // the ledger survives compaction-style rewrites of the manifest tail
    assert(sink.history(spark, "t")
      .filter(col("operation") === "COPY").count() == 2L)
  }

  test("a modified source file (new mtime/length) reloads") {
    val base = TestSpark.tmpDir("ci2")
    val src = TestSpark.tmpDir("ci2s")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    srcFile(src, "a.parquet", Seq((1L, "a")))
    assert(sink.copyInto(spark, "t", src) == 1L)
    srcFile(src, "a.parquet", Seq((1L, "a-rewritten-longer")))
    assert(sink.copyInto(spark, "t", src) == 1L,
      "changed file identity (len/mtime) must reload")
    assert(sink.read(spark, "t").count() == 3L)
  }

  test("governance applies: a CHECK-violating file aborts atomically") {
    val base = TestSpark.tmpDir("ci3")
    val src = TestSpark.tmpDir("ci3s")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((5L, "seed")).toDF("id", "v"), "t")
    sink.addConstraint(spark, "t", "pos", "id > 0")
    srcFile(src, "bad.parquet", Seq((-1L, "bad")))
    intercept[Exception] { sink.copyInto(spark, "t", src) }
    assert(sink.read(spark, "t").count() == 1L, "violating rows leaked")
    // the failed run recorded nothing: fixing the source reloads cleanly
    srcFile(src, "bad.parquet", Seq((7L, "good")))
    assert(sink.copyInto(spark, "t", src) == 1L)
    assert(sink.read(spark, "t").count() == 2L)
  }

  test("CALL g.copy_into drives the same ledger from SQL") {
    val base = TestSpark.tmpDir("ci5")
    val src = TestSpark.tmpDir("ci5s")
    spark.conf.set("spark.sql.catalog.cic",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cic.path", base)
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    srcFile(src, "a.parquet", Seq((1L, "a")))
    val r1 = spark.sql(
      s"CALL cic.copy_into(table => 't', source => '$src')").collect()
    assert(r1.head.getString(0).startsWith("loaded 1 file"), r1.head)
    val r2 = spark.sql(
      s"CALL cic.copy_into(table => 't', source => '$src')").collect()
    assert(r2.head.getString(0).startsWith("loaded 0 file"), r2.head)
    assert(spark.table("cic.t").count() == 2L)
  }

  test("racing COPYs load every file exactly once") {
    val base = TestSpark.tmpDir("ci6")
    val src = TestSpark.tmpDir("ci6s")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    (1 to 6).foreach(i => srcFile(src, s"f$i.parquet", Seq((i.toLong, s"v$i"))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val go = new java.util.concurrent.CountDownLatch(1)
    val loaded = new java.util.concurrent.atomic.AtomicLong(0L)
    val futures = (0 until 3).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          go.await()
          loaded.addAndGet(sink.copyInto(spark, "t", src)); ()
        }
      })
    }
    go.countDown()
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(loaded.get() == 6L,
      s"racing COPYs loaded ${loaded.get()} files total, want exactly 6")
    assert(sink.read(spark, "t").count() == 7L, "rows duplicated or lost")
    assert(sink.read(spark, "t").select("id").distinct().count() == 7L)
  }

  test("requires an existing table (Delta's contract)") {
    val base = TestSpark.tmpDir("ci4")
    val src = TestSpark.tmpDir("ci4s")
    srcFile(src, "a.parquet", Seq((1L, "a")))
    val sink = new VersionedParquetSink(base)
    intercept[IllegalArgumentException] {
      sink.copyInto(spark, "missing", src)
    }
  }
}
