package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SampleIndex, Sampling, VersionedParquetSink}

/** MULTI-PROCESS concurrency validation of the versioned sink's
  * commit-claim protocol and the reservoir built on it. Every other
  * race/soak suite (SoakSpec, GovernanceRaceSpec, SampleIndexSpec's
  * 4-writer race) runs its contenders as THREADS inside one JVM, where
  * shared memory can mask an unsound claim; here each contender is a
  * separate OS process launched with the test JVM's own classpath and
  * module flags, so the only coordination channel is the filesystem —
  * the deployment shape of a real multi-executor/multi-driver cluster.
  *
  * Verdicts asserted: zero lost appends, zero double-applied commit
  * keys, and the reservoir's multi-writer sample exactly equals the
  * one-shot batch sample over the union (compaction racing absorbs
  * loses nothing).
  */
class MultiJvmRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Launches RaceWorker in a fresh JVM with this JVM's classpath and
    * --add-opens set (Spark 4 on JDK 17 needs them; sbt's fork injects
    * them into THIS process, so mirror whatever is present). */
  private def launch(dir: String, role: String, id: Int, n: Int): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val opens = jvmArgs.sliding(2).collect {
      case List(flag, value)
        if flag == "--add-opens" || flag == "--add-exports" =>
        List(flag, value)
    }.flatten.toList ++
      jvmArgs.filter(a => a.startsWith("--add-opens=") ||
        a.startsWith("--add-exports="))
    val cmd = (javaBin :: opens) ++ List(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.RaceWorker", dir, role, id.toString, n.toString)
    new ProcessBuilder(cmd.asJava)
      .redirectOutput(new java.io.File(s"$dir/worker-$role-$id.out"))
      .redirectErrorStream(true)
      .start()
  }

  private def await(ps: Seq[Process], dir: String): Unit =
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
        s"worker $i timed out")
      if (p.exitValue() != 0) {
        val logs = new java.io.File(dir).listFiles()
          .filter(_.getName.startsWith("worker-"))
          .map(f => f.getName + ":\n" + new String(
            java.nio.file.Files.readAllBytes(f.toPath)).takeRight(2000))
        fail(s"worker $i exited ${p.exitValue()}\n${logs.mkString("\n")}")
      }
    }

  test("appendOnce across 3 PROCESSES: zero lost appends, every batch " +
      "exactly once") {
    val dir = TestSpark.tmpDir("mjvm_append")
    val writers = 3
    val batches = 5
    val ps = (1 to writers).map(i => launch(dir, "append-writer", i, batches))
    await(ps, dir)
    val sink = new VersionedParquetSink(dir)
    val t = sink.read(spark, "t")
    assert(t.count() == writers.toLong * batches * 20,
      "lost or duplicated appends under cross-process contention")
    val perBatch = t.groupBy("w", "b").agg(count(lit(1)).as("n")).collect()
    assert(perBatch.length == writers * batches)
    perBatch.foreach(r => assert(r.getAs[Long]("n") == 20L,
      s"batch (${r.get(0)}, ${r.get(1)}) applied ${r.getAs[Long]("n") / 20}x"))
  }

  test("SAME commit keys raced from 3 PROCESSES: each key applies " +
      "exactly once") {
    val dir = TestSpark.tmpDir("mjvm_keys")
    val racers = 3
    val batches = 4
    val ps = (1 to racers).map(i => launch(dir, "key-racer", i, batches))
    await(ps, dir)
    val sink = new VersionedParquetSink(dir)
    val t = sink.read(spark, "t")
    // every shared key applied by exactly ONE of the three racers
    assert(t.count() == batches.toLong * 20,
      "a shared commit key was double-applied (or lost) across processes")
    val perB = t.groupBy("b").agg(count(lit(1)).as("n")).collect()
    assert(perB.length == batches)
    perB.foreach(r => assert(r.getAs[Long]("n") == 20L))
  }

  test("identity allocation across 3 PROCESSES: every id unique, " +
      "every row present") {
    val dir = TestSpark.tmpDir("mjvm_ident")
    val sink = new VersionedParquetSink(dir)
    sink.append(Seq("seed").toDF("v"), "t")
    sink.setIdentityColumn(spark, "t", "id")
    val writers = 3
    val batches = 4
    val ps = (1 to writers).map(i => launch(dir, "identity-writer", i, batches))
    await(ps, dir)
    val rows = sink.read(spark, "t").collect()
    val ids = rows.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    assert(rows.length == 1 + writers * batches * 5,
      s"lost appends: ${rows.length}")
    assert(ids.length == writers * batches * 5, s"unassigned ids")
    assert(ids.distinct.length == ids.length,
      s"identity collision across processes: ${ids.sorted.toSeq}")
  }

  test("log retention churn across PROCESSES: markers retire, no row " +
      "lost, versions coherent") {
    // the r9 phantom-commit bug (a stale writer claiming a version
    // whose marker retention already retired -> silently lost append)
    // was caught by the in-JVM soak; this is the same churn with the
    // writers and the maintainer in SEPARATE processes, where marker
    // listings, checkpoints and claims race purely through the fs
    val dir = TestSpark.tmpDir("mjvm_churn")
    val sink = new VersionedParquetSink(dir, checkpointInterval = 5)
    sink.append(Seq((0L, "seed")).toDF("n", "v"), "t")
    sink.setProperties(spark, "t", Map(
      "graft.logRetentionDuration" -> "0s",
      "graft.deletedFileRetentionDuration" -> "1h"))
    val writers = 3
    val batches = 12
    val nClones = 6
    val ps = (1 to writers).map(i => launch(dir, "churn-writer", i, batches)) ++
      Seq(launch(dir, "churn-maintainer", 0, 30),
        launch(dir, "churn-cloner", 9, nClones))
    await(ps, dir)
    val vs = sink.versions(spark, "t")
    assert(vs == vs.sorted && vs.last + 1 >= (writers * batches).toLong,
      s"version chain incoherent or short: $vs")
    // one deterministic final retirement pass (the maintainer process
    // races the churn for contention, but whether IT retires most
    // markers depends on scheduling; the invariant is that retirement
    // plus churn never loses a row, asserted below)
    sink.vacuum(spark, "t", graceMs = 3600000L)
    val markers = Option(new java.io.File(s"$dir/t/_commits").listFiles)
      .toSeq.flatten.count(_.getName.endsWith(".commit"))
    assert(markers < writers * batches,
      s"retention retired nothing: $markers markers for ${vs.last + 1}")
    // zero lost appends: every (writer, batch, row) present exactly once
    val ns = sink.read(spark, "t").collect().map(_.getLong(0)).sorted.toSeq
    val expected = (0L +: (for {
      id <- 1 to writers; b <- 1 to batches; i <- 0 until 5
    } yield (id.toLong * 1000 + b) * 10 + i)).sorted
    assert(ns == expected,
      s"lost/duplicated rows under cross-process retention: " +
        s"${ns.length} of ${expected.length}")
    // every clone pinned mid-churn by the cloner PROCESS still reads
    // its snapshot after all the retirement that followed
    (1 to nClones).foreach { b =>
      assert(sink.read(spark, s"clone_w9_$b").count() >= 1L,
        s"clone_w9_$b broken after cross-process retention churn")
    }
  }

  test("reservoir: 3 writer PROCESSES racing a compactor PROCESS equals " +
      "the one-shot sample") {
    val dir = TestSpark.tmpDir("mjvm_sample")
    val writers = 3
    val batches = 4
    // seed the table so the compactor never sees a missing table
    val seed = (0L until 50L).map(i => (i, 1L + i % 500))
    SampleIndex.absorb(spark, new VersionedParquetSink(dir),
      seed.toDF("doc_id", "wt"), MultiJvmRaceSpec.K,
      batchKey = Some("seed"))
    val ps = (1 to writers).map(i => launch(dir, "sample-writer", i, batches)) :+
      launch(dir, "sample-compactor", 0, 3)
    await(ps, dir)
    val sink = new VersionedParquetSink(dir)
    // final compact must still preserve the sample
    SampleIndex.compact(spark, sink, MultiJvmRaceSpec.K)
    val all = seed ++ (for {
      id <- 1 to writers
      b <- 1 to batches
      i <- 0L until 50L
    } yield {
      val base = id.toLong * 1000000L + b.toLong * 1000L
      (base + i, 1L + (base + i) % 500)
    })
    val want = Sampling
      .weightedTopK(all.toDF("doc_id", "wt"), col("doc_id"), col("wt"),
        MultiJvmRaceSpec.K)
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = SampleIndex.sample(spark, sink, MultiJvmRaceSpec.K)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(got == want,
      s"multi-process reservoir diverged from the one-shot sample")
    assert(sink.read(spark, "reservoir").count() == MultiJvmRaceSpec.K.toLong,
      "final compact did not fold the log to k rows")
  }
}

object MultiJvmRaceSpec {
  val K = 10
}
