package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink
import graft.streaming.CdcApply

/** APPLY CHANGES INTO (DLT idiom): a standing CDC stream replicates a
  * keyed source table — inserts, updates, deletes — into a target,
  * exactly once across restarts. */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(sink: VersionedParquetSink,
      t: String): Seq[(Long, Long, String)] =
    sink.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("replicates inserts, updates, and deletes; restart replays nothing") {
    val srcBase = TestSpark.tmpDir("cdc1s")
    val tgtBase = TestSpark.tmpDir("cdc1t")
    val ckpt = TestSpark.tmpDir("cdc1c")
    val src = new VersionedParquetSink(srcBase)
    val tgt = new VersionedParquetSink(tgtBase)
    src.append(Seq((1L, 1L, "a"), (2L, 1L, "b"))
      .toDF("k", "seq", "v"), "s")

    def run(): Unit = {
      val q = CdcApply.start(spark, s"$srcBase/s", tgtBase, "t",
        keyCols = Seq("k"), sequenceBy = "seq", checkpoint = ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(rowsOf(tgt, "t") == Seq((1L, 1L, "a"), (2L, 1L, "b")))

    // update k=1 (delete+insert in the feed), delete k=2, insert k=3
    src.updateVectored(spark, "s", col("k") === 1L,
      Map("v" -> org.apache.spark.sql.functions.lit("a2"),
        "seq" -> org.apache.spark.sql.functions.lit(2L)))
    src.deleteVectored(spark, "s", col("k") === 2L)
    src.append(Seq((3L, 1L, "c")).toDF("k", "seq", "v"), "s")
    run()
    assert(rowsOf(tgt, "t") == Seq((1L, 2L, "a2"), (3L, 1L, "c")),
      s"got ${rowsOf(tgt, "t")}")

    // restart with no new changes: nothing re-applies
    val versions = tgt.versions(spark, "t").size
    run()
    assert(tgt.versions(spark, "t").size == versions,
      "replayed batches committed again")
    assert(rowsOf(tgt, "t") == Seq((1L, 2L, "a2"), (3L, 1L, "c")))
  }

  test("within-batch conflicts resolve by SEQUENCE BY") {
    val srcBase = TestSpark.tmpDir("cdc2s")
    val tgtBase = TestSpark.tmpDir("cdc2t")
    val src = new VersionedParquetSink(srcBase)
    val tgt = new VersionedParquetSink(tgtBase)
    // two images of k=1 land in ONE batch (both commits precede the
    // stream's first trigger): seq decides, not arrival order
    src.append(Seq((1L, 5L, "late")).toDF("k", "seq", "v"), "s")
    src.append(Seq((1L, 3L, "early")).toDF("k", "seq", "v"), "s")
    val q = CdcApply.start(spark, s"$srcBase/s", tgtBase, "t",
      keyCols = Seq("k"), sequenceBy = "seq",
      checkpoint = TestSpark.tmpDir("cdc2c"))
    try q.processAllAvailable() finally q.stop()
    assert(rowsOf(tgt, "t") == Seq((1L, 5L, "late")),
      s"got ${rowsOf(tgt, "t")}")
  }
}
