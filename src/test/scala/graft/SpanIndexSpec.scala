package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{SpanIndex, VersionedParquetSink}

/** Incremental duplicate-span removal: within-batch spans mask all
  * copies (the batch q_span_clean contract), history masks only the new
  * occurrence, re-ingestion doesn't self-mask, and the keyed two-table
  * commit is exactly-once under replay and checkpoint loss. */
class SpanIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def cleanedText(sink: VersionedParquetSink, id: Long): String =
    sink.read(spark, "clean_corpus").filter(col("doc_id") === id)
      .select("text").as[String].head()

  test("within-batch spans mask all copies; history masks only the new doc") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("spanix"))
    val boiler = words("b", 8) // the shared 8-token boilerplate
    val a = s"${words("a", 8)} $boiler"
    val b = s"${words("c", 8)} $boiler"
    val r1 = SpanIndex.appendCleaned(spark, sink,
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), batchKey = Some("k1"))
    assert(r1.appendedDocs == 2)
    // both in-batch copies masked, unique prefixes kept
    assert(cleanedText(sink, 1L) == words("a", 8))
    assert(cleanedText(sink, 2L) == words("c", 8))
    assert(r1.tokensMasked == 16)

    // batch 2: doc 3 copies doc 1's UNIQUE prefix (now historical) —
    // doc 3 is masked, doc 1's stored text is untouched (immutable)
    val c = s"${words("a", 8)} ${words("d", 8)}"
    val r2 = SpanIndex.appendCleaned(spark, sink,
      Seq((3L, c)).toDF("doc_id", "text"), batchKey = Some("k2"))
    assert(r2.tokensMasked == 8)
    assert(cleanedText(sink, 3L) == words("d", 8))
    assert(cleanedText(sink, 1L) == words("a", 8)) // unchanged

    // short docs pass through untouched
    val r3 = SpanIndex.appendCleaned(spark, sink,
      Seq((4L, "too short")).toDF("doc_id", "text"), batchKey = Some("k3"))
    assert(r3.tokensMasked == 0)
    assert(cleanedText(sink, 4L) == "too short")
  }

  test("re-ingesting the same doc_id does not self-mask; replays no-op") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("spanix2"))
    val t = words("x", 12)
    SpanIndex.appendCleaned(spark, sink,
      Seq((1L, t)).toDF("doc_id", "text"), batchKey = Some("k1"))
    // same doc re-sent (revision): its own indexed spans are not dups
    val r = SpanIndex.appendCleaned(spark, sink,
      Seq((1L, t)).toDF("doc_id", "text"), batchKey = Some("k2"))
    assert(r.tokensMasked == 0)
    // keyed replay of batch k2: zero effect, tables unchanged
    val versions = sink.versions(spark, "clean_corpus").size
    val r2 = SpanIndex.appendCleaned(spark, sink,
      Seq((1L, t)).toDF("doc_id", "text"), batchKey = Some("k2"))
    assert(r2 == SpanIndex.Result(0L, 0L))
    assert(sink.versions(spark, "clean_corpus").size == versions)
  }

  test("streaming: checkpoint loss + new file stays exactly-once (content keys)") {
    val feed = TestSpark.tmpDir("spanix_feed")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("spanix3"))
    val ck = TestSpark.tmpDir("spanix_ck")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(feed, name), "UTF-8")
      try rows.foreach { case (id, t) =>
        w.println(s"""{"doc_id":$id,"text":"$t"}""")
      } finally w.close()
    }
    writeFile("f1.json", Seq((1L, s"${words("a", 8)} ${words("b", 8)}")))
    SpanIndex.streamCleaned(spark, feed, sink, ck).awaitTermination()
    assert(sink.read(spark, "clean_corpus").count() == 1)

    // checkpoint wiped; a new file (sharing doc 1's boilerplate) lands
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(ck))
    writeFile("f2.json", Seq((2L, s"${words("b", 8)} ${words("z", 8)}")))
    SpanIndex.streamCleaned(spark, feed, sink, ck).awaitTermination()

    val rows = sink.read(spark, "clean_corpus")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L, 2L), s"got ${rows.keySet}")
    assert(rows(1L) == s"${words("a", 8)} ${words("b", 8)}") // replay no-op
    assert(rows(2L) == words("z", 8)) // historical span masked
  }
}
