package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ChunkIndex, VersionedParquetSink}

/** Incremental content-addressed chunk store (engine/ChunkIndex.scala):
  * lossless round-trip, edit-locality storage savings across re-crawl
  * rounds, cross-document sharing, keyed exactly-once under replay and
  * checkpoint loss. */
class ChunkIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def salad(seed: Int, n: Int): String = {
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wolf",
      "moon", "star", "rain", "leaf", "sand", "snow", "fire", "dust",
      "oak", "elm", "ash", "fir", "yew", "bay")
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("round-trip: store + manifest reassemble the exact documents") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cix1"))
    val docs = Seq((1L, salad(3, 300)), (2L, salad(5, 120)))
      .toDF("doc_id", "text")
    val r = ChunkIndex.append(spark, sink, docs)
    assert(r.docs == 2 && r.chunks >= 4 && r.newChunks == r.chunks)
    assert(r.dedupedTokens == 0L)
    val back = ChunkIndex.reassemble(spark, sink)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(back(1L) == salad(3, 300) && back(2L) == salad(5, 120))
  }

  test("re-crawl with one edit re-stores only the edited neighborhood") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cix2"))
    val words = salad(7, 600).split(" ").toVector
    val orig = words.mkString(" ")
    ChunkIndex.append(spark, sink, Seq((1L, orig)).toDF("doc_id", "text"))
    val before = sink.read(spark, "cdc_store").count()
    // round 2: the same doc re-crawled with one inserted token
    val edited = (words.take(300) ++ Vector("INSERTED") ++
      words.drop(300)).mkString(" ")
    val r2 = ChunkIndex.append(spark, sink,
      Seq((2L, edited)).toDF("doc_id", "text"))
    // nearly all tokens served from the store; <= 3 chunks re-stored
    assert(r2.newChunks <= 3,
      s"edit re-stored ${r2.newChunks} of ${r2.chunks} chunks")
    assert(r2.dedupedTokens > 400L, s"deduped only ${r2.dedupedTokens}")
    assert(sink.read(spark, "cdc_store").count() <= before + 3)
    // both versions still reassemble losslessly
    val back = ChunkIndex.reassemble(spark, sink)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(back(1L) == orig && back(2L) == edited)
  }

  test("cross-document sharing: a common run is stored once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cix3"))
    val shared = salad(11, 200)
    val docs = Seq(
      (1L, s"${salad(13, 150)} $shared"),
      (2L, s"${salad(17, 90)} $shared")).toDF("doc_id", "text")
    val r = ChunkIndex.append(spark, sink, docs)
    assert(r.newChunks < r.chunks,
      s"no sharing: ${r.newChunks} of ${r.chunks}")
    assert(r.dedupedTokens > 100L)
  }

  test("keyed replay is exactly-once for both tables") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cix4"))
    val docs = Seq((1L, salad(19, 250))).toDF("doc_id", "text")
    val r1 = ChunkIndex.append(spark, sink, docs, batchKey = Some("b1"))
    val m1 = sink.read(spark, "cdc_manifest").count()
    val s1 = sink.read(spark, "cdc_store").count()
    // full replay of the same batch: both appends no-op on their key
    ChunkIndex.append(spark, sink, docs, batchKey = Some("b1"))
    assert(sink.read(spark, "cdc_manifest").count() == m1)
    assert(sink.read(spark, "cdc_store").count() == s1)
    // crash between the two appends simulated: the store commit exists
    // (same derived key), manifest does not — replaying the batch heals
    val docs2 = Seq((2L, salad(23, 250))).toDF("doc_id", "text")
    val chunks2 = graft.engine.Chunker
      .cdcChunks(docs2, "doc_id", "text", 4, 32)
      .groupBy("hash").agg(min(struct(col("doc_id"), col("chunk"),
        col("n_tokens"), col("text"))).as("rep"))
      .select(col("hash"), col("rep.n_tokens").as("n_tokens"),
        col("rep.text").as("text"))
    assert(sink.appendOnce(chunks2, "cdc_store", "b2:cdc_store"))
    ChunkIndex.append(spark, sink, docs2, batchKey = Some("b2"))
    val back = ChunkIndex.reassemble(spark, sink)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(back(2L) == salad(23, 250), "post-crash replay did not heal")
    val r1r = r1 // silence unused warning path; r1 asserted implicitly
    assert(r1r.docs == 1)
  }

  test("streaming ingestion survives checkpoint loss with zero duplicates") {
    import java.nio.file.{Files, Paths}
    val docsDir = TestSpark.tmpDir("cixs_in")
    val ckpt = TestSpark.tmpDir("cixs_ck")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cixs_store"))
    def line(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text"}"""
    Files.write(Paths.get(docsDir, "b1.json"),
      Seq(line(1, salad(29, 200))).mkString("\n").getBytes)
    ChunkIndex.streamChunked(spark, docsDir, sink, ckpt).awaitTermination()
    val m1 = sink.read(spark, "cdc_manifest").count()
    Files.write(Paths.get(docsDir, "b2.json"),
      Seq(line(2, salad(31, 150))).mkString("\n").getBytes)
    ChunkIndex.streamChunked(spark, docsDir, sink, ckpt).awaitTermination()
    val m2 = sink.read(spark, "cdc_manifest").count()
    assert(m2 > m1)
    // checkpoint LOST: every file replays; content keys absorb all of it
    val ckpt2 = TestSpark.tmpDir("cixs_ck2")
    ChunkIndex.streamChunked(spark, docsDir, sink, ckpt2).awaitTermination()
    assert(sink.read(spark, "cdc_manifest").count() == m2)
    val back = ChunkIndex.reassemble(spark, sink)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(back(1L) == salad(29, 200) && back(2L) == salad(31, 150))
  }
}
