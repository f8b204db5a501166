package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Chunker

/** Content-defined chunking (engine/Chunker.scala) held to the
  * properties dedup stores rely on — partition correctness, content
  * locality under edits (the reason CDC exists), duplicate-content
  * convergence, and the expected-length calibration. */
class ChunkerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 4
  private val Mod = 32

  private def salad(seed: Int, n: Int): String = {
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wolf",
      "moon", "star", "rain", "leaf", "sand", "snow", "fire", "dust",
      "oak", "elm", "ash", "fir", "yew", "bay")
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def chunksOf(docs: Seq[(Long, String)]) =
    Chunker.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text", K, Mod)
      .collect().groupBy(_.getLong(0))

  test("chunks partition the document: order-preserving, lossless") {
    val text = salad(3, 500)
    val ch = chunksOf(Seq((1L, text)))(1L).sortBy(_.getAs[Long]("start_pos"))
    val rebuilt = ch.map(_.getAs[String]("text")).mkString(" ")
    assert(rebuilt == text, "chunk concatenation must rebuild the doc")
    assert(ch.map(_.getAs[Long]("n_tokens")).sum == 500L)
    // chunk ids are dense from 0 in start_pos order
    assert(ch.map(_.getAs[Long]("chunk")).toSeq ==
      ch.indices.map(_.toLong))
  }

  test("locality: one mid-doc insertion re-chunks only its neighborhood") {
    val words = salad(7, 600).split(" ").toVector
    val edited = (words.take(300) ++ Vector("INSERTED") ++
      words.drop(300)).mkString(" ")
    val out = chunksOf(Seq((1L, words.mkString(" ")), (2L, edited)))
    val a = out(1L).map(_.getAs[String]("hash")).toSeq
    val b = out(2L).map(_.getAs[String]("hash")).toSeq
    // boundaries depend only on a K-token window: every chunk not
    // touching the edit's neighborhood survives by CONTENT — at most
    // the chunk holding the edit and its two neighbors can differ
    // (boundary at the seam may move)
    val shared = a.intersect(b) // multiset intersection
    assert(a.length - shared.length <= 3,
      s"edit invalidated ${a.length - shared.length} of ${a.length} chunks")
    assert(b.length - shared.length <= 3)
    // a FIXED-width chunking would have shifted every chunk after the
    // insertion; CDC must keep a chunk from the back half intact
    val lastA = out(1L).maxBy(_.getAs[Long]("start_pos"))
    assert(b.contains(lastA.getAs[String]("hash")),
      "tail chunk lost its identity across a front-half edit")
  }

  test("duplicate content converges to the same chunk addresses") {
    val text = salad(11, 400)
    val out = chunksOf(Seq((1L, text), (2L, text)))
    assert(out(1L).map(_.getAs[String]("hash")).sorted.toSeq ==
      out(2L).map(_.getAs[String]("hash")).sorted.toSeq)
  }

  test("expected chunk length tracks the modulus") {
    val ch = chunksOf(Seq((1L, salad(13, 4000))))(1L)
    val mean = 4000.0 / ch.length
    assert(mean > Mod / 4.0 && mean < Mod * 4.0,
      s"mean chunk length $mean far from modulus $Mod")
  }

  test("short docs: one chunk, no boundary possible below k tokens") {
    val out = chunksOf(Seq((1L, "one two three")))
    assert(out(1L).length == 1 && out(1L)(0).getAs[Long]("n_tokens") == 3L)
  }
}
