package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Bpe

/** engine/Bpe.scala: distributed BPE merge-learning against a
  * sequential textbook implementation (Sennrich et al.'s algorithm,
  * the PropertySpec discipline — exact agreement, not approximate),
  * plus the greedy-fold edge cases that make or break merge
  * application (overlap runs, boundary confusion, chain-merge). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- sequential reference ------------------------------------------

  /** Textbook greedy leftmost-non-overlap merge of one word. */
  private def seqMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Sequential BPE training over a word-frequency map; returns the
    * merge list and the final segmentation. */
  private def seqLearn(vocab: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var segs = vocab.keysIterator
      .map(w => w -> w.split("").filter(_.nonEmpty).toVector).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= rounds && !done) {
      val pc = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += vocab(w)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), n) = pc.minBy { case ((l, r), n) => (-n, l, r) }
        merges += ((step, l, r, n))
        segs = segs.map { case (w, s) => w -> seqMerge(s, l, r) }
        step += 1
      }
    }
    (merges.result(), segs)
  }

  // ---- distributed vs sequential: exact agreement --------------------

  test("learn agrees exactly with the sequential reference on a seeded corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    val words = Seq.fill(400) {
      val len = 1 + rnd.nextInt(7)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val vocab = words.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    val vocabDf = vocab.toSeq.toDF("word", "cnt")

    val (merges, fv) = Bpe.learn(vocabDf, rounds = 10)
    val (seqMerges, seqSegs) = seqLearn(vocab, rounds = 10)

    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.pairN)) === seqMerges)
    val got = fv.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(got.view.mapValues(_.toVector).toMap === seqSegs)
    fv.unpersist()
  }

  test("learned segmentation is lossless (syms concat back to the word)") {
    val vocabDf = Seq(("alpha", 3L), ("beta", 2L), ("alphabet", 1L),
      ("a", 5L), ("bb", 4L)).toDF("word", "cnt")
    val (_, fv) = Bpe.learn(vocabDf, rounds = 6)
    val bad = fv.filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad === 0)
    fv.unpersist()
  }

  // ---- greedy-fold edge cases (applyMerge) ---------------------------

  private def applied(syms: Seq[String], l: String, r: String): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), l, r).as("out"))
      .as[Seq[String]].collect().head

  test("overlap run merges greedily leftmost: aaaa -> [aa, aa], aaa -> [aa, a]") {
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(applied(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
  }

  test("a just-merged token never chain-merges within the round") {
    // (a, b) over [a, b, b]: merged "ab" must not pair with the next "b"
    // unless (ab, b) is itself the merge
    assert(applied(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
  }

  test("multi-char boundary: symbol xa does not satisfy lhs a") {
    assert(applied(Seq("xa", "b"), "a", "b") === Seq("xa", "b"))
    assert(applied(Seq("a", "b"), "a", "b") === Seq("ab"))
  }

  test("multi-char lhs matches exactly, including after a real merge") {
    // [aa, a, a] with (aa, a): leftmost occurrence merges, yielding
    // [aaa, a]; the new token "aaa" must not re-match lhs "aa"
    assert(applied(Seq("aa", "a", "a"), "aa", "a") === Seq("aaa", "a"))
  }

  // ---- vocabOf + termination -----------------------------------------

  test("vocabOf counts words and drops empty tokens") {
    val docs = Seq("a b a", "b  c", "").toDF("text")
    val got = Bpe.vocabOf(docs).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("learn stops early when no adjacent pairs remain") {
    val vocabDf = Seq(("a", 3L), ("b", 2L)).toDF("word", "cnt")
    val (merges, fv) = Bpe.learn(vocabDf, rounds = 5)
    assert(merges.isEmpty)
    assert(fv.select(size(col("syms"))).as[Int].collect().forall(_ == 1))
    fv.unpersist()
  }

  test("q_bpe_apply is consistent with q_bpe_compress on the same corpus") {
    // application via the word-keyed vocab join must serve EXACTLY the
    // token counts the compress audit derives from the vocab itself —
    // summing per-source fertility numerators over sources recovers the
    // corpus totals
    val sf = "/root/testdata/sf0.001"
    val apply = SparkEntry.queries("q_bpe_apply")(spark, sf).collect()
    val comp = SparkEntry.queries("q_bpe_compress")(spark, sf).head()
    assert(apply.map(_.getAs[Long]("n_words")).sum ==
      comp.getAs[Long]("n_words"))
    assert(apply.map(_.getAs[Long]("n_tokens")).sum ==
      comp.getAs[Long]("n_tokens"))
    // fertility >= 1: a word is at least one subword
    apply.foreach(r => assert(r.getAs[Double]("fertility") >= 1.0))
  }

  test("training is deterministic across runs") {
    val vocabDf = Seq(("abab", 2L), ("abba", 2L), ("baba", 2L))
      .toDF("word", "cnt")
    val (m1, f1) = Bpe.learn(vocabDf, rounds = 4)
    val (m2, f2) = Bpe.learn(vocabDf, rounds = 4)
    assert(m1 === m2)
    assert(f1.orderBy("word").collect().toSeq ===
      f2.orderBy("word").collect().toSeq)
    f1.unpersist(); f2.unpersist()
  }
}
