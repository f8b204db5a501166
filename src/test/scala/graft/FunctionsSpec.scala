package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot: codegen and interpreted paths agree; empty and short arrays") {
    import spark.implicits._
    val df = spark.sql(
      """SELECT graft_dot(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D)) AS a,
        |       graft_dot(cast(array() as array<double>), cast(array() as array<double>)) AS b,
        |       graft_dot(cast(null as array<double>), array(1.0D)) AS d
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2)) // null-intolerant binary expression
    // corrupt (length-mismatched) vectors fail loudly, like DuckDB's
    // list_dot_product — never a truncated-prefix similarity
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0D,2.0D), array(3.0D))").collect())
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("graft_dot rejects non-double arrays at analysis time") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect())
    assert(e.getMessage.contains("graft_dot requires"))
  }

  test("graft_nfc: composed and decomposed forms hash identically; null passes") {
    val composed = "café"            // é as one codepoint
    val decomposed = "café"          // e + combining acute
    assert(composed != decomposed)         // raw strings differ...
    val r = spark.sql(
      s"""SELECT graft_nfc('$composed') = graft_nfc('$decomposed') AS eq,
         |       graft_nfc('plain ascii') AS same,
         |       graft_nfc(cast(null as string)) AS n""".stripMargin)
      .collect()(0)
    assert(r.getBoolean(0), "...but must normalize to the same text")
    assert(r.getString(1) == "plain ascii") // fast path: unchanged
    assert(r.isNullAt(2))
    // interpreted path (no codegen) must agree with the generated one
    import graft.functions.NormalizeNfc
    import org.apache.spark.unsafe.types.UTF8String
    assert(NormalizeNfc.nfc(UTF8String.fromString(decomposed)).toString == composed)
  }

  test("shingleSet: sliding distinct n-grams; short docs empty") {
    assert(Text.shingleSet("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(Text.shingleSet("a b", 3).isEmpty)
    assert(Text.shingleSet("x y x y x y", 2).toSeq == Seq("x y", "y x"))
    // trailing whitespace keeps its empty token, matching Spark split()
    // and DuckDB string_split (the oracle's tokenization)
    assert(Text.shingleSet("a b c ", 3).toSeq == Seq("a b c", "b c "))
  }

  test("graft_dot fails loudly on null ELEMENTS (never silent 0.0)") {
    val e = intercept[Exception](
      spark.sql(
        "SELECT graft_dot(array(1.0D, cast(null as double)), array(2.0D, 3.0D))")
        .collect())
    assert(e.getMessage.contains("null element") ||
      Option(e.getCause).exists(_.getMessage.contains("null element")))
  }

  test("fingerprint normalizes before hashing") {
    import spark.implicits._
    val df = Seq("Hello,  World!", "hello world").toDF("t")
      .select(Text.fingerprint(org.apache.spark.sql.functions.col("t")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1)) // same after normalization
  }

  test("Misra-Gries guarantee holds under adversarial order and merge trees") {
    import graft.functions.MisraGries
    val k = 9
    // 3 heavy items above n/(k+1) buried in a long tail of uniques
    val heavy = Seq.fill(500)("A") ++ Seq.fill(400)("B") ++ Seq.fill(350)("C")
    val tail = (1 to 1750).map(i => s"u$i")
    val stream = new scala.util.Random(5).shuffle(heavy ++ tail)
    val n = stream.size
    assert(Seq(500, 400, 350).forall(_ > n / (k + 1)))
    val mg = new MisraGries(k)

    // sequential reduce
    val seq = stream.foldLeft(mg.zero)(mg.reduce)
    assert(Set("A", "B", "C").subsetOf(seq.keySet), s"sequential: $seq")

    // adversarial merge trees: varying partition counts and sizes
    for (parts <- Seq(2, 7, 32)) {
      val buffers = stream.grouped(math.max(1, n / parts)).toSeq
        .map(_.foldLeft(mg.zero)(mg.reduce))
      val left = buffers.reduceLeft(mg.merge)
      val balanced = buffers.reduce(mg.merge)
      for ((m, how) <- Seq(left -> "left-fold", balanced -> "balanced")) {
        assert(m.size <= k, s"$how/$parts: ${m.size} counters")
        assert(Set("A", "B", "C").subsetOf(m.keySet),
          s"$how/$parts lost a guaranteed item: $m")
        // candidate counts are lower bounds within n/(k+1) of truth
        assert(m("A") <= 500 && m("A") > 500 - n / (k + 1.0))
      }
    }
  }
}
