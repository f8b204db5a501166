package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.FileStats

/** Soundness property for the data-skipping pruner: over typed files
  * with nulls, negative numbers, unicode strings, dates and timestamps,
  * a file containing ANY row matching the predicate must NEVER be
  * pruned. (The converse — pruning everything prunable — is a quality
  * goal, not a contract; ScaleSpec covers the selective cases.) */
class FileStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mayMatch never prunes a file that contains a matching row") {
    val rng = new scala.util.Random(42)
    // 8 single-file batches of mixed shape: longs (incl. negatives),
    // doubles, strings (ascii + unicode supplementary), nullable tag,
    // dates and timestamps
    val dir = TestSpark.tmpDir("fstats_prop")
    val rows = (0 until 8).map { b =>
      (0 until 200).map { i =>
        val id = (b * 1000 + i).toLong - 3500 // negatives in low batches
        val s = if (i % 7 == 0) s"😀${b}_$i" else s"s${b}_$i"
        val tag = if (b == 3) null else s"t$b"
        val d = java.sql.Date.valueOf(java.time.LocalDate
          .of(2024, 1 + b % 12, 1 + i % 28))
        val ts = java.sql.Timestamp.from(java.time.Instant
          .parse("2024-06-01T00:00:00Z").plusSeconds(b * 86400L + i))
        (id, rng.nextDouble() * 200 - 100, s, tag, d, ts)
      }
    }
    val schema = rows.head.toDF("id", "v", "s", "tag", "d", "ts").schema
    rows.zipWithIndex.foreach { case (r, b) =>
      r.toDF("id", "v", "s", "tag", "d", "ts").coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    val df = spark.read.schema(schema).parquet(dir)
    val stats = FileStats.parse(FileStats.collect(spark, dir, schema))
    assert(stats.size == 8)

    val predicates: Seq[Column] = Seq(
      col("id") === -3100L, col("id") === 0, col("id") > 3000L,
      col("id") <= -3400L, col("id").between(-100, 150),
      lit(500L) < col("id"), col("id").isin(-3499L, 2500L, 999999L),
      col("v") > 95.0, col("v") < -99.0, col("v") === 0.0,
      col("s") === "s4_11", col("s") > "s7", col("s") < "a",
      col("s") === "😀" + "5_14", // supplementary plane
      col("tag").isNull, col("tag").isNotNull, col("tag") === "t3",
      col("d") === java.sql.Date.valueOf("2024-03-05"),
      col("d") >= java.sql.Date.valueOf("2024-08-01"),
      col("ts") > java.sql.Timestamp.from(
        java.time.Instant.parse("2024-06-05T00:00:00Z")),
      col("id") > 0 && col("v") > 0, col("id") < -3000L || col("s") > "s6",
      col("id") === -3100L && col("tag").isNull,
      expr("id % 7 = 0"), // unmodeled shape: must stay conservative
      !(col("id") > 0)) // Not: unmodeled, conservative

    val files = df.select(input_file_name().as("f")).distinct()
      .as[String].collect().map(_.split('/').last)
    for (p <- predicates; f <- files) {
      val matching = df.filter(input_file_name().endsWith(f)).filter(p).count()
      val resolved = FileStats.resolvePredicate(spark, schema, p)
      val kept = resolved.forall(e => FileStats.mayMatch(e, schema, stats(f)))
      if (matching > 0)
        assert(kept, s"UNSOUND: pruned file $f with $matching rows matching $p")
    }
  }
}
