package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §1): splits each query's
  * wall time into (a) DataFrame construction + Catalyst analysis/
  * optimization ("plan") and (b) execution through the noop sink
  * ("exec"), min-of-2 each, after the same warmup + prewarm protocol as
  * Bench. Big memoized-plan queries spend real time in the optimizer —
  * this tool tells plan-shaped work from data-shaped work.
  *
  * Usage: runMain graft.ProfilePlan <sfDir> [q_a,q_b,...]
  */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1)
        Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    // shared bench-session builder (ADVICE r16 #2 — this main was on a
    // pre-r16 config, measuring a different session than the bench)
    val spark = SessionDefaults.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    spark.sql(
      """SELECT x, contains(lower(s), 'a'), regexp_extract(s, '([0-9]+)', 1),
        |  date_format(current_timestamp(), 'yyyy-MM-dd'), to_date('2024-01-01'),
        |  cast(x as decimal(18,2)) * cast(2 as decimal(18,2)),
        |  row_number() OVER (PARTITION BY s ORDER BY x),
        |  from_json(concat('{"k":', x, '}'), 'k INT').k,
        |  get_json_object(concat('{"k":', x, '}'), '$.k')
        |FROM (SELECT id AS x, concat('a', id) AS s,
        |        explode(split('a b', ' ')) AS t FROM range(100))""".stripMargin)
      .write.mode("overwrite").format("noop").save()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    if (!sys.env.get("SPARK_GRAFT_PREWARM").map(_.trim).contains("0")) {
      val times = graft.queries.Prewarm.shared(spark, sfDir)
      System.err.println("[profile] prewarm " + times.map { case (n, t) =>
        f"$n=$t%.2fs" }.mkString(" "))
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println(f"${"query"}%-26s ${"plan_s"}%8s ${"exec_s"}%8s")
    names.foreach { n =>
      def planOnce(): Double = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.optimizedPlan // force analysis + optimization
        (System.nanoTime() - t0) / 1e9
      }
      def execOnce(): Double = {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.optimizedPlan
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val p = { planOnce(); math.min(planOnce(), planOnce()) }
        val e = { execOnce(); math.min(execOnce(), execOnce()) }
        println(f"$n%-26s $p%8.3f $e%8.3f")
      } catch { case ex: Throwable =>
        println(s"$n FAILED: ${ex.getMessage}")
      }
    }
    spark.stop()
  }
}
