package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement tool (guide §1/§7): per-query
  * execution anatomy — number of jobs/stages/tasks, summed task run
  * time vs wall-clock (the gap is scheduling + driver + codegen), GC,
  * shuffle fetch-wait and bytes. Identifies whether a query is
  * data-bound or overhead-bound, which decides the optimization lever.
  *
  * Usage: runMain graft.ProfileExec <sfDir> [q_a,q_b,...]
  */
object ProfileExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Option[Set[String]] =
      if (args.length > 1)
        Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val spark = SessionDefaults.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val runMs = new AtomicLong   // executorRunTime
    val cpuMs = new AtomicLong   // executorCpuTime (ns -> ms below)
    val gcMs = new AtomicLong
    val fetchMs = new AtomicLong
    val deserMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    def reset(): Unit = {
      Seq(runMs, cpuMs, gcMs, fetchMs, deserMs, shufRead, shufWrite)
        .foreach(_.set(0L))
      jobs.set(0); stages.set(0); tasks.set(0)
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000)
          gcMs.addAndGet(m.jvmGCTime)
          deserMs.addAndGet(m.executorDeserializeTime)
          fetchMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    // Bench warmup + prewarm
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
    if (!sys.env.get("SPARK_GRAFT_PREWARM").map(_.trim).contains("0"))
      graft.queries.Prewarm.shared(spark, sfDir)

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    println(f"${"query"}%-24s ${"wall_s"}%7s ${"jobs"}%5s ${"stg"}%4s ${"task"}%5s " +
      f"${"run_s"}%7s ${"cpu_s"}%7s ${"gc_s"}%6s ${"fetch_s"}%7s ${"deser_s"}%7s " +
      f"${"shR_mb"}%7s ${"shW_mb"}%7s")
    names.foreach { n =>
      try {
        // one untimed warm pass so codegen/caches are hot, then measure
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat
        Thread.sleep(150)
        println(f"$n%-24s $wall%7.3f ${jobs.get}%5d ${stages.get}%4d ${tasks.get}%5d " +
          f"${runMs.get / 1e3}%7.2f ${cpuMs.get / 1e3}%7.2f ${gcMs.get / 1e3}%6.2f " +
          f"${fetchMs.get / 1e3}%7.2f ${deserMs.get / 1e3}%7.2f " +
          f"${shufRead.get / 1e6}%7.1f ${shufWrite.get / 1e6}%7.1f")
      } catch { case ex: Throwable =>
        println(s"$n FAILED: ${ex.getMessage}")
      }
    }
    spark.stop()
  }
}
