package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §7.1-7.2): the SQL-tab
  * view without a UI — runs a query through the noop sink, then prints
  * the executed plan graph with per-node metrics (rows, time) from the
  * SQLAppStatusStore, so hot operators are named instead of guessed.
  *
  * Usage: runMain graft.ProfileOps <sfDir> q_a[,q_b,...]
  */
object ProfileOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SessionDefaults.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    if (!sys.env.get("SPARK_GRAFT_PREWARM").map(_.trim).contains("0"))
      graft.queries.Prewarm.shared(spark, sfDir)

    val store = spark.sharedState.statusStore
    names.foreach { n =>
      // warm pass (codegen + caches), then the measured pass
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val before = store.executionsList().map(_.executionId).toSet
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      Thread.sleep(300) // listener bus drain
      val execs = store.executionsList().filterNot(e => before(e.executionId))
      println(s"\n##### $n (${execs.size} executions)")
      execs.foreach { e =>
        val g = store.planGraph(e.executionId)
        val mets = store.executionMetrics(e.executionId)
        g.allNodes.toSeq.sortBy(_.id).foreach { node =>
          val interesting = node.metrics.flatMap { m =>
            mets.get(m.accumulatorId).map(v => s"${m.name}=$v")
          }.filter { s =>
            s.contains("time") || s.contains("rows") || s.contains("size") ||
              s.contains("duration")
          }
          if (interesting.nonEmpty)
            println(s"  [${node.id}] ${node.name}: " +
              interesting.mkString(" | ").replaceAll("\n", " "))
        }
      }
    }
    spark.stop()
  }
}
