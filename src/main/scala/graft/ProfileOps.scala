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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.shuffle.checksum.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
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
