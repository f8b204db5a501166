package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the grouping step
  * of near-duplicate clustering (each component = one duplicate cluster,
  * labeled by its min vertex id).
  *
  * Two strategies, chosen by edge count:
  *
  *  - `driverUnionFind`: the near-dup graph is tiny relative to the
  *    corpus (its size tracks the duplicate rate, not the data volume),
  *    so below `driverMaxEdges` the edges are collected and solved with
  *    path-compressed union-find — one job, exact, no iteration.
  *  - `iterativeMinLabel`: distributed min-label propagation for graphs
  *    too big to collect; each round is one shuffle keyed on vertex.
  *    (A 100 TB-corpus CC at billions of edges would use the
  *    large-star/small-star refinement of the same topology.)
  */
object Graph {

  def connectedComponents(spark: SparkSession, edges0: DataFrame,
      driverMaxEdges: Long = 5000000L): DataFrame = {
    // edges may be an expensive derived plan (e.g. a shingle self-join);
    // cache it so the strategy-picking count() and the actual solve don't
    // each recompute the full upstream DAG
    val edges = edges0.cache()
    try {
      val n = edges.count()
      if (n <= driverMaxEdges) driverUnionFind(spark, edges)
      else iterativeMinLabel(edges)
    } finally edges.unpersist()
  }

  /** Exact union-find on collected edges (src, dst as first two columns). */
  private[engine] def driverUnionFind(spark: SparkSession,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.select(col(edges.columns(0)).cast("long"),
      col(edges.columns(1)).cast("long"))
      .collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min id becomes the root -> stable labels
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        } else if (!parent.contains(a)) parent(a) = ra
      }
    val members = parent.keySet ++ parent.values
    members.toSeq.map(v => (v, find(v))).toDF("vertex", "component")
  }

  /** Distributed min-label propagation with pointer jumping until
    * fixpoint. Each round (a) pulls the min label across edges (one hop)
    * and (b) shortcuts label -> label-of-label, doubling the effective
    * propagation distance — O(log n) rounds even for chain-shaped
    * components, where plain propagation needs O(diameter). A graph that
    * hasn't converged within maxIter still FAILS loudly — returning
    * partial labels would silently split duplicate clusters. */
  private[engine] def iterativeMinLabel(edges0: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val src = edges0.columns(0)
    val dst = edges0.columns(1)
    val edges = edges0.select(col(src).as("s"), col(dst).as("t"))
      .union(edges0.select(col(dst).as("s"), col(src).as("t")))
      .cache()
    var labels = edges.select(col("s").as("vertex")).distinct()
      .withColumn("component", col("vertex")).cache()
    var changed = 1L
    var iter = 0
    try {
      while (changed > 0 && iter < maxIter) {
        // (a) one-hop neighbor min
        val prop = edges.join(labels, edges("s") === labels("vertex"))
          .groupBy(col("t").as("vertex")).agg(min("component").as("nc"))
        val hop = labels.join(prop, Seq("vertex"), "left")
          .select(col("vertex"),
            least(col("component"), coalesce(col("nc"), col("component")))
              .as("component"))
        // (b) pointer jump: component := component(component). The jump
        // references `hop` twice, so the logical plan would DOUBLE every
        // round; localCheckpoint (not cache — caching keeps the plan)
        // truncates lineage so round cost stays constant.
        val hopCk = hop.localCheckpoint(true)
        val parents = hopCk.select(col("vertex").as("p_vertex"),
          col("component").as("p_component"))
        val next = hopCk.join(parents, hopCk("component") === col("p_vertex"), "left")
          .select(hopCk("vertex"),
            least(hopCk("component"), coalesce(col("p_component"), hopCk("component")))
              .as("component"))
          .localCheckpoint(true)
        changed = next.join(
          labels.withColumnRenamed("component", "old"), "vertex")
          .filter(col("component") =!= col("old")).count()
        labels.unpersist() // previous round's blocks are dead now
        labels = next
        iter += 1
      }
      if (changed > 0) throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "pathological input; raise maxIter")
      // pin the result before dropping the edge cache it derives from
      val result = labels.localCheckpoint(true)
      result
    } finally {
      edges.unpersist()
      labels.unpersist()
    }
  }
}
