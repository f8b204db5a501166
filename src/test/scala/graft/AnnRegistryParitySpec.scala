package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AnnIndex, Tables, VersionedParquetSink}
import graft.queries.NorthStarQueries

/** Registry-path VALUE-PARITY gate (VERDICT r11 #4): every query that
  * consumes the IVF assignment must return byte-identical output
  * whether the quantizer is trained in-session (the oracle path the
  * driver verifies against DuckDB) or read from a persisted AnnIndex
  * via GRAFT_ANN_DIR (the amortized production path). The registry's
  * coverage/content-fingerprint guards check the INPUT is the same
  * corpus; this spec closes the loop on the OUTPUT — previously parity
  * of the actual cell assignments was by-construction only
  * (AnnIndexSpec checks assignment-level equality; here the full query
  * surface runs on both paths).
  *
  * The index is built with the registry's own quantizer parameters
  * (flat assignment, k = ivfK, 2 iterations — AnnIngest's oracle-rule
  * form), so any divergence is a real protocol bug, not a parameter
  * mismatch.
  */
class AnnRegistryParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Every SparkEntry query whose plan reads trainedCentroids /
    * ivfAssigned — the ONE canonical list (also consumed by Bench's
    * ANN mode), defined next to the registry plumbing it gates. */
  private val EmbeddingQueries = NorthStarQueries.EmbeddingFamily

  test("all embedding-family queries: registry path output-identical " +
      "to the in-session path at sf0.01") {
    val d = "/root/testdata/sf0.01"
    graft.GraftExtensions.ensureRegistered(spark)

    // persisted index with the registry's quantizer parameters
    val root = TestSpark.tmpDir("annparity")
    AnnIndex.build(spark, new VersionedParquetSink(root), "ann",
      Tables.embeddings(spark, d).select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec")),
      dim = 64, kCoarse = 10, m = 2, subK = 16, iters = 2)

    def runAll(): Map[String, Seq[String]] =
      EmbeddingQueries.map { name =>
        val rows = SparkEntry.queries(name)(spark, d)
          .collect().map(_.toString).sorted.toSeq
        assert(rows.nonEmpty, s"$name returned no rows")
        name -> rows
      }.toMap

    val before = NorthStarQueries.annDirOverride
    try {
      NorthStarQueries.annDirOverride = Some(None) // force in-session
      NorthStarQueries.invalidateAnnCaches()
      val inSession = runAll()

      NorthStarQueries.annDirOverride = Some(Some(root)) // registry
      NorthStarQueries.invalidateAnnCaches()
      val registry = runAll()

      // Registry-mode PLAN pin (r13): the whole point of the persisted
      // assignment is that no query re-runs the N x k argmax — the
      // first 100x ANN probe caught q_ivf_assign doing exactly that
      // (247 s, ratio 661/two decades). With the override active its
      // plan must contain NO window at all (assignment read + one
      // broadcast join on the assigned cell).
      val assignPlan = SparkEntry.queries("q_ivf_assign")(spark, d)
        .queryExecution.executedPlan.toString
      assert(!assignPlan.contains("Window ["),
        s"q_ivf_assign regrew an argmax window in registry mode:\n" +
          assignPlan.take(2000))

      EmbeddingQueries.foreach { name =>
        assert(registry(name) == inSession(name),
          s"$name diverged between the in-session and registry paths " +
            s"(first diff: ${registry(name).zip(inSession(name))
              .find(p => p._1 != p._2)})")
      }
    } finally {
      NorthStarQueries.annDirOverride = before
      NorthStarQueries.invalidateAnnCaches()
    }
  }

  test("q_ivf_assign on a hierarchically-assigned index reports the " +
      "index's ACTUAL stored assignment (ADVICE r13): cell = stored " +
      "cell, sim = cosine to that cell, one row per vector") {
    // A superProbes-built index (AnnIngest's GRAFT_SUPER_PROBES path;
    // ScaleProbe's ensureAnnIndex uses Some(2)) can assign boundary
    // vectors to a different cell than the flat argmax — registry-mode
    // q_ivf_assign must then report the STORED assignment (the cells
    // search actually probes), not silently recompute the flat max.
    val d = "/root/testdata/sf0.001"
    graft.GraftExtensions.ensureRegistered(spark)
    val root = TestSpark.tmpDir("annhier")
    val vectors = Tables.embeddings(spark, d).select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    AnnIndex.build(spark, new VersionedParquetSink(root), "ann",
      vectors, dim = 64, kCoarse = 10, m = 2, subK = 16, iters = 2,
      superProbes = Some(2))

    val before = NorthStarQueries.annDirOverride
    try {
      NorthStarQueries.annDirOverride = Some(Some(root))
      NorthStarQueries.invalidateAnnCaches()
      val out = SparkEntry.queries("q_ivf_assign")(spark, d)

      // plan pin: the persisted assignment means no argmax window even
      // when that assignment came from the hierarchical rule
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("Window ["),
        s"q_ivf_assign regrew an argmax window in registry mode:\n${p.take(2000)}")

      val got = out.collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap

      // expected, wired independently from the raw index tables: the
      // stored (id, cell) joined to its centroid, sim recomputed with
      // the same round(dot/(nrm*c_nrm), 4) rule
      val sink = new VersionedParquetSink(root)
      val expected = sink.read(spark, "ann_vectors")
        .select(col("id").as("vec_id"), col("cell"))
        .join(sink.read(spark, "ann_centroids"), "cell")
        .join(vectors.select(col("id").as("vec_id"), col("vec")), "vec_id")
        .select(col("vec_id"), col("cell"),
          round(expr("graft_dot(vec, c_emb)") /
            (sqrt(expr("graft_dot(vec, vec)")) * col("c_nrm")), 4).as("sim"))
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap

      assert(got.size == vectors.count(),
        s"expected one row per vector, got ${got.size}")
      assert(got == expected,
        s"registry q_ivf_assign diverged from the stored assignment " +
          s"(first diff: ${got.find(kv => expected.get(kv._1) != Some(kv._2))})")
    } finally {
      NorthStarQueries.annDirOverride = before
      NorthStarQueries.invalidateAnnCaches()
    }
  }
}
