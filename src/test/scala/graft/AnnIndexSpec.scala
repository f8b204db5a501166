package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AnnIndex, VersionedParquetSink}

/** The persisted incremental ANN index ([[graft.engine.AnnIndex]]):
  * IVF-PQ quantizers + encoded corpus as versioned tables, O(batch)
  * appends against frozen quantizers with exactly-once replay, search
  * over codes only, and generation-swapping retrain with history. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vectors(ids: Range, dim: Int) =
    ids.map { i =>
      (i.toLong, (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i}_$j".getBytes("UTF-8"))
        ((h(0) & 0xff) * 256 + (h(1) & 0xff)) / 65535.0 - 0.5
      })
    }.toDF("id", "vec")

  test("build publishes atomically; search runs over codes; appends are exactly-once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx"))
    val seed = vectors(0 until 60, 16)
    AnnIndex.build(spark, sink, "ann", seed, dim = 16,
      kCoarse = 4, m = 2, subK = 16)

    // all three tables landed in one transaction
    assert(sink.read(spark, "ann_centroids").count() == 4)
    assert(sink.read(spark, "ann_codebooks").count() == 32) // 2 subs x 16
    assert(sink.read(spark, "ann_vectors").count() == 60)

    val hits = AnnIndex.search(spark, sink, "ann",
      vectors(0 until 2, 16), probes = 4, k = 5)
    assert(hits.groupBy("q_id").count().collect()
      .forall(_.getLong(1) == 5))

    // a replayed build is rejected loudly (the index already exists)
    intercept[IllegalArgumentException] {
      AnnIndex.build(spark, sink, "ann", seed, 16, 4, 2, 16)
    }

    // append a new batch: encoded against the FROZEN quantizers —
    // existing rows' codes must be byte-identical afterwards
    val before = sink.read(spark, "ann_vectors")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(AnnIndex.append(spark, sink, "ann",
      vectors(60 until 90, 16), batchKey = "b1"))
    val after = sink.read(spark, "ann_vectors")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(after.size == 90)
    before.foreach { case (id, codes) => assert(after(id) == codes) }

    // crash-replay of the same batch encodes NOTHING twice
    assert(!AnnIndex.append(spark, sink, "ann",
      vectors(60 until 90, 16), batchKey = "b1"))
    assert(sink.read(spark, "ann_vectors").count() == 90)

    // new vectors are immediately searchable
    val hits2 = AnnIndex.search(spark, sink, "ann",
      vectors(60 until 61, 16), probes = 4, k = 5)
    assert(hits2.count() == 5)

    // cell health covers every vector exactly once
    val health = AnnIndex.cellHealth(spark, sink, "ann").collect()
    assert(health.map(_.getLong(1)).sum == 90)
  }

  test("streaming ingestion: files append exactly-once, replay-safe") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx3"))
    AnnIndex.build(spark, sink, "ann", vectors(0 until 30, 8),
      dim = 8, kCoarse = 3, m = 2, subK = 8)

    val dir = TestSpark.tmpDir("annvecs")
    def writeFile(name: String, ids: Range): Unit = {
      val lines = ids.map { i =>
        val v = vectors(i to i, 8).head.getSeq[Double](1)
        s"""{"id":$i,"vec":[${v.mkString(",")}]}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    writeFile("a", 30 until 40)
    writeFile("b", 40 until 50)
    val cp = TestSpark.tmpDir("anncp")
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = cp).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 50)

    // checkpoint loss + replay over the SAME files: content keys no-op
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(cp))
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = TestSpark.tmpDir("anncp2")).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 50)

    // a new file after the loss still lands
    writeFile("c", 50 until 55)
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = TestSpark.tmpDir("anncp3")).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 55)
    assert(sink.read(spark, "ann_vectors").select("id").distinct()
      .count() == 55)
  }

  test("hierarchical ingest: bit-identical to flat at superProbes >= g; " +
      "probe-1 still covers every vector; full-probe search is " +
      "assignment-invariant") {
    val seed = vectors(0 until 60, 16)
    val flatSink = new VersionedParquetSink(TestSpark.tmpDir("annh_flat"))
    AnnIndex.build(spark, flatSink, "ann", seed, dim = 16,
      kCoarse = 4, m = 2, subK = 16)
    // g = ceil(sqrt(4)) = 2: probing both super-cells sees every
    // centroid, so the two-level argmax tree collapses to flat's
    val fullSink = new VersionedParquetSink(TestSpark.tmpDir("annh_full"))
    AnnIndex.build(spark, fullSink, "ann", seed, dim = 16,
      kCoarse = 4, m = 2, subK = 16, superProbes = Some(2))
    def rows(s: VersionedParquetSink) =
      s.read(spark, "ann_vectors").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
        .sortBy(_._1).toSeq
    assert(rows(fullSink) == rows(flatSink),
      "superProbes >= g ingest must equal flat ingest bit-for-bit")

    // probe-1 two-level: approximate cells, but NEVER lost vectors
    val p1Sink = new VersionedParquetSink(TestSpark.tmpDir("annh_p1"))
    AnnIndex.build(spark, p1Sink, "ann", seed, dim = 16,
      kCoarse = 4, m = 2, subK = 16, superProbes = Some(1))
    val p1 = rows(p1Sink)
    assert(p1.map(_._1) == (0L until 60L).toSeq, "vectors lost/duplicated")
    assert(p1.forall { case (_, c, _) => c >= 0 && c < 4 })
    // codes don't depend on cells — byte-identical across modes
    assert(p1.map(r => r._1 -> r._3).toMap ==
      rows(flatSink).map(r => r._1 -> r._3).toMap)

    // probing ALL coarse cells makes search assignment-invariant:
    // every vector is a candidate whatever cell it sits in, so the
    // approximate ingest cannot change full-probe results
    def hits(s: VersionedParquetSink, probes: Int) =
      AnnIndex.search(spark, s, "ann", vectors(0 until 3, 16),
        probes = probes, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits(p1Sink, 4) == hits(flatSink, 4))

    // recall@probes bound: partial-probe search over the hierarchical
    // ingest must stay within reach of the flat ingest's recall — the
    // probe-1 assignment is a recall trade at the CELL level, never a
    // collapse (deterministic fixtures, so a fixed floor is stable)
    val truth = hits(flatSink, 4)
    def recall(s: VersionedParquetSink) =
      hits(s, 2).intersect(truth).size.toDouble / truth.size
    val (rFlat, rHier) = (recall(flatSink), recall(p1Sink))
    assert(rHier >= rFlat - 0.25 && rHier >= 0.3,
      f"partial-probe recall collapsed: hier=$rHier%.2f flat=$rFlat%.2f")
    System.err.println(
      f"[annidx] recall@2of4: flat=$rFlat%.2f hier(p1)=$rHier%.2f")
  }

  test("two-level query probing: bit-identical to flat probing when " +
      "super-probes cover the super-cells; probe-1 still answers " +
      "every query") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annqp"))
    AnnIndex.build(spark, sink, "ann", vectors(0 until 60, 16),
      dim = 16, kCoarse = 4, m = 2, subK = 16)
    val qs = vectors(0 until 4, 16)
    def hits(sp: Option[Int]) =
      AnnIndex.search(spark, sink, "ann", qs, probes = 2, k = 5,
        superProbes = sp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // g = ceil(sqrt(4)) = 2: probing both super-cells sees every live
    // cell, so the probe list — and therefore the full result, scores
    // included — must equal flat probing exactly
    assert(hits(Some(2)) == hits(None),
      "covering super-probes must reproduce flat probing bit-for-bit")
    // p=1 is approximate but must still answer every query with k hits
    val p1 = AnnIndex.search(spark, sink, "ann", qs, probes = 2, k = 5,
      superProbes = Some(1))
    assert(p1.groupBy("q_id").count().collect()
      .forall(_.getLong(1) == 5L), "probe-1 lost queries or hits")
    assert(p1.select("q_id").distinct().count() == 4)

    // the backward-compat fallback (no persisted super tables —
    // pre-supers indexes) must be BIT-identical to the persisted path:
    // call the search engine directly with superStructs = None
    import graft.engine.Pq
    val coarse = sink.read(spark, "ann_centroids")
    val books0 = sink.read(spark, "ann_codebooks")
    val model = Pq.Model(2, 8, (0 until 2).map(i =>
      books0.filter(col("sub") === i).select("cell", "c_emb", "c_nrm")))
    val derived = Pq.searchIvf(spark, sink.read(spark, "ann_vectors"),
      coarse, model, qs, probes = 2, k = 5, superProbes = Some(1),
      superStructs = None).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val persisted = AnnIndex.search(spark, sink, "ann", qs, probes = 2,
      k = 5, superProbes = Some(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(derived == persisted,
      "per-call super derivation diverged from the persisted structures")
  }

  test("registry path: a persisted index built with the registry's " +
      "quantizer parameters reproduces the in-session assignment") {
    import graft.engine.{KMeans, Tables}
    val d = "/root/testdata/sf0.001"
    graft.GraftExtensions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
    val root = TestSpark.tmpDir("annreg")
    AnnIndex.build(spark, new VersionedParquetSink(root), "ann",
      Tables.embeddings(spark, d).select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec")),
      dim = 64, kCoarse = 10, m = 2, subK = 16, iters = 2)
    // annCentroids == the registry's own full-corpus training
    val trained = KMeans.train(spark, e, k = 10, iters = 2)
      .orderBy("cell").collect().map(_.toString).toSeq
    val persisted = graft.queries.NorthStarQueries
      .annCentroids(spark, root).orderBy("cell")
      .collect().map(_.toString).toSeq
    assert(persisted == trained,
      "persisted quantizer diverged from in-session training")
    // annAssigned == the flat in-session assignment rule
    val cents = KMeans.train(spark, e, k = 10, iters = 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cell"))
    val flat = e.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr("graft_dot(emb, c_emb)") /
        (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ann = graft.queries.NorthStarQueries
      .annAssigned(spark, d, root)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell"))
      .toMap
    assert(ann == flat, "persisted assignment diverged from in-session")
    // and the joined shape carries the full (vec_id, emb, nrm, cell)
    // contract the registry consumers expect
    val cols = graft.queries.NorthStarQueries
      .annAssigned(spark, d, root).columns.toSeq
    assert(cols == Seq("vec_id", "emb", "nrm", "cell"))

    // a STALE index (built over a subset of the corpus) fails loudly
    // instead of silently dropping the uncovered vectors
    val staleRoot = TestSpark.tmpDir("annstale")
    AnnIndex.build(spark, new VersionedParquetSink(staleRoot), "ann",
      Tables.embeddings(spark, d).filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec")),
      dim = 64, kCoarse = 5, m = 2, subK = 16, iters = 1)
    val ex = intercept[IllegalArgumentException] {
      graft.queries.NorthStarQueries.annAssigned(spark, d, staleRoot)
    }
    assert(ex.getMessage.contains("re-ingest"))

    // CONTENT drift (same vec_ids, re-embedded values) passes the
    // coverage count but must fail the fingerprint check
    val driftRoot = TestSpark.tmpDir("anndrift")
    AnnIndex.build(spark, new VersionedParquetSink(driftRoot), "ann",
      Tables.embeddings(spark, d).select(col("vec_id").as("id"),
        expr("transform(cast(embedding as array<double>), x -> x * 2.0)")
          .as("vec")),
      dim = 64, kCoarse = 5, m = 2, subK = 16, iters = 1)
    val ex2 = intercept[IllegalArgumentException] {
      graft.queries.NorthStarQueries.annAssigned(spark, d, driftRoot)
    }
    assert(ex2.getMessage.contains("CONTENT"))
  }

  test("retrain swaps generations atomically per table; history survives") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx2"))
    AnnIndex.build(spark, sink, "ann", vectors(0 until 40, 8),
      dim = 8, kCoarse = 3, m = 2, subK = 8)
    AnnIndex.append(spark, sink, "ann", vectors(40 until 80, 8), "b1")
    val grown = AnnIndex.cellHealth(spark, sink, "ann").collect()
      .map(_.getLong(1)).sum
    assert(grown == 80)

    // retrain on the full current corpus: the quantizer generation
    // swaps, every vector re-encodes, search stays correct
    AnnIndex.retrain(spark, sink, "ann", vectors(0 until 80, 8),
      dim = 8, kCoarse = 5, m = 2, subK = 16)
    assert(sink.read(spark, "ann_centroids").count() == 5)
    assert(sink.read(spark, "ann_vectors").count() == 80)
    val hits = AnnIndex.search(spark, sink, "ann",
      vectors(0 until 2, 8), probes = 5, k = 3)
    assert(hits.count() == 6)
    // the pre-retrain index generation is still time-travelable
    assert(sink.readAt(spark, "ann_centroids", 0).count() == 3)
  }

  test("probe reuse gate: an EMPTY or mismatched ann_meta reads as " +
      "'not covered' instead of crashing (ADVICE r14 #1)") {
    // empty ann_meta = the partial/corrupt-prior-build shape: sum()
    // over zero rows returns null, which must mean rebuild, not NPE
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annmeta"))
    val empty = spark.range(0).select(col("id").as("n"), col("id").as("fpsum"))
    sink.append(empty, "ann_meta")
    assert(!ScaleProbe.annMetaCovered(spark, sink, 10L, 99L))

    // a matching additive fingerprint (rows sum to (n, fp)) is covered
    sink.append(Seq((6L, 40L), (4L, 59L)).toDF("n", "fpsum"), "ann_meta")
    assert(ScaleProbe.annMetaCovered(spark, sink, 10L, 99L))
    // count or content drift both read as not covered
    assert(!ScaleProbe.annMetaCovered(spark, sink, 11L, 99L))
    assert(!ScaleProbe.annMetaCovered(spark, sink, 10L, 98L))

    // a missing table (read throws) also degrades to not covered
    val bare = new VersionedParquetSink(TestSpark.tmpDir("annmeta2"))
    assert(!ScaleProbe.annMetaCovered(spark, bare, 10L, 99L))
  }
}
