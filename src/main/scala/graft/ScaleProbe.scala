package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x scale probe: measures how each heavy query's runtime grows from
  * sf0.1 to a synthesized ~10x corpus — the empirical check behind the
  * "would this plan survive a 100 TB scale-up" claims (a plan audit
  * shows the SHAPE is right; this shows the measured exponent).
  *
  * Data synthesis (derived from sf0.1, written under /tmp — testdata is
  * read-only): each table is replicated `factor` times with ids remapped
  * into disjoint ranges. Content is VARIED per replica so similarity
  * structure scales like 10x more data, not 10 copies of the same data
  * (10 verbatim copies would make every document a member of a 10-way
  * near-dup clique — a quadratic pair blow-up that measures the
  * SYNTHESIS artifact, not the plan):
  *  - documents: per-replica character substitution (rotating vowel /
  *    consonant maps, length-preserving so n_chars stays consistent) —
  *    replicas share no shingles, so near-dup structure is replica-local
  *    and pair counts scale linearly;
  *  - embeddings: per-replica circular shift of the 64-dim vector,
  *    composed with whole-vector negation for replicas >= 64
  *    (norm-preserving, direction-scrambling — no cross-replica cosine
  *    near-dups; 128 distinct isometries cover every allowed factor);
  *  - events: user_id/event_id remapped per replica (10x users, same
  *    per-user event distribution).
  *
  * Output: one JSON line {"factor":N,"queries":{q:{"t1":s,"t10":s,
  * "ratio":r}},...} on stdout and in SCALE_PROBE_OUT (default
  * /root/repo/scale_probe.json). `ratio` is t10/t1 — ~10 means linear,
  * >~14 (exponent > ~1.15) flags a super-linear plan.
  *
  * PARAMETERIZED-FORM runs: the cell-blocked embedding queries
  * (q_dedup_embed / q_embed_contam / q_mutual_nn / q_margin_nn) carry a
  * fixed-k ORACLE literal, so a plain probe measures the fixed-cell
  * artifact (per-cell membership grows with the corpus — 83-432x at
  * 100x), not the production plan. Re-probe them with
  * `GRAFT_CELLS_PER=200` (k = ceil(nVecs/200): 10/100/1000 cells at
  * 1x/10x/100x — NorthStarQueries.ivfK) and a separate
  * SCALE_PROBE_OUT (scale_probe_param*.json) so the artifact
  * documentation in the main files is preserved. Measured r10:
  * 2.3-5.3x at 10x in that form.
  */
object ScaleProbe {

  /** The probe set: the dedup/similarity family plus the slowest
    * documents/embeddings/events queries from the round-3 bench (the
    * TPC-H-table queries are plain scans/joins/windows whose linearity
    * Spark itself guarantees; the hand-built LSH/graph/model topologies
    * are where a super-linear surprise could hide). */
  val ProbeQueries: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash", "q_simhash",
    "q_dedup_embed", "q_dedup_groups", "q_dedup_keep", "q_minhash_est",
    "q_dup_rate_source", "q_split_groups", "q_lm_score", "q_cosine_topk",
    "q_ann_bucket", "q_srp_ann", "q_tfidf", "q_repetition",
    "q_sessionize", "q_zscore", "q_span_clean", "q_entropy",
    "q_fuzzy_verify", "q_novelty", "q_nearest_dup",
    // round-8 curation wave (q_semdedup is deliberately absent: its
    // pair join is N²/k and the ORACLE query's k is necessarily a
    // corpus-independent literal, so a fixed-k 10x run measures the
    // quantizer-too-coarse artifact, not the plan — the scale path is
    // engine/SemDedup.semdedup with k = ceil(N/targetCellSize),
    // cell-boundedness asserted in SemDedupSpec; the probed
    // q_dedup_embed covers the same join-on-cell topology)
    "q_gopher", "q_mix_weights", "q_dsir", "q_mad_outlier", "q_ivf_recall",
    // corpus-statistics wave: vocab grows with the replica substitutions
    // (each replica's tokens are distinct), so these probe the
    // vocab-aggregate topologies under real vocabulary growth
    "q_ttr", "q_oov_rate", "q_zipf", "q_source_overlap",
    // product quantization: assignment passes + code-keyed LUT joins
    "q_pq_encode", "q_pq_ann",
    // banded simhash: capped (band, byte) buckets + hamming verify
    "q_hamming_pairs",
    // round-8 tail: length-band/fertility (lang-keyed aggregates), the
    // corpus-build composite (q_pack's running-sum window precedent),
    // and the information-theoretic wave (bigram/token-keyed shuffles
    // with exact DECIMAL ln sums — vocab grows under the replica
    // substitutions, so these probe real key-space growth)
    "q_len_trim", "q_fertility", "q_corpus_build",
    "q_bigram_entropy", "q_kl_source", "q_burstiness",
    // lexical-stats wave: per-lang running-sum window over a GROWING
    // vocab (q_vocab_coverage), bigram+unigram joined association table
    // (q_pmi — two vocab-keyed joins and two 1-row totals), row-local
    // embedding prefix energy (q_dim_energy)
    "q_vocab_coverage", "q_pmi", "q_dim_energy",
    // temporal monitors: lag-ladder / trailing-frame windows over the
    // per-(type, day) aggregate — sub-linear surface, events-keyed rollup
    "q_ewma", "q_spike",
    // NB lang-ID eval: profile aggregates (langs x vocab) + word-keyed
    // scoring joins with a bounded |langs| fan-out
    "q_nb_langid",
    // row-local stutter collapse: pure per-row array op, flat by design
    "q_destutter",
    // round-9 wave: PII scrub (row-local regex map pass), KS drift
    // (histogram-sized CDF grid after one rollup), CUSUM + daily P50/95
    // (windows over the per-(type, day) aggregate), BM25 (filtered
    // explode + broadcast df/totals)
    "q_pii_scrub", "q_ks_drift", "q_cusum", "q_daily_p95", "q_bm25",
    // waterfilling: one rollup, then |sources|-row window arithmetic
    "q_budget_fill",
    // simplified silhouette: the assignment's own broadcast-k scoring
    // pass plus a per-vector top-2 window
    "q_silhouette",
    // audit wave: blocklist/url are row-local map passes (flat-by-
    // design control rows); JS divergence adds the absent-mass scalar
    // to the kl_source topology; boilerplate is the trigram-keyed
    // window-over-aggregate; winnow is one per-doc window over kgram
    // positions. q_embed_contam carries the q_dedup_embed fixed-k
    // caveat at 100x (per-cell membership grows under the oracle's
    // corpus-independent k, inflating the within-cell pair term — the
    // parameterized engine path grows k with the corpus).
    "q_blocklist", "q_url_audit", "q_js_div", "q_boilerplate",
    "q_winnow", "q_embed_contam",
    // MOSS pair detection (df-capped fingerprint-keyed pair join) and
    // content-defined chunking (row-local flags + per-doc cumsum +
    // bounded chunk reassembly)
    "q_winnow_pairs", "q_cdc_chunk",
    // tie-corrected Spearman: rank windows over value-distinct
    // aggregates, doc stream picks ranks up by keyed joins
    "q_spearman",
    // Mann-Whitney AUC + PR curve: the r4-rounded score bounds the
    // rank/threshold table at ~10^4 rows at any corpus size — expect a
    // FLAT post-rollup cost
    "q_auc", "q_pr_curve",
    // graph-analytics wave: PageRank is 5 materialized vertex-keyed
    // rounds over the candidate-pair graph (state = one row per node;
    // cost tracks the edge list, which the df-capped shingle join keeps
    // proportional to candidates); triangles/assortativity are keyed
    // joins over the same edge list. q_mutual_nn blocks on the trained
    // IVF cell and carries the q_embed_contam fixed-k caveat (per-cell
    // membership grows under the oracle's corpus-independent k — the
    // parameterized engine path grows k with the corpus)
    "q_pagerank", "q_triangles", "q_assortativity", "q_mutual_nn",
    "q_margin_nn",
    // BPE tokenizer training: the corpus is scanned once into the
    // word-frequency vocab; every merge round runs on the vocab, whose
    // size under the charMap substitutions grows ~linearly with the
    // replica count — so these probe training cost under real
    // vocabulary growth (the memo is invalidated before each timed run
    // so the measurement is training, not a cache read)
    "q_bpe_merges", "q_bpe_vocab", "q_bpe_compress",
    // calibration audit: row-local scoring + a 10-bin aggregate —
    // flat-by-design control rows like blocklist/url_audit
    "q_calibration", "q_ece",
    // ES weighted sampling: row-local keys + TakeOrderedAndProject
    // (zero corpus shuffles — expect the scan to dominate); CMS audit:
    // one vocab aggregate fanned x4 into a 1024-row sketch + broadcast
    // probe lookups — vocab grows under the replica substitutions
    "q_weighted_sample", "q_cms_err",
    // stratified sampling (source-keyed window, group-limit-pruned) and
    // tokenizer application (corpus explode + word-keyed vocab join;
    // pays BPE training per run via the q_bpe invalidation)
    "q_weighted_strata", "q_bpe_apply",
    // Stupid Backoff held-out scoring: the q_lm_score topology plus
    // word-keyed backoff joins — model tables grow with the vocab
    "q_sbo_score",
    // round-16 wave: RRF hybrid fusion (two TakeOrderedAndProject arm
    // reductions + a 100-row fusion join — expect the two arm scans to
    // dominate, flat join cost) and the screen-agreement kappa (two
    // row-local screens + one 5-field global aggregate, flat by design)
    "q_rrf", "q_kappa",
    // round-16 second wave: per-source centroid similarity (keyed
    // doc<->vec join + map-side-combinable (source, dim) partial sums
    // down to |sources|*64 rows, then an |sources|^2 broadcast-trivial
    // pairwise join) and directional containment (rides the SAME
    // memoized LSH pair table as q_minhash_est — probes the shared
    // candidate-join topology plus a row-local overlap projection)
    "q_centroid_sim", "q_containment",
    // within-source cohesion: the centroid-sum topology plus one
    // broadcast-join row-local scoring pass and a per-source mean
    "q_source_cohesion",
    // duplication profile: the shared pair table + CC labeling, then
    // two map-side-combinable aggregations to a handful of rows
    "q_dup_cluster_hist")

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    require(factor <= 125,
      "charMap provides 125 distinct substitutions; a larger factor " +
        "would alias replicas into cross-replica duplicate cliques")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_scale${factor}x")
    // ANN mode (NOTES r12 candidate): GRAFT_ANN_PROBE=1 probes the 11
    // embedding-family queries through the PERSISTED-index registry path
    // (the production default) instead of in-session training — an
    // AnnIndex is built per corpus tier (untimed: assignment is the
    // amortized ingest cost) and the timed runs measure the query-side
    // marginal: index read + one co-partitioned join. k follows the
    // k ∝ corpus rule (GRAFT_CELLS_PER, default 200), so this is the
    // parameterized form BY CONSTRUCTION — no fixed-k artifact caveat.
    // The shift+negation embedding synthesis below is alias-free to 125
    // replicas, so this mode runs at every factor the probe allows.
    val annProbe = sys.env.get("GRAFT_ANN_PROBE").map(_.trim)
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MAX_PARTITION_BYTES (e.g. "4m"): scan-split size for
    // split-packing experiments. The synthetic corpora are SMALL in
    // bytes (a 100x documents table is ~tens of MB), so under the
    // default 128 MB target the whole table bin-packs into ONE scan
    // split and every row-local map pass runs single-task at BOTH
    // tiers — the measured ratio is then raw data growth, not the
    // plan (a production 100 TB scan arrives in thousands of splits).
    // Setting this to corpus_bytes/cores reproduces the deployment
    // split shape without touching any query.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").map(_.trim)
      .filter(_.nonEmpty)
      .foreach(v => builder.config("spark.sql.files.maxPartitionBytes", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    generateIfMissing(spark, src, out, factor)

    // ANN mode: one persisted index per corpus tier, built (once) with
    // k = ceil(n / cellsPer). The build is untimed on purpose — it is
    // the amortized ingest cost; the probe measures the per-QUERY
    // marginal against the frozen index, which is what grows with the
    // corpus in a deployment.
    val annRoots: Map[String, String] =
      if (!annProbe) Map.empty
      else Seq(src, out).map { dir =>
        dir -> ensureAnnIndex(spark, dir,
          "/tmp/graft_ann_probe_" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
      }.toMap
    // Flip the registry seam only when the ACTIVE tier changes: the
    // per-dir memoized assignment survives execOnce's min-of-two pair
    // (steady-state measurement), and the ann-keyed memo + invalidation
    // guarantee a tier flip can never serve the other tier's plan.
    var annActive: Option[String] = None
    def annSelect(dir: String): Unit = if (annProbe) {
      val root = annRoots(dir)
      if (!annActive.contains(root)) {
        graft.queries.NorthStarQueries.annDirOverride = Some(Some(root))
        graft.queries.NorthStarQueries.invalidateAnnCaches()
        annActive = Some(root)
      }
    }

    def execOnce(name: String, dir: String): Double = {
      // BPE queries memoize the trained tokenizer per (session, dir);
      // drop it so each timed run pays training (see ProbeQueries note)
      if (name.startsWith("q_bpe")) graft.queries.TokenizerQueries.invalidate()
      annSelect(dir)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    def exec(name: String, dir: String): Double =
      math.min(execOnce(name, dir), execOnce(name, dir))

    // warmup both dirs (codegen, collation init, parquet reader); ANN
    // mode additionally pays the index-open + graft_dot codegen once
    if (annProbe) { exec("q_ivf_cells", src); exec("q_ivf_cells", out) }
    else { exec("q_dedup_exact", src); exec("q_dedup_exact", out) }

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val probeSet =
      if (annProbe) graft.queries.NorthStarQueries.EmbeddingFamily
      else ProbeQueries
    val rows = probeSet.filter(n => only.forall(_.contains(n))).map { q =>
      val t1 = exec(q, src)
      val t10 = exec(q, out)
      val ratio = if (t1 > 0) t10 / t1 else -1.0
      System.err.println(f"[probe] $q%-20s t1=$t1%6.2fs t10=$t10%6.2fs ratio=$ratio%5.2f")
      q -> (t1, t10, ratio)
    }
    val qs = rows.map { case (q, (t1, t10, r)) =>
      f""""$q":{"t1":$t1%.3f,"t10":$t10%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val annField = if (annProbe) """"ann":true,""" else ""
    val json = s"""{"factor":$factor,$annField"src":"$src","queries":$qs}"""
    println(json)
    // Subset runs (SPARK_GRAFT_ONLY) default to a SEPARATE file: the
    // committed full-set artifact must never be silently replaced by a
    // partial one (observed live in r16 — a 2-query probe clobbered
    // scale_probe.json and had to be restored from git). An explicit
    // SCALE_PROBE_OUT still wins for both shapes.
    val subsetSuffix = if (only.isDefined) "_subset" else ""
    val outPath = sys.env.getOrElse("SCALE_PROBE_OUT",
      if (annProbe) s"/root/repo/scale_probe_ann$subsetSuffix.json"
      else s"/root/repo/scale_probe$subsetSuffix.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[probe] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }

  /** Builds (once) a persisted AnnIndex over `dir`'s embeddings under
    * `root`, k = ceil(n / GRAFT_CELLS_PER default 200) — the same build
    * `graft.AnnIngest` runs in production (dim/m/subK/iters pinned to
    * its defaults so probe and deployment measure the same index
    * shape). Reuse requires (ADVICE r13) the index to match on ALL of:
    * corpus COUNT, corpus CONTENT (the index's additive ann_meta
    * (n, fpsum) fingerprint recomputed over the live embeddings — a
    * stale index surviving a same-count corpus regeneration at the
    * same root must rebuild here, not abort at annAssigned's require
    * deep inside query timing), and the (k, cap) TRAINING RECIPE (a
    * probe-local `_recipe` marker written at build time — a changed
    * GRAFT_CELLS_PER/GRAFT_TRAIN_CAP would otherwise silently reuse an
    * index trained with the old k, skewing timings). Any mismatch, or
    * a pre-marker legacy root, rebuilds from scratch. */
  private def ensureAnnIndex(spark: SparkSession, dir: String,
      root: String): String = {
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    // one pass over the embeddings: count + the SAME canonical
    // fingerprint AnnIndex.fingerprintRow persists per ingest batch
    val fpRow = vectors.agg(count(lit(1)),
      coalesce(sum(crc32(concat_ws(",", col("id"),
        col("vec").cast("array<double>").cast("string")))), lit(0L))).head()
    val (n, fp) = (fpRow.getLong(0), fpRow.getLong(1))
    val cellsPer = sys.env.get("GRAFT_CELLS_PER").map(_.trim)
      .filter(_.nonEmpty).map(_.toInt).getOrElse(200)
    val k = math.max(1, math.ceil(n.toDouble / cellsPer).toInt)
    val cap = math.max(k, sys.env.get("GRAFT_TRAIN_CAP").map(_.trim)
      .filter(_.nonEmpty).map(_.toInt).getOrElse(20000))
    // single source of truth for the hierarchical-index shape: the
    // recipe marker and the build call below both read THIS val, so a
    // future shape change cannot leave a stale index silently passing
    // the recipe check (ADVICE r14 #2)
    val superProbes = 2
    val recipe = s"n=$n fp=$fp k=$k cap=$cap superProbes=$superProbes"
    val recipePath = java.nio.file.Paths.get(root, "_recipe")
    val sink = new graft.engine.VersionedParquetSink(root)
    val covered = sink.exists(spark, "ann_vectors") &&
      sink.exists(spark, "ann_meta") &&
      annMetaCovered(spark, sink, n, fp) && {
        val stored = try new String(java.nio.file.Files.readAllBytes(
            recipePath), java.nio.charset.StandardCharsets.UTF_8).trim
          catch { case _: Throwable => "" }
        if (stored != recipe && stored.nonEmpty)
          System.err.println(s"[probe] index recipe changed " +
            s"('$stored' -> '$recipe'); rebuilding")
        stored == recipe
      }
    if (!covered) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      // quantizer training is SAMPLED (GRAFT_TRAIN_CAP, default 20000 —
      // the recipe the r12 100x registry baseline was built with):
      // uncapped k-means is O(N·k)/iteration, ~minutes at k=1000 over
      // 200k vectors, and the probe measures the QUERY-side marginal,
      // not training — bounded-sample training is the production ingest
      // practice (FAISS trains nlist centroids on a sample)
      System.err.println(s"[probe] building AnnIndex n=$n k=$k cap=$cap -> $root")
      val t0 = System.nanoTime()
      graft.engine.AnnIndex.build(spark, new graft.engine.VersionedParquetSink(root),
        "ann", vectors, dim = 64, kCoarse = k, m = 2, subK = 16, iters = 2,
        superProbes = Some(superProbes), trainCap = Some(cap))
      java.nio.file.Files.write(recipePath,
        (recipe + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(
        f"[probe] index built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    root
  }

  /** True iff the persisted index's additive ann_meta fingerprint
    * matches the live corpus (count n + content fpsum). Null- and
    * failure-safe (ADVICE r14 #1): an EMPTY ann_meta left by a
    * partial/corrupt prior build makes sum() return null — getLong
    * there would NPE mid-probe — and any read failure means the same
    * thing; both report "not covered" so the caller rebuilds. */
  private[graft] def annMetaCovered(spark: SparkSession,
      sink: graft.engine.VersionedParquetSink, n: Long, fp: Long): Boolean =
    try {
      val m = sink.read(spark, "ann_meta")
        .agg(sum("n").cast("long"), sum("fpsum").cast("long")).head()
      !m.isNullAt(0) && !m.isNullAt(1) &&
        m.getLong(0) == n && m.getLong(1) == fp
    } catch { case e: Exception =>
      System.err.println(s"[probe] ann_meta check failed " +
        s"(${e.getMessage}); rebuilding")
      false
    }

  /** Per-replica length-preserving character map: independent rotations
    * of three disjoint letter groups (5 x 5 x 5 = 125 distinct maps), so
    * even a 100x corpus gives every replica a unique substitution and
    * similarity structure stays replica-local (two replicas sharing a
    * map would be verbatim copies of each other — a cross-replica
    * duplicate clique that measures the synthesis, not the plan).
    * Replica 0 is the identity (the base corpus is a subset of the
    * scaled one). */
  private def charMap(i: Int): (String, String) = {
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    ("aeiou" + "bcdfg" + "hjklm",
      rot("aeiou", i % 5) + rot("bcdfg", (i / 5) % 5) +
        rot("hjklm", (i / 25) % 5))
  }

  private[graft] def generateIfMissing(spark: SparkSession, src: String,
      out: String, factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // marker renamed when the embedding synthesis changed (r13,
    // shift-only -> shift+negation): a corpus left by the OLD generator
    // regenerates instead of silently carrying >64x replica aliases
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_READY_iso128"))) return
    System.err.println(s"[probe] generating ${factor}x corpus under $out")
    val reps = spark.range(factor).toDF("r")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val textCol = (0 until factor).foldLeft(lit(null).cast("string")) {
      (acc, i) =>
        val (from, to) = charMap(i)
        when(col("r") === i, translate(col("text"), from, to)).otherwise(acc)
    }
    docs.crossJoin(reps).select(
        (col("doc_id") + col("r") * maxDoc).as("doc_id"),
        textCol.as("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // Per-replica isometry = circular shift COMPOSED WITH whole-vector
    // negation for replicas >= 64: shifts alone cycle mod dims (64
    // variants — replicas i and i+64 would be verbatim copies, a
    // cross-replica exact-dup clique), and negation doubles the family
    // to 128 distinct norm-preserving maps, covering every factor the
    // require(factor <= 125) bound allows. The only structured
    // cross-replica pairs are the antipodal i/i+64 ones (cosine -1 —
    // maximally FAR for every near-dup / top-k query), so similarity
    // structure stays replica-local at 100x exactly like charMap keeps
    // it for documents.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dims = 64
    val embCol = (0 until factor).foldLeft(lit(null).cast("array<float>")) {
      (acc, i) =>
        val shift = (i * 7) % dims
        val shifted =
          if (shift == 0) col("embedding")
          else concat(slice(col("embedding"), shift + 1, dims - shift),
            slice(col("embedding"), 1, shift))
        val iso = if (i < 64) shifted else transform(shifted, x => -x)
        when(col("r") === i, iso).otherwise(acc)
    }
    emb.crossJoin(reps).select(
        (col("vec_id") + col("r") * maxVec).as("vec_id"),
        embCol.as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // ts passes through in whatever physical generation the source has
    // (native timestamp[us] today; raw int64 nanos on legacy data via
    // the session-wide nanosAsLong) — Tables.events dispatches on both
    val ev = spark.read.parquet(s"$src/events.parquet")
    val ids = ev.agg(max("user_id"), max("event_id")).head()
    val (maxUser, maxEvent) = (ids.getLong(0) + 1, ids.getLong(1) + 1)
    ev.crossJoin(reps).select(
        (col("event_id") + col("r") * maxEvent).as("event_id"),
        col("ts"),
        (col("user_id") + col("r") * maxUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    fs.create(new org.apache.hadoop.fs.Path(s"$out/_READY_iso128"), true).close()
  }
}
