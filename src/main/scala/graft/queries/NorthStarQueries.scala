package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.Text

/** North-star LLM-data-pipeline operators (SURVEY.md §2.8): deduplication
  * (exact / n-gram Jaccard / MinHash+LSH / SimHash / embedding-cosine),
  * similarity search (brute-force cosine top-k + LSH-bucketed ANN), and
  * text analysis (language ID, quality scoring, token counting,
  * fingerprinting) over the `documents` / `embeddings` testdata.
  *
  * Cross-engine determinism strategy:
  *  - hashing uses md5 (identical hex in Spark and DuckDB) — never
  *    xxhash64/murmur, which are engine-specific;
  *  - float vectors are cast to double BEFORE arithmetic on both engines
  *    and similarities rounded to 4 decimals so summation-order noise
  *    can't flip a comparison;
  *  - every threshold filter applies to the ROUNDED value so both engines
  *    make identical keep/drop decisions.
  *
  * Scale notes (100 TB): all shuffles key on shingle/band/bucket — the
  * standard distributed dedup topology. The quadratic all-pairs step only
  * ever runs *within* a band/bucket (LSH) or label block, never globally;
  * brute-force cosine broadcasts only the query-vector side. Hot shingles
  * are capped by document frequency (MaxShingleDf) exactly as production
  * dedup pipelines do — otherwise one stop-word shingle fans a single
  * reduce key out to (df choose 2) pairs.
  *
  * Perf notes: dot products run through the codegen'd `graft_dot`
  * expression ([[graft.functions.DotProduct]]) with norms computed once
  * per vector, not per pair; shingling runs as a typed flatMap (Spark's
  * higher-order lambdas are interpreted, ~20x slower here).
  */
object NorthStarQueries {

  /** Doc-frequency cap for near-dup shingles: a shingle occurring in more
    * than this many documents carries no dedup signal but quadratic join
    * cost. Mirrored verbatim in the DuckDB oracles. */
  private val MaxShingleDf = 5

  /** q_hamming_pairs bucket cap: a (band, byte) bucket hotter than this
    * is a degenerate collision class (templated content) and is dropped
    * — the MaxShingleDf treatment keeping banded-simhash pair volume
    * bounded at any corpus size. */
  private val HammingBucketCap = 50

  /** Reciprocal-rank-fusion constants (q_rrf): the canonical k = 60
    * damping from Cormack et al., fusing each arm's top-100 list. */
  private val RrfK = 60
  private val RrfDepth = 100

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** (doc_id, s): distinct word-3-gram shingles per document, via typed
    * flatMap (JVM sliding loop; HOF transform() is interpreted). */
  private[queries] def shingled(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d).select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, t) => Text.shingleSet(t, 3).map((id, _)) }
      .toDF("doc_id", "s")
  }

  /** BOUNDED per-(session, dir) memoization shared by the four cached
    * tables below: at most ONE dir per live session — touching a new dir
    * evicts (and unpersists) the session's entries for other dirs, since
    * only one data dir is active per run; entries of stopped sessions
    * are always swept. A long-lived session walking many dirs therefore
    * pins one dir's block set per cache, not one per dir ever touched.
    * The (re-)cache at the end covers a host's clearCache() between
    * queries (Bench/Verify do this), which drops blocks but not memo
    * entries. */
  private[queries] def memoize(
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    import scala.jdk.CollectionConverters._
    cache.entrySet.asScala
      .filter(e => e.getKey._1 == s && e.getKey._2 != d).toSeq
      .foreach { e =>
        try e.getValue.unpersist() catch { case _: Exception => () }
        cache.remove(e.getKey)
      }
    val df = cache.computeIfAbsent((s, d), _ => build)
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.cache()
    df
  }

  /** Shingles with the hot-shingle cap applied (df <= MaxShingleDf), the
    * input to pairwise jaccard. Cached because one query uses it three
    * times (sizes + both join sides) — and memoized per (session, dir) so
    * repeated calls through the public SparkEntry.queries contract reuse
    * ONE cached table instead of leaking a new set of blocks per call. */
  private[queries] val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[queries] def cappedShingles(s: SparkSession, d: String): DataFrame =
    memoize(shingleCache, s, d) {
      // df cap as a count-over-partition window: ONE shuffle of the
      // shingle stream, vs the groupBy+join form's TWO evaluations of
      // the flatMap shingling plus a join (measured ~15% off the whole
      // dedup-family build at sf0.1)
      val w = Window.partitionBy("s")
      shingled(s, d)
        .withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= MaxShingleDf)
        .select("doc_id", "s")
    }

  /** (doc_id, s, h): shingles with their md5, memoized+cached per
    * (session, dir) like cappedShingles — q_minhash_est reads it four
    * times per run, and a bare per-call .cache() would leak a new block
    * set on every invocation through the public queries contract. */
  private[queries] val hashedCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[queries] def hashedShingles(s: SparkSession, d: String): DataFrame =
    memoize(hashedCache, s, d) {
      shingled(s, d).select(col("doc_id"), col("s"),
        md5(col("s").cast("binary")).as("h"))
    }

  /** Trained IVF centroids (cell, c_emb, c_nrm): deterministic k-means
    * over the corpus (engine/KMeans.scala — hash-ordered init, 2 fixed
    * iterations, decimal-exact order-independent updates), memoized+
    * cached per (session, dir) because BOTH IVF queries and the training
    * iterations themselves re-read it. k=10, matching the label
    * cardinality of the synthetic corpus. */
  val IvfK = 10
  val IvfIters = 2

  /** Cell count actually used to train: the fixed [[IvfK]] literal by
    * default — the oracle replays k-means as literal SQL CTEs, so the
    * correctness gate pins the sf-scale k — or, when `GRAFT_CELLS_PER`
    * is set (a target cell SIZE), k = ceil(nVecs / target): the
    * parameterized rule the engine paths already apply
    * (Contamination / SemDedup / AnnIndex — k ∝ corpus keeps per-cell
    * membership bounded as data grows; under a FIXED k the within-cell
    * pair term of every cell-blocked query goes quadratic in fill, the
    * measured 100x-probe artifact on q_embed_contam / q_dedup_embed /
    * q_mutual_nn / q_margin_nn). ScaleProbe sets GRAFT_CELLS_PER so the
    * embedding family is probed in this production form; the driver's
    * oracle run never sets it (a data-dependent k has no DuckDB literal
    * mirror). */
  private[queries] def ivfK(s: SparkSession, d: String): Int =
    sys.env.get("GRAFT_CELLS_PER").map(_.trim).filter(_.nonEmpty) match {
      case Some(t) =>
        // validate up front: a malformed/non-positive value would
        // otherwise surface as a NumberFormatException (or a
        // divide-by-zero-shaped Int overflow) deep inside memoized
        // centroid training, far from the misconfiguration
        val target = t.toIntOption.filter(_ > 0).getOrElse(
          throw new IllegalArgumentException(
            s"GRAFT_CELLS_PER must be a positive integer " +
              s"(target cell size), got '$t'"))
        math.max(1, math.ceil(emb(s, d).count().toDouble / target).toInt)
      case None => IvfK
    }

  /** The persisted-index root, when set: `GRAFT_ANN_DIR` names a
    * [[graft.engine.VersionedParquetSink]] holding an
    * [[graft.engine.AnnIndex]] built with prefix "ann" over THIS
    * corpus. With it set, the embedding family reads the quantizer and
    * cell assignments the index PERSISTED AT INGEST (each vector
    * assigned once, O(batch·k) amortized — the production path at
    * k ∝ corpus) instead of training + assigning per session. The
    * driver's oracle runs never set it: the DuckDB mirror replays
    * fixed-k flat training as literal SQL, so oracle mode keeps the
    * in-session path byte-identical to before. */
  private[queries] def annDir: Option[String] =
    annDirOverride.getOrElse(
      sys.env.get("GRAFT_ANN_DIR").map(_.trim).filter(_.nonEmpty))

  /** Test seam: env is immutable in-process, so the registry-parity
    * spec flips the embedding family between the in-session path
    * (`Some(None)`) and a persisted index (`Some(Some(root))`) through
    * this override. The ann-dependent memo keys BAKE IN the active
    * index root ([[annMemoKey]]), so a flip can never alias a stale
    * entry; [[invalidateAnnCaches]] additionally releases the old
    * path's cached blocks promptly. */
  private[graft] var annDirOverride: Option[Option[String]] = None

  /** Every SparkEntry query whose plan consumes the IVF quantizer
    * (trainedCentroids / ivfAssigned) — the set that switches to the
    * persisted index under GRAFT_ANN_DIR. One definition, consumed by
    * the registry parity spec AND Bench's ANN mode. */
  private[graft] val EmbeddingFamily: Seq[String] = Seq(
    "q_dedup_embed", "q_semdedup", "q_embed_contam",
    "q_mutual_nn", "q_margin_nn",
    "q_ivf_assign", "q_ivf_search", "q_ivf_probe2", "q_ivf_cells",
    "q_silhouette", "q_ivf_recall")

  /** Memo key for ann-path-DEPENDENT caches: the active index root is
    * part of the key (ADVICE r12 — a plain (session, dir) key lets an
    * annDirOverride flip serve the other path's cached plan), and the
    * memoize eviction rule ("new dir evicts the session's other dirs")
    * then also unpersists the stale path's blocks on a flip. */
  private def annMemoKey(d: String): String =
    annDir.map(r => s"$d\u0000$r").getOrElse(d)

  /** Registry of every ann-path-DEPENDENT memo map (ADVICE r12): a
    * memo whose entries bake in the active index path must be CREATED
    * through [[annScopedCache]], so [[invalidateAnnCaches]] iterates
    * all of them structurally — a future memo added elsewhere cannot
    * be silently missed on an [[annDirOverride]] flip. (The
    * [[annMemoKey]] keying already prevents cross-path ALIASING even
    * for a missed cache; this registry additionally guarantees prompt
    * block release and a clean parity-spec flip.) */
  private val annScopedCaches = new java.util.concurrent.CopyOnWriteArrayList[
    java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]]()
  private def annScopedCache(): java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame] = {
    val m = new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]()
    annScopedCaches.add(m)
    m
  }

  /** Drops the memoized centroid/assignment tables (and their cached
    * blocks): required when [[annDirOverride]] changes, since the
    * cached DataFrames bake in whichever path built them. */
  private[graft] def invalidateAnnCaches(): Unit = {
    import scala.jdk.CollectionConverters._
    annScopedCaches.asScala.foreach { c =>
      c.values.asScala.foreach(df =>
        try df.unpersist() catch { case _: Exception => () })
      c.clear()
    }
  }

  /** Quantizer read from a persisted AnnIndex (cell, c_emb, c_nrm) —
    * the GRAFT_ANN_DIR form of [[trainedCentroids]]. */
  private[graft] def annCentroids(s: SparkSession, root: String): DataFrame =
    new graft.engine.VersionedParquetSink(root).read(s, "ann_centroids")
      .select(col("cell"), col("c_emb"), col("c_nrm"))

  /** Cell assignments read from a persisted AnnIndex, re-joined with
    * the corpus embeddings (the index stores only (id, cell, codes);
    * queries need the vectors) — the GRAFT_ANN_DIR form of
    * [[ivfAssigned]]. One co-partitioned join on vec_id replaces the
    * O(N·k) assignment pass. */
  private[graft] def annAssigned(s: SparkSession, d: String,
      root: String): DataFrame = {
    val sink = new graft.engine.VersionedParquetSink(root)
    val cells = sink.read(s, "ann_vectors")
      .select(col("id").as("vec_id"), col("cell"))
    val joined = emb(s, d).join(cells, "vec_id")
      .select(col("vec_id"), col("emb"), col("nrm"), col("cell"))
      .cache()
    // Staleness guard: the inner join would otherwise SILENTLY drop
    // corpus vectors the index has not ingested (an index built over a
    // different or older corpus) — every downstream blocking/dedup
    // result would be quietly wrong. One count pair per memoized build.
    val nCorpus = emb(s, d).count()
    val nJoined = joined.count()
    require(nJoined == nCorpus,
      s"AnnIndex at '$root' covers $nJoined of $nCorpus corpus vectors; " +
        "re-ingest (graft.AnnIngest) before pointing GRAFT_ANN_DIR at " +
        "this corpus")
    // Content-drift guard: a re-embedded corpus keeps its vec_ids, so
    // coverage alone would pass while every cell was computed from the
    // OLD vectors. The index's additive (n, fpsum) meta rows sum to
    // the fingerprint of everything it ingested; when that count
    // EQUALS the corpus count, the fingerprints must match (a strict
    // superset index — extra ingested docs — cannot be attributed
    // either way, so it is checked for coverage only).
    if (sink.exists(s, "ann_meta")) {
      val m = sink.read(s, "ann_meta")
        .agg(sum("n").cast("long"), sum("fpsum").cast("long")).head()
      if (m.getLong(0) == nCorpus) {
        val fp = emb(s, d).agg(coalesce(sum(crc32(concat_ws(",",
          col("vec_id"), col("emb").cast("string")))), lit(0L))).head()
        require(fp.getLong(0) == m.getLong(1),
          s"AnnIndex at '$root' was built from different vector CONTENT " +
            "for the same ids (re-embedded corpus?); re-ingest " +
            "(graft.AnnIngest) before pointing GRAFT_ANN_DIR here")
      }
    }
    joined
  }

  private[queries] val centCache = annScopedCache()
  private[queries] def trainedCentroids(s: SparkSession, d: String): DataFrame =
    memoize(centCache, s, annMemoKey(d)) {
      annDir match {
        case Some(root) => annCentroids(s, root)
        case None =>
          // GRAFT_TRAIN_CAP (opt-in, probes only — the oracle unrolls
          // FULL-corpus training): cap the k-means training sample at
          // max(cap, k) hash-top vectors, the FAISS practice that keeps
          // large-k training O(cap*k) instead of O(N*k) per iteration
          val k = ivfK(s, d)
          val cap = sys.env.get("GRAFT_TRAIN_CAP").map(_.trim)
            .filter(_.nonEmpty).map(c => math.max(c.toIntOption
              .filter(_ > 0).getOrElse(throw new IllegalArgumentException(
                s"GRAFT_TRAIN_CAP must be a positive integer, got '$c'")), k))
          graft.engine.KMeans.train(s, emb(s, d), k, IvfIters, cap)
      }
    }

  /** IVF cell assignment (vec_id, emb, nrm, cell), memoized+cached:
    * q_ivf_search consumes it TWICE (query side + probe side) — uncached
    * the most expensive stage (N x k dot products + a window over the
    * corpus) would run twice per execution. */
  private[queries] val ivfCache = annScopedCache()
  private[queries] def ivfAssigned(s: SparkSession, d: String): DataFrame =
    memoize(ivfCache, s, annMemoKey(d)) {
      annDir match {
        case Some(root) => annAssigned(s, d, root)
        case None =>
          val e = emb(s, d)
          val cents = trainedCentroids(s, d)
            .select(col("cell"), col("c_emb"), col("c_nrm"))
          val w = Window.partitionBy("vec_id")
            .orderBy(desc("csim"), asc("cell"))
          e.join(broadcast(cents))
            .withColumn("csim",
              round(expr("graft_dot(emb, c_emb)") /
                (col("nrm") * col("c_nrm")), 4))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("vec_id"), col("emb"), col("nrm"), col("cell"))
      }
    }

  /** SRP-LSH geometry: 8 hyperplanes over the 64-dim embeddings. Each
    * component is md5-derived — `hex4(md5("p_j")) / 65535 - 0.5` — so the
    * oracle regenerates the identical planes in SQL while the Spark side
    * bakes them into the plan as literal arrays (computed here once on
    * the driver; 8 x 64 doubles, not data). */
  private[queries] val SrpPlanes = 8
  private[queries] def srpPlane(p: Int): Seq[Double] = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    (1 to 64).map { j =>
      val hex = mdi.digest(s"${p}_$j".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) / 65535.0 - 0.5
    }
  }

  /** Scored candidate pairs (d1 < d2, rounded jaccard) from the capped
    * shingle self-join — the most expensive subplan in the repo, shared
    * by q_dedup_ngram / q_dedup_groups / q_dedup_keep / q_split_groups /
    * q_dup_rate_source / q_fuzzy_verify. Memoized+cached per (session,
    * dir) like the shingle/centroid tables: a bench or dashboard run
    * executing the whole dedup family pays the self-join ONCE — the
    * pair table is tiny (O(candidates)), each query stays independently
    * correct, only the shared subplan's blocks are reused. */
  private[queries] val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[queries] def scoredPairs(s: SparkSession, d: String): DataFrame =
    memoize(pairCache, s, d) {
      val sh = cappedShingles(s, d)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      sh.as("a")
        .join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("jaccard",
          r4(col("inter") / (col("s1.n") + col("s2.n") - col("inter"))))
        .select(col("d1"), col("d2"), col("jaccard"))
    }

  /** embeddings widened to double with the L2 norm precomputed once per
    * vector (never per pair). `graft_dot` is the codegen'd expression
    * registered by GraftExtensions. */
  private[queries] def emb(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.ensureRegistered(s) // vanilla-session safety
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        col("label"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
  }

  /** Oracle-side mirror of `emb`: vectors as DOUBLE[] with norms
    * precomputed, so both engines evaluate dot/(nrm_a*nrm_b) with an
    * identical double-arithmetic structure. */
  private[queries] val embCte =
    """n AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS e,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)""".stripMargin

  /** Oracle-side mirror of [[trainedCentroids]]: the same deterministic
    * k-means unrolled as CTEs, yielding c(cell, ce, cn). dim=64 matches
    * the synthetic embeddings table. */
  private[queries] lazy val kmeansCte = graft.engine.KMeans.oracleCte(IvfK, IvfIters, 64)

  // ---- SimHash: 16-bit signature from the first 4 hex chars of
  // md5(token), generated as portable SQL arithmetic (instr/substr/div)
  // so Spark and DuckDB compute bit-identical signatures.
  private def simhashBitSums(intDiv: String): Seq[String] =
    (0 until 16).map { k =>
      val c = k / 4 + 1          // which hex char (1-based)
      val p = 1 << (3 - k % 4)   // which bit of that hex digit
      s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(h, $c, 1)) - 1) $intDiv $p) % 2 = 1 THEN 1 ELSE -1 END) AS b$k"
    }
  private val simhashCombine: String =
    (0 until 16).map(k => s"(CASE WHEN b$k >= 0 THEN 1 ELSE 0 END) * ${1 << k}")
      .mkString(" + ")

  private val enStopwords = Helpers.enStopwords

  // shared determinism helpers — single definition (and the WHY) in
  // Helpers.scala
  private def ntzSql(c: Column): Column = Helpers.ntz(c)
  private def r4(c: Column): Column = Helpers.r4(c)

  /** Shared oracle CTE: capped distinct 3-gram shingles per doc. */
  private[queries] val shingleCte =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh0 AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3),
       |freq AS (SELECT s, count(*) AS df FROM sh0 GROUP BY s),
       |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN freq ON sh0.s = freq.s
       |       WHERE df <= $MaxShingleDf)""".stripMargin

  /** Uncapped variant (MinHash hashes the full shingle set — min() is
    * robust to hot shingles, no cap needed). */
  private[queries] val shingleCteUncapped =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3)""".stripMargin

  val all: Seq[Q] = Seq(

    // ================= deduplication =================

    // exact dedup: canonical doc per identical text (hash-groupBy; at
    // scale this is one shuffle on a 128-bit text digest, not raw text)
    Q("q_dedup_exact",
      (s, d) => docs(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
             FROM documents GROUP BY text ORDER BY doc_id""")),

    // n-gram Jaccard near-dup: shuffle on (df-capped) shingle -> pair
    // intersection counts -> jaccard >= 0.8 on the rounded value
    Q("q_dedup_ngram",
      (s, d) => scoredPairs(s, d)
        .filter(col("jaccard") >= 0.8)
        .select("d1", "d2", "jaccard")
        .orderBy("d1", "d2"),
      Some(s"""WITH $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             pairs AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT d1, d2, floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 AS jaccard
             FROM pairs
             JOIN sizes s1 ON s1.doc_id = d1
             JOIN sizes s2 ON s2.doc_id = d2
             WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8
             ORDER BY d1, d2""")),

    // MinHash+LSH candidate pairs: 8 minhashes, 4 bands x 2 rows;
    // candidates = docs sharing any band signature. The join keys on
    // (band, signature) — the LSH bucket — so the pair blow-up is bounded
    // per bucket, never global.
    //
    // Hashing: ONE md5 per shingle; minhash j = min over shingles of hex
    // slice substr(h, 4j+1, 4). Each slice position selects its own argmin
    // shingle, so the 8 slices act as 8 independent 16-bit hash functions
    // at 1/8th the hashing cost of 8 salted md5 calls (this was the top
    // bench-time contributor in round 1). 16-bit minhashes admit ~1e-5
    // band-level false-positive collisions — fine for an LSH *candidate*
    // stage, whose output feeds exact verification by construction.
    Q("q_dedup_minhash",
      (s, d) => {
        // signature construction lives in functions/MinHashLsh.scala —
        // shared verbatim with the PERSISTED incremental index
        // (engine/DedupIndex.scala), which is what pins the scheme:
        // md5 projected before the groupBy (one hash per shingle), all 8
        // slice-minima in ONE map-side-combinable groupBy, bands derived
        // directly with no second aggregation
        // fanoutIfNarrow (r16): shingling + per-shingle md5 inside
        // signatures() is row-local CPU on the one-task scan; fanning
        // the input out parallelizes it without touching the shared
        // builder (the persisted DedupIndex path is unchanged)
        val bands = graft.functions.MinHashLsh.signatures(s,
          Helpers.fanoutIfNarrow(docs(s, d), col("doc_id")))
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
          .orderBy("d1", "d2")
      },
      Some(s"""WITH $shingleCteUncapped,
             hashed AS (SELECT doc_id, md5(s) AS h FROM sh),
             minsig AS (
               SELECT doc_id, j, min(substr(h, 4 * j + 1, 4)) AS mh
               FROM hashed, unnest(range(0, 8)) AS v(j)
               GROUP BY 1, 2),
             bands AS (
               SELECT doc_id, j // 2 AS band,
                      concat_ws('|', min(CASE WHEN j % 2 = 0 THEN mh END),
                                     min(CASE WHEN j % 2 = 1 THEN mh END)) AS bsig
               FROM minsig GROUP BY 1, 2)
             SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
             ORDER BY d1, d2""")),

    // SimHash 16-bit document signature (pair search over signatures is
    // covered in ScalaTest; the oracle locks the signature computation)
    Q("q_simhash",
      (s, d) => {
        // Spark side parses the 4 hex chars ONCE per token via conv()
        // (the oracle's per-digit arithmetic is the same value; DuckDB
        // has no conv). Bit k of the signature = bit (4*(3-k/4)+(3-k%4))
        // of that 16-bit value.
        val toks = docs(s, d).select(col("doc_id"),
          explode(Text.tokenSet(col("text"))).as("s"))
          .withColumn("v",
            conv(substring(md5(col("s").cast("binary")), 1, 4), 16, 10)
              .cast("int"))
        val sums = (0 until 16).map { k =>
          val bitPos = 4 * (3 - k / 4) + (3 - k % 4)
          sum(when(shiftright(col("v"), bitPos) % 2 === 1, 1).otherwise(-1))
            .as(s"b$k")
        }
        toks.groupBy("doc_id")
          .agg(sums.head, sums.tail: _*)
          .select(col("doc_id"), expr(simhashCombine).as("simhash"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
               SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS s
               FROM documents),
             hashed AS (SELECT doc_id, md5(s) AS h FROM toks),
             bits AS (
               SELECT doc_id, ${simhashBitSums("//").mkString(", ")}
               FROM hashed GROUP BY doc_id)
             SELECT doc_id, $simhashCombine AS simhash
             FROM bits ORDER BY doc_id""")),

    // SimHash near-dup PAIRS (Manku et al. 2007, public): the banded
    // form — split the 16-bit signature into two 8-bit bands, candidates
    // collide on (band, byte), verify by hamming distance bit_count(xor)
    // <= 3. Buckets are capped (the MaxShingleDf treatment: a byte value
    // hot across the corpus is a degenerate bucket — templated content —
    // and is dropped) so pair volume stays bounded; at production scale
    // the signature widens (64-bit, 16-bit bands) so the bucket space
    // grows with corpus diversity — same plan, wider key.
    Q("q_hamming_pairs",
      (s, d) => {
        val toks = docs(s, d).select(col("doc_id"),
          explode(Text.tokenSet(col("text"))).as("s"))
          .withColumn("v",
            conv(substring(md5(col("s").cast("binary")), 1, 4), 16, 10)
              .cast("int"))
        val sums = (0 until 16).map { k =>
          val bitPos = 4 * (3 - k / 4) + (3 - k % 4)
          sum(when(shiftright(col("v"), bitPos) % 2 === 1, 1).otherwise(-1))
            .as(s"b$k")
        }
        val sigs = toks.groupBy("doc_id")
          .agg(sums.head, sums.tail: _*)
          .select(col("doc_id"), expr(simhashCombine).as("sig"))
        val banded = sigs.select(col("doc_id"), col("sig"),
            explode(array(
              struct(lit(0).as("band"), (col("sig") % 256).as("bv")),
              struct(lit(1).as("band"), (col("sig") / 256).cast("int").as("bv"))
            )).as("b"))
          .select(col("doc_id"), col("sig"),
            col("b.band").as("band"), col("b.bv").as("bv"))
        val sized = banded.withColumn("bn",
            count(lit(1)).over(Window.partitionBy("band", "bv")))
          .filter(col("bn") <= HammingBucketCap)
        val l = sized.select(col("band"), col("bv"),
          col("doc_id").as("d1"), col("sig").as("s1"))
        val r = sized.select(col("band"), col("bv"),
          col("doc_id").as("d2"), col("sig").as("s2"))
        l.join(r, Seq("band", "bv")).filter(col("d1") < col("d2"))
          .withColumn("hamming", bit_count(expr("s1 ^ s2")).cast("int"))
          .filter(col("hamming") <= 3)
          .select("d1", "d2", "hamming").distinct()
          .orderBy("d1", "d2")
      },
      Some(s"""WITH toks AS (
               SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS s
               FROM documents),
             hashed AS (SELECT doc_id, md5(s) AS h FROM toks),
             bits AS (
               SELECT doc_id, ${simhashBitSums("//").mkString(", ")}
               FROM hashed GROUP BY doc_id),
             sigs AS (SELECT doc_id, $simhashCombine AS sig FROM bits),
             banded AS (
               SELECT doc_id, sig, 0 AS band, sig % 256 AS bv FROM sigs
               UNION ALL
               SELECT doc_id, sig, 1 AS band, sig // 256 AS bv FROM sigs),
             sized AS (
               SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, bv) AS bn
                              FROM banded) WHERE bn <= $HammingBucketCap),
             pairs AS (
               SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
               FROM sized a JOIN sized b
                 ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
               WHERE bit_count(xor(a.sig, b.sig)) <= 3)
             SELECT d1, d2, hamming FROM pairs ORDER BY d1, d2""")),

    // embedding-cosine near-dup with (label, IVF-cell) blocking:
    // candidates only within the same label AND trained IVF cell, exact
    // cosine verifies. The round-4 10x probe showed why label-only
    // blocking is a scale-killer: label cardinality is CONSTANT, so
    // within-label pairs — and with a low threshold the OUTPUT itself —
    // grow quadratically (measured t10/t1 = 46). Cell blocking applies
    // the IVF sizing rule: k grows with the corpus (k=10 matches this
    // synthetic scale), holding block sizes and per-block pair cost
    // constant — the same contract every IVF-blocked dedup ships with,
    // trading the cross-cell pair (recoverable via multi-probe,
    // q_ivf_probe2) for linear total work.
    Q("q_dedup_embed",
      (s, d) => {
        val cells = ivfAssigned(s, d).select("vec_id", "cell")
        val e = emb(s, d).join(cells, "vec_id")
        val a = e.select(col("vec_id").as("d1"), col("emb").as("e1"),
          col("nrm").as("n1"), col("label"), col("cell"))
        val b = e.select(col("vec_id").as("d2"), col("emb").as("e2"),
          col("nrm").as("n2"), col("label"), col("cell"))
        a.join(b, Seq("label", "cell"))
          .filter(col("d1") < col("d2"))
          .withColumn("sim",
            round(expr("graft_dot(e1, e2)") / (col("n1") * col("n2")), 4))
          .filter(col("sim") >= 0.4)
          .select("d1", "d2", "sim")
          .orderBy("d1", "d2")
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) + 0.0 AS sim
               FROM n CROSS JOIN c),
             asn AS (
               SELECT vec_id, cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, cell) AS rn FROM scored)
               WHERE rn = 1),
             m AS (SELECT n.vec_id, n.e, n.nrm, n.label, asn.cell
                   FROM n JOIN asn USING (vec_id))
             SELECT a.vec_id AS d1, b.vec_id AS d2,
               round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) + 0.0 AS sim
             FROM m a JOIN m b ON a.label = b.label AND a.cell = b.cell
               AND a.vec_id < b.vec_id
             WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.4
             ORDER BY d1, d2""")),

    // ================= similarity search =================

    // brute-force cosine top-10 for 5 query vectors: the query side is
    // broadcast (small by construction), the corpus side streams — the
    // correct baseline topology at any scale
    Q("q_cosine_topk",
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select("q_id", "vec_id", "sim")
          .orderBy(col("q_id"), desc("sim"), col("vec_id"))
      },
      Some(s"""WITH $embCte,
             q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
             scored AS (
               SELECT q_id, n.vec_id,
                 round(list_dot_product(qe, n.e) / (qn * n.nrm), 4) + 0.0 AS sim
               FROM q JOIN n ON n.vec_id <> q.q_id),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
               FROM scored)
             SELECT q_id, vec_id, sim FROM ranked WHERE rn <= 10
             ORDER BY q_id, sim DESC, vec_id""")),

    // LSH-bucketed ANN: sign bits of the first 4 dims = 16 axis-aligned
    // hyperplane buckets; search only within the query's bucket. The scale
    // path: shuffle keys on bucket, turning O(N*Q) into O(N*Q/16) with
    // co-partitioned joins.
    Q("q_ann_bucket",
      (s, d) => {
        val bucket: Column => Column = e =>
          (0 until 4).map(k =>
            when(element_at(e, k + 1) >= 0, lit(1 << k)).otherwise(lit(0)))
            .reduce(_ + _)
        val e = emb(s, d).withColumn("bucket", bucket(col("emb")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nrm").as("q_nrm"), col("bucket"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        e.join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id", "sim")
          .orderBy(col("q_id"), desc("sim"), col("vec_id"))
      },
      Some(s"""WITH $embCte,
             b AS (
               SELECT vec_id, e, nrm,
                 (CASE WHEN e[1] >= 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN e[2] >= 0 THEN 2 ELSE 0 END) +
                 (CASE WHEN e[3] >= 0 THEN 4 ELSE 0 END) +
                 (CASE WHEN e[4] >= 0 THEN 8 ELSE 0 END) AS bucket
               FROM n),
             q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, bucket FROM b WHERE vec_id < 5),
             scored AS (
               SELECT q_id, b.vec_id,
                 round(list_dot_product(qe, b.e) / (qn * b.nrm), 4) + 0.0 AS sim
               FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.q_id),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
               FROM scored)
             SELECT q_id, vec_id, sim FROM ranked WHERE rn <= 5
             ORDER BY q_id, sim DESC, vec_id""")),

    // Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009, the
    // standard hybrid-retrieval combiner): fuse the corpus's LEXICAL
    // ranking (shared BM25 arm, ExtendedQueries.bm25Scores) with its
    // SEMANTIC ranking (cosine vs the vec-0 query embedding; the
    // embeddings table indexes the leading document ids, so the fusion
    // key is doc_id = vec_id) as score = sum over arms of 1/(60+rank).
    // Determinism: each arm ranks its ROUNDED scores with an explicit
    // id tie-break, so ranks are cross-engine-identical integers; the
    // fused score is a FIXED-ORDER two-term sum of exact-input double
    // divisions, floor-rounded (rational → r4). Scale: each arm
    // reduces to a top-100 list via TakeOrderedAndProject (distributed
    // heap-k, never a global window over the corpus — row_number runs
    // AFTER the limit, over 100 rows); the fusion join is two 100-row
    // lists, broadcast-trivial at any corpus size.
    Q("q_rrf",
      (s, d) => {
        val e = emb(s, d)
        val qv = e.filter(col("vec_id") === 0)
          .select(col("emb").as("q_emb"), col("nrm").as("q_nrm"))
        val semTop = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .orderBy(desc("sim"), asc("vec_id")).limit(RrfDepth)
        val sem = semTop
          .withColumn("rs",
            row_number().over(Window.orderBy(desc("sim"), asc("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rs"))
        val lexTop = ExtendedQueries.bm25Scores(s, d)
          .orderBy(desc("bm25"), asc("doc_id")).limit(RrfDepth)
        val lex = lexTop
          .withColumn("rl",
            row_number().over(Window.orderBy(desc("bm25"), asc("doc_id"))))
          .select("doc_id", "rl")
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf", Helpers.r4(
            coalesce(lit(1.0) / (lit(RrfK) + col("rl")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(RrfK) + col("rs")), lit(0.0))))
          .select("doc_id", "rrf")
          .orderBy(desc("rrf"), asc("doc_id")).limit(20)
      },
      Some(s"""WITH $embCte,
             ${ExtendedQueries.bm25Cte},
             qv AS (SELECT e AS qe, nrm AS qn FROM n WHERE vec_id = 0),
             sem AS (SELECT n.vec_id,
                 round(list_dot_product(qe, n.e) / (qn * n.nrm), 4) + 0.0 AS sim
               FROM n CROSS JOIN qv WHERE n.vec_id <> 0),
             semr AS (SELECT vec_id AS doc_id, rs FROM (
                 SELECT vec_id,
                   row_number() OVER (ORDER BY sim DESC, vec_id) AS rs
                 FROM sem) WHERE rs <= $RrfDepth),
             lexr AS (SELECT doc_id, rl FROM (
                 SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rl
                 FROM bm) WHERE rl <= $RrfDepth)
             SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
               floor((coalesce(1.0::DOUBLE / ($RrfK + rl), 0.0::DOUBLE)
                    + coalesce(1.0::DOUBLE / ($RrfK + rs), 0.0::DOUBLE))
                 * 10000 + 0.5::DOUBLE) / 10000 AS rrf
             FROM lexr l FULL JOIN semr s ON l.doc_id = s.doc_id
             ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // IVF cell assignment: centroids come from deterministic k-means over
    // the corpus (engine/KMeans.scala; the oracle unrolls the SAME
    // algorithm as SQL CTEs — decimal-exact updates make it
    // cross-engine-reproducible). Every vector joins its nearest centroid
    // by rounded cosine — at scale the centroid table is always broadcast
    // (k << N) and the output is the partition key for IVF search.
    Q("q_ivf_assign",
      (s, d) => {
        // Rides the SHARED assignment table (ivfAssigned) instead of
        // re-running its own N x k argmax window: in-session the window
        // runs once (memoized, shared with the whole IVF family); under
        // GRAFT_ANN_DIR the cells come from the persisted index — the
        // r13 100x ANN probe measured the redundant window at 247 s
        // (ratio 661/two decades) vs O(N) here. `sim` is recomputed for
        // the ASSIGNED cell only (one broadcast join + one dot per
        // vector) with the identical r4 expression. For a FLAT-assigned
        // index (AnnIngest's default; the oracle path always) the
        // output is bit-equal to the window's rn=1 row. For a
        // hierarchically-assigned index (superProbes set) stored cells
        // can differ from the flat argmax near cell boundaries — the
        // query then reports the index's ACTUAL assignment and the
        // cosine to THAT cell (the operationally true readout: it
        // describes the cells search will probe), not the flat
        // maximum; AnnRegistryParitySpec pins both contracts.
        val cents = trainedCentroids(s, d)
          .select(col("cell"), col("c_emb"), col("c_nrm"))
        ivfAssigned(s, d)
          .join(broadcast(cents), Seq("cell"))
          .withColumn("sim",
            round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
          .select("vec_id", "cell", "sim")
          .orderBy("vec_id")
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) + 0.0 AS sim
               FROM n CROSS JOIN c),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
               FROM scored)
             SELECT vec_id, cell, sim FROM ranked WHERE rn = 1
             ORDER BY vec_id""")),

    // IVF probe-1 search: queries 100..104 scan ONLY their assigned cell
    // (vs q_cosine_topk's full scan) — the N/k cost shape of inverted-file
    // ANN; the join keys on cell, i.e. co-partitioned at scale.
    Q("q_ivf_search",
      (s, d) => {
        // memoized+cached (see ivfAssigned): consumed by BOTH the query
        // side and the probe side — the assignment stage runs once
        val assigned = ivfAssigned(s, d)
        val queries = assigned
          .filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nrm").as("q_nrm"), col("cell"))
        val wTop = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        assigned.join(broadcast(queries), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id", "sim")
          .orderBy(col("q_id"), desc("sim"), col("vec_id"))
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, n.e, n.nrm, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) AS csim
               FROM n CROSS JOIN c),
             assigned AS (
               SELECT vec_id, e, nrm, cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                 FROM scored) WHERE rn = 1),
             q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
                   FROM assigned WHERE vec_id >= 100 AND vec_id < 105),
             cand AS (
               SELECT q_id, a.vec_id,
                 round(list_dot_product(qe, a.e) / (qn * a.nrm), 4) + 0.0 AS sim
               FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.q_id),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
               FROM cand)
             SELECT q_id, vec_id, sim FROM ranked WHERE rn <= 5
             ORDER BY q_id, sim DESC, vec_id""")),

    // Multi-probe IVF search (engine/Ivf.search, probes=2): each query
    // scans its TWO nearest cells — the standard recall lever (FAISS
    // nprobe) when probe-1 recall is data-capped; still reads only
    // probes/k of the corpus. Probe list is a broadcast join against the
    // k-row centroid table; candidates join on cell (co-partitioned).
    Q("q_ivf_probe2",
      (s, d) => {
        val assigned = ivfAssigned(s, d)
        graft.engine.Ivf.search(s, assigned, trainedCentroids(s, d),
          col("vec_id") >= 100 && col("vec_id") < 105, probes = 2, k = 5)
          .orderBy(col("q_id"), desc("sim"), col("vec_id"))
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, n.e, n.nrm, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) AS csim
               FROM n CROSS JOIN c),
             assigned AS (
               SELECT vec_id, e, nrm, cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                 FROM scored) WHERE rn = 1),
             q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn
                   FROM assigned WHERE vec_id >= 100 AND vec_id < 105),
             probe AS (
               SELECT q_id, qe, qn, cell FROM (
                 SELECT q.q_id, q.qe, q.qn, c.cell,
                   row_number() OVER (PARTITION BY q.q_id ORDER BY
                     round(list_dot_product(qe, ce) / (qn * cn), 4) DESC, c.cell) AS pr
                 FROM q CROSS JOIN c) WHERE pr <= 2),
             cand AS (
               SELECT q_id, a.vec_id,
                 round(list_dot_product(qe, a.e) / (qn * a.nrm), 4) + 0.0 AS sim
               FROM probe p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.q_id),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
               FROM cand)
             SELECT q_id, vec_id, sim FROM ranked WHERE rn <= 5
             ORDER BY q_id, sim DESC, vec_id""")),

    // IVF index health profile: per-cell population and similarity-to-
    // centroid stats — the balance/tightness readout an ANN operator
    // watches to decide when to retrain (skewed cells = skewed probe
    // cost). One broadcast join (k centroids) + one groupBy on cell;
    // mean sim goes through DECIMAL(18,4) (sims are already 4-decimal
    // rationals, so the cast is exact and the sum order-independent)
    // and is floor-rounded like every rational score.
    Q("q_ivf_cells",
      (s, d) => {
        val cents = trainedCentroids(s, d)
          .select(col("cell"), col("c_emb"), col("c_nrm"))
        ivfAssigned(s, d)
          .join(broadcast(cents), Seq("cell"))
          .withColumn("sim",
            round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
          .groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"),
            r4(sum(col("sim").cast("decimal(18,4)")).cast("double") /
              count(lit(1))).as("mean_sim"),
            min("sim").as("min_sim"), max("sim").as("max_sim"))
          .orderBy("cell")
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) + 0.0 AS sim
               FROM n CROSS JOIN c),
             assigned AS (
               SELECT vec_id, cell, sim FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
                 FROM scored) WHERE rn = 1)
             SELECT cell, count(*) AS n_vecs,
               floor((CAST(SUM(CAST(sim AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 10000 + 0.5::DOUBLE) / 10000 AS mean_sim,
               min(sim) AS min_sim, max(sim) AS max_sim
             FROM assigned GROUP BY cell ORDER BY cell""")),

    // Simplified silhouette (centroid-based, Hruschka et al. — the
    // O(N·k) production form of the O(N²) silhouette): per vector,
    // a = cosine distance to its OWN centroid (the argmax cell), b =
    // distance to the SECOND-best centroid; with argmax assignment
    // a ≤ b always, so s = (b−a)/b = (sim1−sim2)/(1−sim2) ∈ [0, 1] —
    // the clustering-quality audit that complements cellHealth as the
    // retrain trigger (a cell whose members score near 0 sits between
    // centroids; the quantizer is stale). Same broadcast-k scoring
    // pass as the assignment itself (row-local, codegen'd graft_dot);
    // sims r4-rounded BEFORE comparison (assignment-identical
    // determinism, ties cell asc), the rational score r4-floored, the
    // per-cell mean summed through DECIMAL.
    Q("q_silhouette",
      (s, d) => {
        val cents = trainedCentroids(s, d)
          .select(col("cell"), col("c_emb"), col("c_nrm"))
        // The N x k scoring against ALL centroids is the semantic cost
        // of exact top-2 (the second-best cell can be anywhere) — but
        // the corpus can arrive as ONE parquet split, which would put
        // every dot product on a single task (the q_cdc_chunk disease;
        // the r13 100x ANN probe measured 268 s single-task vs ~9 s
        // rebalanced). The shuffle to core width is CONDITIONAL on the
        // observed scan width (Helpers.rebalanceIfNarrow, VERDICT r13
        // #2): a one-split scan pays one even pass over the vectors; a
        // scan already at core width (production's thousands of
        // splits) skips the rebalance entirely.
        val sims = Helpers.rebalanceIfNarrow(emb(s, d))
          .crossJoin(broadcast(cents))
          .withColumn("sim",
            round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
        val w = Window.partitionBy("vec_id")
          .orderBy(desc("sim"), asc("cell"))
        val pv = sims.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy("vec_id")
          .agg(max(when(col("rn") === 1, col("sim"))).as("s1"),
            max(when(col("rn") === 1, col("cell"))).as("cell"),
            max(when(col("rn") === 2, col("sim"))).as("s2"))
          .withColumn("sil", when(col("s2") >= 1.0, lit(0.0))
            .otherwise(r4((col("s1") - col("s2")) /
              (lit(1.0) - col("s2")))))
        pv.groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"),
            r4(sum(col("sil").cast("decimal(18,4)")).cast("double") /
              count(lit(1))).as("mean_sil"),
            min("sil").as("min_sil"))
          .orderBy("cell")
      },
      Some(s"""WITH $embCte,
             $kmeansCte,
             scored AS (
               SELECT n.vec_id, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) + 0.0 AS sim
               FROM n CROSS JOIN c),
             rk AS (SELECT vec_id, cell, sim,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, cell) AS rn
               FROM scored),
             pv AS (SELECT vec_id,
                 max(CASE WHEN rn = 1 THEN sim END) AS s1,
                 max(CASE WHEN rn = 1 THEN cell END) AS cell,
                 max(CASE WHEN rn = 2 THEN sim END) AS s2
               FROM rk WHERE rn <= 2 GROUP BY 1),
             sil AS (SELECT cell,
                 CASE WHEN s2 >= 1.0 THEN 0.0
                   ELSE floor((s1 - s2) / (1.0::DOUBLE - s2)
                     * 10000 + 0.5::DOUBLE) / 10000 END AS sil
               FROM pv)
             SELECT cell, count(*) AS n_vecs,
               floor((CAST(sum(CAST(sil AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*)) * 10000 + 0.5::DOUBLE) / 10000 AS mean_sil,
               min(sil) AS min_sil
             FROM sil GROUP BY cell ORDER BY cell""")),

    // SRP-LSH bucketing (Charikar STOC'02 sign-random-projection): the
    // EMBEDDING-side locality hash complementing the text-side MinHash —
    // 8 deterministic hyperplanes (md5-derived components, recomputed
    // identically as oracle SQL), signature bit p = sign(dot(e, h_p)),
    // bucket = the 8-bit signature; output is the bucket occupancy
    // profile. Everything is ROW-LOCAL until one groupBy on bucket: the
    // hyperplanes are 8 x 64 literal doubles baked into the plan (the
    // codegen'd graft_dot runs against constant arrays), so at 100 TB
    // the signature costs one map pass — co-bucket candidate joins then
    // key on bucket exactly like q_ann_bucket. Dots are rationals (no
    // norms), so the sign reads the r4 floor-round on both engines.
    Q("q_srp_bucket",
      (s, d) => {
        val e = emb(s, d)
        val withBits = (0 until SrpPlanes).foldLeft(e) { (df, p) =>
          val hp = array(srpPlane(p).map(lit): _*)
          df.withColumn(s"b$p",
            when(r4(call_function("graft_dot", col("emb"), hp)) >= 0,
              lit(1 << p)).otherwise(lit(0)))
        }
        withBits
          .withColumn("bucket",
            (0 until SrpPlanes).map(p => col(s"b$p")).reduce(_ + _).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"))
          .orderBy("bucket")
      },
      Some(s"""WITH n AS (
               SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             planes AS (
               SELECT p.p, j.j,
                 ${Helpers.hex4("md5(p.p::VARCHAR || '_' || j.j::VARCHAR)")}::DOUBLE / 65535.0 - 0.5 AS hv
               FROM range(0, $SrpPlanes) p(p) CROSS JOIN range(1, 65) j(j)),
             pl AS (SELECT p, list(hv ORDER BY j) AS hp FROM planes GROUP BY p),
             bits AS (
               SELECT n.vec_id, pl.p,
                 CASE WHEN floor(list_dot_product(n.e, pl.hp) * 10000 + 0.5::DOUBLE) / 10000 >= 0
                      THEN (1 << p) ELSE 0 END AS bit
               FROM n CROSS JOIN pl),
             b AS (SELECT vec_id, SUM(bit)::BIGINT AS bucket FROM bits GROUP BY vec_id)
             SELECT bucket, count(*) AS n_vecs FROM b GROUP BY 1 ORDER BY 1""")),

    // Banded SRP-LSH ANN search: 4 hash tables x 4 hyperplanes (the
    // sign-random-projection analogue of MinHash banding) — a query's
    // candidates are the vectors sharing ANY table's 4-bit bucket,
    // deduped, then cosine-ranked. Each table is a cheap row-local
    // signature; the candidate join keys on (table, bucket) — ~23% of
    // the corpus scanned per query here vs q_cosine_topk's 100%, and
    // co-partitionable at scale. DISTINCT-then-score keeps the scoring
    // pass per unique candidate, not per colliding table.
    Q("q_srp_ann",
      (s, d) => {
        val e = emb(s, d)
        val withBuckets = (0 until 4).foldLeft(e) { (df, t) =>
          df.withColumn(s"t$t",
            (0 until 4).map { p =>
              val hp = array(srpPlane(t * 4 + p).map(lit): _*)
              when(r4(call_function("graft_dot", col("emb"), hp)) >= 0,
                lit(1 << p)).otherwise(lit(0))
            }.reduce(_ + _).cast("long"))
        }
        val tabs = withBuckets.selectExpr("vec_id", "emb", "nrm",
          "stack(4, 0L, t0, 1L, t1, 2L, t2, 3L, t3) AS (t, bucket)")
        val qs = tabs.filter(col("vec_id") >= 100 && col("vec_id") < 105)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nrm").as("q_nrm"), col("t"), col("bucket"))
        val wTop = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        tabs.join(broadcast(qs), Seq("t", "bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .dropDuplicates("q_id", "vec_id")
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id", "sim")
          .orderBy(col("q_id"), desc("sim"), col("vec_id"))
      },
      Some(s"""WITH $embCte,
             planes AS (
               SELECT p.p, j.j,
                 ${Helpers.hex4("md5(p.p::VARCHAR || '_' || j.j::VARCHAR)")}::DOUBLE / 65535.0 - 0.5 AS hv
               FROM range(0, 16) p(p) CROSS JOIN range(1, 65) j(j)),
             pl AS (SELECT p, list(hv ORDER BY j) AS hp FROM planes GROUP BY p),
             bits AS (
               SELECT n.vec_id, pl.p // 4 AS t,
                 CASE WHEN floor(list_dot_product(n.e, pl.hp) * 10000 + 0.5::DOUBLE) / 10000 >= 0
                      THEN (1 << (pl.p % 4)) ELSE 0 END AS bit
               FROM n CROSS JOIN pl),
             bk AS (SELECT vec_id, t, SUM(bit)::BIGINT AS bucket FROM bits GROUP BY vec_id, t),
             q AS (SELECT vec_id AS q_id, t, bucket FROM bk
                   WHERE vec_id >= 100 AND vec_id < 105),
             cand AS (
               SELECT DISTINCT q.q_id, v.vec_id
               FROM q JOIN bk v ON q.t = v.t AND q.bucket = v.bucket AND v.vec_id <> q.q_id),
             scored AS (
               SELECT c.q_id, c.vec_id,
                 round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) + 0.0 AS sim
               FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.vec_id),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
               FROM scored)
             SELECT q_id, vec_id, sim FROM ranked WHERE rn <= 5
             ORDER BY q_id, sim DESC, vec_id""")),

    // Per-source duplication-rate dashboard: the corpus-QA readout that
    // tells you WHICH crawl source is spamming near-duplicates — share
    // of each source's docs that are non-canonical members of a near-dup
    // group (vertex != component label). Reuses the shared pair/CC
    // machinery; the dup set is O(corpus x dup-rate) so the join onto
    // documents is an unhinted shuffle join on doc_id (AQE broadcasts
    // it at runtime while genuinely small), then one groupBy.
    Q("q_dup_rate_source",
      (s, d) => {
        val edges = scoredPairs(s, d)
          .filter(col("jaccard") >= 0.8)
          .select(col("d1"), col("d2"))
        val dups = graft.engine.Graph.connectedComponents(s, edges)
          .filter(col("vertex") =!= col("component"))
          .select(col("vertex").as("doc_id"), lit(1).as("is_dup"))
        Tables.documents(s, d)
          .join(dups, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("is_dup"), lit(0))).cast("long").as("n_dups"))
          .withColumn("dup_rate", r4(col("n_dups") / col("n_docs")))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             p0 AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             pairs AS (
               SELECT d1, d2 FROM p0
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2
               WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8),
             edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
             reach(doc_id, lbl) AS (
               SELECT d1, d1 FROM edges
               UNION
               SELECT e.d2, r.lbl FROM reach r JOIN edges e ON e.d1 = r.doc_id),
             groups AS (
               SELECT doc_id, min(lbl) AS group_id FROM reach GROUP BY doc_id),
             dups AS (SELECT doc_id, 1 AS is_dup FROM groups WHERE doc_id <> group_id)
             SELECT d.source, count(*) AS n_docs,
               SUM(COALESCE(dups.is_dup, 0))::BIGINT AS n_dups,
               floor(SUM(COALESCE(dups.is_dup, 0))::DOUBLE / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS dup_rate
             FROM documents d LEFT JOIN dups ON d.doc_id = dups.doc_id
             GROUP BY d.source ORDER BY d.source""")),

    // Embedding-norm health stats per label: the vector-pipeline QA
    // readout (zero/degenerate vectors, scale drift between label
    // cohorts). Norms round to 4 (irrational sqrt mantissa, plain
    // round), means through DECIMAL(18,4) of the rounded values (exact,
    // order-independent) then the rational mean floor-rounds via r4.
    Q("q_emb_stats",
      (s, d) => {
        emb(s, d)
          .withColumn("nr", round(col("nrm"), 4))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            r4(sum(col("nr").cast("decimal(18,4)")).cast("double") /
              count(lit(1))).as("mean_norm"),
            min("nr").as("min_norm"), max("nr").as("max_norm"))
          .orderBy("label")
      },
      Some(s"""WITH $embCte
             SELECT label, count(*) AS n_vecs,
               floor(CAST(SUM(CAST(round(nrm, 4) AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS mean_norm,
               min(round(nrm, 4)) AS min_norm, max(round(nrm, 4)) AS max_norm
             FROM n GROUP BY label ORDER BY label""")),

    // Per-source embedding-centroid similarity matrix: how semantically
    // close each pair of sources is — the embedding-space counterpart
    // of q_source_overlap's vocabulary view, and the audit that catches
    // a source drifting into (or duplicating) another's topic space
    // before document-level dedup would. Determinism: a centroid is a
    // cross-row float mean — the one shape the embedding family
    // otherwise avoids — so each dimension is first quantized to exact
    // integer micro-units (floor(v*1e6+0.5), the r4 rule at 1e-6
    // granularity, bit-identical in both engines) and summed as LONGs
    // (order-independent, exact); the per-source counts then CANCEL in
    // the cosine, so centroids are never materialized as floats at all
    // — the cosine runs directly on the integer sum vectors via the
    // same fixed-order dot both engines already agree on (the
    // q_cosine_topk precedent), r4-rounded. Scale: one keyed doc↔vec
    // join, a posexplode into (source, dim) partial sums — map-side
    // combinable down to |sources|*64 rows at any corpus size — and an
    // |sources|² pairwise join over a broadcast-trivial table.
    Q("q_centroid_sim",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source")
        val vecs = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        val sums = docs.join(vecs, col("doc_id") === col("vec_id"))
          .select(col("source"), posexplode(col("e")).as(Seq("dim0", "v")))
          .withColumn("qv", floor(col("v") * 1000000 + lit(0.5)).cast("long"))
          .groupBy(col("source"), (col("dim0") + 1).as("dim"))
          .agg(sum("qv").as("sv"))
        val cent = sums.groupBy("source")
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("sv")))),
            x => x.getField("sv").cast("double")).as("vec"))
        cent.as("a").join(cent.as("b"), col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
            Helpers.r4(expr("graft_dot(a.vec, b.vec)") /
              (sqrt(expr("graft_dot(a.vec, a.vec)")) *
                sqrt(expr("graft_dot(b.vec, b.vec)")))).as("cos_sim"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH j AS (
               SELECT d.source, e.embedding AS emb
               FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             u AS (
               SELECT source,
                 generate_subscripts(emb, 1) AS dim,
                 CAST(floor(unnest(emb)::DOUBLE * 1000000 + 0.5::DOUBLE)
                   AS BIGINT) AS qv
               FROM j),
             sums AS (
               SELECT source, dim, CAST(sum(qv) AS BIGINT) AS sv
               FROM u GROUP BY 1, 2),
             v AS (
               SELECT source,
                 list(sv::DOUBLE ORDER BY dim) AS vec
               FROM sums GROUP BY 1)
             SELECT a.source AS src_a, b.source AS src_b,
               floor(list_dot_product(a.vec, b.vec)
                 / (sqrt(list_dot_product(a.vec, a.vec))
                   * sqrt(list_dot_product(b.vec, b.vec)))
                 * 10000 + 0.5::DOUBLE) / 10000 AS cos_sim
             FROM v a JOIN v b ON a.source < b.source
             ORDER BY src_a, src_b""")),

    // Within-source semantic cohesion — q_centroid_sim's complement:
    // mean cosine of each source's documents to their own centroid.
    // Low cohesion = a scattered/mixed source (or junk embeddings);
    // together the pair answers "is each source focused, and are any
    // two sources the same topic". Determinism: the centroid rides the
    // same exact integer-sum representation (scale cancels in the
    // cosine, so the un-divided sum vector IS the centroid direction);
    // each per-doc cosine is a fixed-order dot of exact inputs, plain
    // round (irrational); the per-source MEAN of rounded cosines goes
    // through DECIMAL(18,4) (order-independent — the q_emb_stats
    // precedent) with one final r4 division. Scale: centroid sums as
    // in q_centroid_sim; the scoring pass is one broadcast join
    // (|sources| rows) + a row-local dot + a map-side-combinable
    // per-source mean. Each doc counts toward its own centroid
    // (the SemDeDup cluster-cohesion convention).
    Q("q_source_cohesion",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source")
        val vecs = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        val j = docs.join(vecs, col("doc_id") === col("vec_id"))
          .select("source", "e")
        val cent = j
          .select(col("source"), posexplode(col("e")).as(Seq("dim0", "v")))
          .withColumn("qv", floor(col("v") * 1000000 + lit(0.5)).cast("long"))
          .groupBy("source", "dim0").agg(sum("qv").as("sv"))
          .groupBy("source")
          .agg(transform(
            array_sort(collect_list(struct(col("dim0"), col("sv")))),
            x => x.getField("sv").cast("double")).as("cent"))
        j.join(broadcast(cent), "source")
          .withColumn("cos_i",
            round(expr("graft_dot(e, cent)") /
              (sqrt(expr("graft_dot(e, e)")) *
                sqrt(expr("graft_dot(cent, cent)"))), 4))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            Helpers.r4(sum(col("cos_i").cast("decimal(18,4)")).cast("double") /
              count(lit(1))).as("cohesion"))
          .orderBy("source")
      },
      Some("""WITH j AS (
               SELECT d.source, e.embedding::DOUBLE[] AS e
               FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             u AS (
               SELECT source, generate_subscripts(e, 1) AS dim,
                 CAST(floor(unnest(e) * 1000000 + 0.5::DOUBLE) AS BIGINT) AS qv
               FROM j),
             sums AS (
               SELECT source, dim, CAST(sum(qv) AS BIGINT) AS sv
               FROM u GROUP BY 1, 2),
             v AS (
               SELECT source, list(sv::DOUBLE ORDER BY dim) AS cent
               FROM sums GROUP BY 1),
             c AS (
               SELECT j.source,
                 round(list_dot_product(j.e, v.cent)
                   / (sqrt(list_dot_product(j.e, j.e))
                     * sqrt(list_dot_product(v.cent, v.cent))), 4) + 0.0 AS cos_i
               FROM j JOIN v ON j.source = v.source)
             SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               floor(CAST(SUM(CAST(cos_i AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS cohesion
             FROM c GROUP BY source ORDER BY source""")),

    // Contamination-safe train/test split: documents are split by the
    // hash of their NEAR-DUP GROUP, not their own id — near-duplicates
    // can never straddle the boundary, the leak q_train_split's
    // per-document hash cannot prevent (a test doc's near-copy in train
    // IS contamination). Composition of the CC group labeling with the
    // per-row hash split: the only additions over q_dedup_groups are a
    // left join back to documents (singletons group as themselves) and
    // the row-local hash test.
    Q("q_split_groups",
      (s, d) => {
        val edges = scoredPairs(s, d)
          .filter(col("jaccard") >= 0.8)
          .select(col("d1"), col("d2"))
        val cc = graft.engine.Graph.connectedComponents(s, edges)
          .select(col("vertex").as("doc_id"), col("component"))
        Tables.documents(s, d)
          .join(cc, Seq("doc_id"), "left")
          .withColumn("group_id", coalesce(col("component"), col("doc_id")))
          .withColumn("split",
            when(Helpers.hash16(col("group_id")) % 10 < 9, "train")
              .otherwise("test"))
          .select("doc_id", "group_id", "split")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             p0 AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             pairs AS (
               SELECT d1, d2 FROM p0
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2
               WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8),
             edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
             reach(doc_id, lbl) AS (
               SELECT d1, d1 FROM edges
               UNION
               SELECT e.d2, r.lbl FROM reach r JOIN edges e ON e.d1 = r.doc_id),
             groups AS (
               SELECT doc_id, min(lbl) AS group_id FROM reach GROUP BY doc_id),
             lbl AS (
               SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id
               FROM documents d LEFT JOIN groups g ON d.doc_id = g.doc_id)
             SELECT doc_id, group_id,
               CASE WHEN ${Helpers.hex4("md5(group_id::VARCHAR)")} % 10 < 9
                    THEN 'train' ELSE 'test' END AS split
             FROM lbl ORDER BY doc_id""")),

    // near-dup groups: connected components over the jaccard>=0.8 pair
    // graph, labeled by the component's min doc_id. Spark side: iterative
    // min-label propagation (the components here are tiny chains; a
    // 100 TB corpus would use the large-star/small-star variant, same
    // shuffle-on-vertex topology per round). Oracle: recursive CTE
    // transitive closure.
    Q("q_dedup_groups",
      (s, d) => {
        val edges = scoredPairs(s, d) // one cached pair table, shared 3x
          .filter(col("jaccard") >= 0.8)
          .select(col("d1"), col("d2"))
        graft.engine.Graph.connectedComponents(s, edges)
          .select(col("vertex").as("doc_id"), col("component").as("group_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             p0 AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             pairs AS (
               SELECT d1, d2 FROM p0
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2
               WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8),
             edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
             reach(doc_id, lbl) AS (
               SELECT d1, d1 FROM edges
               UNION
               SELECT e.d2, r.lbl FROM reach r JOIN edges e ON e.d1 = r.doc_id)
             SELECT doc_id, min(lbl) AS group_id FROM reach
             GROUP BY doc_id ORDER BY doc_id""")),

    // Duplication profile: the histogram of near-dup cluster sizes —
    // how much of the corpus sits in pairs vs larger dup cliques, the
    // one-page readout a dedup policy is tuned against (a long tail of
    // big clusters means template spam; mostly pairs means organic
    // duplication). Singletons (docs in no cluster) are reported as
    // size-1 clusters via exact count arithmetic, never a driver-side
    // scalar. Integer-only — nothing to round. Scale: rides the same
    // memoized pair table + CC labeling as q_dedup_groups, then two
    // map-side-combinable aggregations down to a handful of rows.
    Q("q_dup_cluster_hist",
      (s, d) => {
        val edges = scoredPairs(s, d)
          .filter(col("jaccard") >= 0.8)
          .select(col("d1"), col("d2"))
        val ks = graft.engine.Graph.connectedComponents(s, edges)
          .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        val hist = ks.groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"))
        val tot = Tables.documents(s, d).agg(count(lit(1)).as("n_total"))
        val grouped = ks.agg(
          coalesce(sum("cluster_size"), lit(0L)).as("n_grouped"))
        val singles = tot.crossJoin(grouped)
          .select(lit(1L).as("cluster_size"),
            (col("n_total") - col("n_grouped")).as("n_clusters"))
        hist.select("cluster_size", "n_clusters")
          .union(singles)
          .filter(col("n_clusters") > 0)
          .orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             p0 AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             prs AS (
               SELECT d1, d2 FROM p0
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2
               WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8),
             edges AS (SELECT d1, d2 FROM prs UNION ALL SELECT d2, d1 FROM prs),
             reach(doc_id, lbl) AS (
               SELECT d1, d1 FROM edges
               UNION
               SELECT e.d2, r.lbl FROM reach r JOIN edges e ON e.d1 = r.doc_id),
             comp AS (SELECT doc_id, min(lbl) AS group_id FROM reach
               GROUP BY doc_id),
             ks AS (SELECT group_id, CAST(count(*) AS BIGINT) AS cluster_size
               FROM comp GROUP BY 1),
             hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
               FROM ks GROUP BY 1),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
             ingrp AS (SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT)
               AS n_grouped FROM ks),
             singles AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
               (n_total - n_grouped) AS n_clusters
               FROM tot CROSS JOIN ingrp)
             SELECT cluster_size, n_clusters FROM
               (SELECT * FROM hist UNION ALL SELECT * FROM singles)
             WHERE n_clusters > 0 ORDER BY cluster_size""")),

    // as-of join (engine/AsOf.scala): each click joined to the user's
    // most recent purchase at-or-before it; DuckDB's native ASOF JOIN is
    // the oracle. Right side pre-deduplicated per (user, ts) so the
    // match is unambiguous in both engines.
    Q("q_asof_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("p_ts"))
          .agg(max("event_id").as("p_event_id"))
        graft.engine.AsOf.asofJoin(clicks, purchases,
          "user_id", "ts", "p_ts", Seq("p_event_id", "p_ts"))
          .select(col("event_id"), col("user_id"),
            col("p_event_id"), ntzSql(col("p_ts")).as("p_ts"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
               SELECT user_id, ts AS p_ts, max(event_id) AS p_event_id
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             c AS (
               SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
             SELECT c.event_id, c.user_id, p.p_event_id, p.p_ts
             FROM c ASOF LEFT JOIN p
               ON c.user_id = p.user_id AND c.ts >= p.p_ts
             ORDER BY c.event_id""")),

    // ================= text analysis =================

    // per-document stats: token counts, distinct ratio (U1-analog surface)
    Q("q_text_stats",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          length(col("text")).as("len"),
          size(Text.tokens(col("text"))).as("n_tokens"),
          size(Text.tokenSet(col("text"))).as("n_distinct"))
        .withColumn("distinct_ratio",
          r4(col("n_distinct") / col("n_tokens")))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, length(text) AS len,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               floor(len(list_distinct(string_split(text, ' ')))::DOUBLE /
                     len(string_split(text, ' ')) * 10000 + 0.5::DOUBLE) / 10000 AS distinct_ratio
             FROM documents ORDER BY doc_id""")),

    // per-document word-distribution Shannon entropy: the standard
    // low-diversity filter (templated/repetitive text scores low). One
    // explode + two map-side-combinable groupBys — shuffle keyed on
    // (doc_id, word) then doc_id, both bounded by the corpus's token
    // count, so the plan is one linear pass at any scale.
    Q("q_entropy",
      (s, d) => {
        val cnt = docs(s, d)
          .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("doc_id").agg(sum("c").as("n"))
        cnt.join(tot, "doc_id")
          .groupBy("doc_id")
          .agg(r4(-sum((col("c") / col("n")) * log(col("c") / col("n"))))
            .as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
             c AS (SELECT doc_id, w, count(*)::DOUBLE AS c
                   FROM t GROUP BY 1, 2),
             n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
             SELECT c.doc_id,
               floor(-sum((c.c / n.n) * ln(c.c / n.n)) * 10000 + 0.5::DOUBLE) / 10000 AS entropy
             FROM c JOIN n ON c.doc_id = n.doc_id
             GROUP BY c.doc_id ORDER BY c.doc_id""")),

    // edit-distance verification of n-gram candidates: the exact-verify
    // stage a fuzzy dedup pipeline runs AFTER candidate generation —
    // per-pair cost is O(prefix^2) on the 512-char prefix and the pair
    // count is bounded by the df-capped shingle join, so verification
    // stays linear in candidates at any corpus size (never all-pairs).
    Q("q_fuzzy_verify",
      (s, d) => {
        val cand = scoredPairs(s, d).filter(col("jaccard") >= 0.5)
        val pre = docs(s, d).select(col("doc_id"),
          substring(col("text"), 1, 512).as("p"))
        cand
          .join(pre.select(col("doc_id").as("d1"), col("p").as("p1")), "d1")
          .join(pre.select(col("doc_id").as("d2"), col("p").as("p2")), "d2")
          .withColumn("edit_dist", levenshtein(col("p1"), col("p2")))
          .select(col("d1"), col("d2"), col("jaccard"), col("edit_dist"),
            r4(lit(1.0) - col("edit_dist") /
              greatest(length(col("p1")), length(col("p2"))))
              .as("edit_sim"))
          .orderBy("d1", "d2")
      },
      Some(s"""WITH $shingleCte,
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             pairs AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             cand AS (
               SELECT d1, d2,
                 floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 AS jaccard
               FROM pairs
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2),
             pre AS (SELECT doc_id, substr(text, 1, 512) AS p FROM documents)
             SELECT c.d1, c.d2, c.jaccard,
               levenshtein(a.p, b.p) AS edit_dist,
               floor((1.0 - levenshtein(a.p, b.p)::DOUBLE /
                 greatest(length(a.p), length(b.p))) * 10000 + 0.5::DOUBLE) / 10000 AS edit_sim
             FROM cand c
             JOIN pre a ON a.doc_id = c.d1
             JOIN pre b ON b.doc_id = c.d2
             WHERE c.jaccard >= 0.5
             ORDER BY c.d1, c.d2""")),

    // language-ID heuristic: English stopword density
    Q("q_lang_id",
      (s, d) => docs(s, d)
        .withColumn("en_hits",
          expr(s"size(filter(split(text, ' '), x -> x IN $enStopwords))"))
        .withColumn("n_tokens", size(Text.tokens(col("text"))))
        .withColumn("en_ratio", r4(col("en_hits") / col("n_tokens")))
        .select(col("doc_id"), col("en_ratio"),
          when(col("en_hits") / col("n_tokens") >= 0.1, "en")
            .otherwise("other").as("pred_lang"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
               SELECT doc_id,
                 len(list_filter(string_split(text, ' '), x -> x IN $enStopwords)) AS en_hits,
                 len(string_split(text, ' ')) AS n_tokens
               FROM documents)
             SELECT doc_id, floor(en_hits::DOUBLE / n_tokens * 10000 + 0.5::DOUBLE) / 10000 AS en_ratio,
               CASE WHEN en_hits::DOUBLE / n_tokens >= 0.1 THEN 'en' ELSE 'other' END AS pred_lang
             FROM t ORDER BY doc_id""")),

    // quality score: length saturation + lexical diversity + stopword mix
    Q("q_quality_score",
      (s, d) => docs(s, d)
        .withColumn("n_tokens", size(Text.tokens(col("text"))))
        .withColumn("n_distinct", size(Text.tokenSet(col("text"))))
        .withColumn("stop_hits",
          expr(s"size(filter(split(text, ' '), x -> x IN $enStopwords))"))
        .withColumn("score", r4(
          lit(0.5) * least(col("n_tokens") / 40.0, lit(1.0)) +
            lit(0.3) * (col("n_distinct") / col("n_tokens")) +
            lit(0.2) * least(lit(10.0) * col("stop_hits") / col("n_tokens"), lit(1.0))))
        .select(col("doc_id"), col("score"),
          when(col("score") >= 0.7, "high")
            .when(col("score") >= 0.5, "mid")
            .otherwise("low").as("tier"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
               SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) AS n_distinct,
                 len(list_filter(string_split(text, ' '), x -> x IN $enStopwords)) AS stop_hits
               FROM documents),
             sc AS (
               SELECT doc_id,
                 floor((0.5::DOUBLE * least(n_tokens / 40.0::DOUBLE, 1.0::DOUBLE) +
                       0.3::DOUBLE * (n_distinct::DOUBLE / n_tokens) +
                       0.2::DOUBLE * least(10.0::DOUBLE * stop_hits / n_tokens, 1.0::DOUBLE)) * 10000 + 0.5::DOUBLE) / 10000 AS score
               FROM t)
             SELECT doc_id, score,
               CASE WHEN score >= 0.7 THEN 'high'
                    WHEN score >= 0.5 THEN 'mid' ELSE 'low' END AS tier
             FROM sc ORDER BY doc_id""")),

    // token counting: whitespace + BPE-ish regex segmentation
    Q("q_token_count",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).as("n_ws"),
          size(regexp_extract_all(col("text"),
            // explicit whitespace class, NOT \s: Java regex counts
            // vertical tab (U+000B) as \s, RE2 (DuckDB) does not —
            // the engines would tokenize VT-bearing text differently
            lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"), lit(0))).as("n_bpe"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]')) AS n_bpe
             FROM documents ORDER BY doc_id""")),

    // multimodal plumbing: opaque binary payload + typed metadata; the
    // oracle checks the byte-level schema survives (octet parity). The
    // decode/feature path is exercised in ScalaTest (MultimodalSpec) —
    // the stub decoder is not SQL-expressible.
    Q("q_media_meta",
      (s, d) => graft.engine.Multimodal
        .fromBinary(docs(s, d), "doc_id", "text", "text")
        .select(col("media_id"), length(col("payload")).as("n_bytes"),
          col("meta.kind").as("kind"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
               'text' AS kind
             FROM documents ORDER BY media_id""")),

    // document fingerprint: md5 of normalized text (rolling-hash analog
    // with a cross-engine-stable hash)
    Q("q_fingerprint",
      (s, d) => docs(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
             FROM documents ORDER BY doc_id""")),

    // Exact duplicate-SPAN removal — the Lee et al. ("Deduplicating
    // Training Data Makes Language Models Better") operation at 8-word
    // granularity: every 8-token span whose hash occurs in 2+ documents
    // is masked from ALL of them, and the cleaned text is
    // fingerprinted. This removes boilerplate shared across documents
    // (headers, license blocks, templates) that document-level dedup
    // keeps. Scale shape: positions are row-local (one explode per
    // token), the only shuffles are the span-hash groupBy (shared-span
    // detection), the keyed join back on hash, and the (doc, position)
    // anti-join — every join key is content-derived and unbounded in
    // cardinality, so nothing degenerates as the corpus grows (8-word
    // spans are near-unique unless genuinely duplicated). Docs shorter
    // than the span width pass through untouched; a fully-masked doc
    // keeps n_tokens with n_kept = 0 and the empty-string hash (both
    // engines agree on md5('')).
    Q("q_span_clean",
      (s, d) => {
        // fanoutIfNarrow (r16): both consumers (spans, tokPos) explode
        // positions with per-position array_join/slice — row-local CPU
        // that ran on the one-task single-row-group scan
        val toks = Helpers.fanoutIfNarrow(
          docs(s, d).select(col("doc_id"),
            split(col("text"), " ").as("ws")), col("doc_id"))
        // (doc, i, sp): the RAW 8-token span starting at 0-based i —
        // grouping on the span text itself is exact (no hash-collision
        // caveat) and drops a per-position md5 from the hot path; the
        // string is an internal join key, never output.
        // sequence(0, negative) would count DOWN — guard short docs.
        val spans = toks.select(col("doc_id"), col("ws"),
            explode(expr("CASE WHEN size(ws) >= 8 " +
              "THEN sequence(0, size(ws) - 8) ELSE array() END")).as("i"))
          .select(col("doc_id"), col("i"),
            expr("array_join(slice(ws, i + 1, 8), ' ')").as("sp"))
        // "span occurs in 2+ distinct docs" == min(doc) != max(doc) over
        // a window keyed on the span — ONE shuffle on sp, versus the
        // groupBy + join-back form that shuffles the wide span strings
        // twice and re-explodes the whole corpus for the join probe
        // (measured ~1.5x total-query win at sf0.1, same exact result)
        val wSp = org.apache.spark.sql.expressions.Window.partitionBy("sp")
        val bad = spans
          .withColumn("lo", min("doc_id").over(wSp))
          .withColumn("hi", max("doc_id").over(wSp))
          .filter(col("lo") =!= col("hi"))
          .select(col("doc_id"),
            explode(expr("sequence(i, i + 7)")).as("j"))
        // r17 (guide §8 "decide with small rows"): aggregate only the
        // MASK — collect_set dedups the overlapping span positions, so
        // the old separate distinct + its exchange are gone — and
        // rebuild the cleaned text ROW-LOCALLY against the token array
        // the fan-out already carries. The previous shape re-exploded
        // every token (541k rows at sf0.1), left-joined the mask onto
        // them, and re-assembled each document through a
        // collect_list(struct)+array_sort+transform object aggregate —
        // 3.3 s of the query's summed CPU; the indexed-lambda filter
        // does the same reconstruction in place (lambda index and the
        // span positions are both 0-based). Buffer bound unchanged:
        // O(longest single document's masked positions), never
        // O(corpus); docs with no duplicated span join null and keep
        // every token.
        val badPos = bad.groupBy("doc_id")
          .agg(collect_set(col("j")).as("mask"))
        toks.join(badPos, Seq("doc_id"), "left")
          .select(col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            expr("CASE WHEN mask IS NULL THEN ws ELSE " +
              "filter(ws, (x, i) -> NOT array_contains(mask, i)) END")
              .as("kept"))
          .select(col("doc_id"), col("n_tokens"),
            size(col("kept")).cast("long").as("n_kept"),
            md5(expr("array_join(kept, ' ')").cast("binary")).as("h_clean"))
          .orderBy("doc_id")
      },
      // oracle note: DuckDB can't lateral generate_series on a column —
      // CROSS JOIN a constant range (600 > any testdata token count,
      // Spark side uncapped) and filter, the q_chunk precedent
      Some("""WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
             g AS (SELECT doc_id, i, array_to_string(ws[i + 1:i + 8], ' ') AS sp
                   FROM t CROSS JOIN range(0, 600) r(i) WHERE i + 8 <= len(ws)),
             shared AS (SELECT sp FROM g GROUP BY sp HAVING count(DISTINCT doc_id) >= 2),
             bad AS (SELECT DISTINCT g.doc_id, g.i + s.k AS j
                     FROM g JOIN shared USING (sp) CROSS JOIN range(0, 8) s(k)),
             tok AS (SELECT doc_id, i AS j, ws[i + 1] AS w
                     FROM t CROSS JOIN range(0, 600) r(i) WHERE i < len(ws)),
             kept AS (SELECT tok.doc_id, tok.j, tok.w FROM tok
                      WHERE NOT EXISTS (SELECT 1 FROM bad
                        WHERE bad.doc_id = tok.doc_id AND bad.j = tok.j)),
             ka AS (SELECT doc_id, count(*) AS n_kept,
                      md5(string_agg(w, ' ' ORDER BY j)) AS h_clean
                    FROM kept GROUP BY doc_id)
             SELECT t.doc_id, len(t.ws)::BIGINT AS n_tokens,
               coalesce(ka.n_kept, 0)::BIGINT AS n_kept,
               coalesce(ka.h_clean, md5('')) AS h_clean
             FROM t LEFT JOIN ka USING (doc_id)
             ORDER BY doc_id"""))
  )
}
