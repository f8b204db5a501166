package graft.engine

import java.nio.charset.StandardCharsets
import java.util.{Base64, UUID}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.StructType

/** Append-only table with a checkpointed commit log — the Delta-semantics
  * the reference actually relies on (ACID append + "time travel",
  * README.md:12), on plain parquet.
  *
  * Layout per table:
  * {{{
  *   <base>/<table>/d-<uuid>/part-*.parquet     unique dir per append attempt
  *   <base>/<table>/_commits/<n>.commit         commit marker — written LAST
  *   <base>/<table>/_commits/<n>.checkpoint     manifest snapshot <= n
  * }}}
  *
  * Protocol (the same shape as Delta's log):
  *  1. write the data files into a UNIQUE directory — concurrent writers
  *     can never clobber each other's files;
  *  2. claim the next version number by atomically renaming the fully
  *     written marker into place; the marker names the data directory and
  *     carries the commit's schema (base64 DDL) and optional idempotency
  *     key. A loser of the race just re-claims the next number — its data
  *     files are already safely in place.
  *
  * A version is visible iff its marker exists, so readers never see a
  * half-written append, and a writer that dies before committing leaves
  * only an invisible orphan directory.
  *
  * '''Checkpointing''' (the O(commits) fix): every `checkpointInterval`
  * commits the writer snapshots the whole manifest into `<n>.checkpoint`
  * (one marker body per line). State reads are then ONE directory listing
  * + ONE checkpoint read + the markers newer than the checkpoint — the
  * same recipe as Delta's `_checkpoint` parquet. Markers are never
  * deleted, so `versions()`/time travel see full history.
  *
  * '''Schema enforcement''': an append whose schema differs from the
  * table's current schema (names + types, nullability ignored — an
  * append is always allowed to be stricter) fails loudly BEFORE any data
  * is written, mirroring Delta's append-mode check that the reference
  * depends on (write_deltalake mode='append', collector.py:219-226).
  *
  * '''Compaction''' ([[compact]]): folds every live data directory into
  * one new directory committed as the next version — the OPTIMIZE
  * operation a streaming deployment needs once foreachBatch has appended
  * thousands of one-file micro-batch dirs. Pre-compaction versions keep
  * their markers and data, so time travel to them still works; readers at
  * or after the compaction version scan only the compacted directory plus
  * any appends that raced past it.
  *
  * '''Merge-on-read DML''' ([[deleteVectored]] / [[deleteMatchingVectored]]
  * / [[updateVectored]]): Delta's deletion-vector shape — DELETE/UPDATE
  * commit positional masks (and, for UPDATE, the updated row images)
  * instead of rewriting data files, so small DML on a huge table writes
  * kilobytes; readers anti-join the live masks and the next
  * compact/delete/merge materializes them back into plain files. The
  * copy-on-write forms ([[delete]] / [[deleteMatching]] / [[merge]])
  * remain for read-heavy tables where per-scan mask joins aren't wanted.
  */
final class VersionedParquetSink(basePath: String,
    checkpointInterval: Int = 10,
    // the store's publish-if-absent primitive (see [[CommitCoordinator]]);
    // swap for a conditional-PUT implementation on object stores whose
    // rename is not atomic-no-replace
    coordinator: CommitCoordinator = RenameCommitCoordinator)
    extends TableSink {
  require(checkpointInterval >= 1, "checkpointInterval must be >= 1")

  private def tableDir(table: String) = s"$basePath/$table"
  private def commitDir(table: String) = s"$basePath/$table/_commits"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  import VersionedParquetSink.Commit

  private def parseCommit(version: Long, body: String): Commit = {
    // [^"]* not [^"]+: an empty-string value is a real value (an empty
    // idempotency key must still dedup)
    def str(field: String): Option[String] =
      ("\"" + field + """"\s*:\s*"([^"]*)"""").r.findFirstMatchIn(body).map(_.group(1))
    def num(field: String): Option[Long] =
      ("\"" + field + """"\s*:\s*(\d+)""").r.findFirstMatchIn(body).map(_.group(1).toLong)
    def b64(s: String) = new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)
    val dir = str("dir").filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(s"corrupt commit marker v$version: $body"))
    // keyB64 first; fall back to the round-1 plain "key" field so tables
    // written by the previous sink version keep their idempotency keys
    // (without this a replayed pre-upgrade batch would double-append)
    val key = str("keyB64").map(b64).orElse(str("key"))
    Commit(version, dir, key, num("compacts"),
      str("schemaB64").filter(_.nonEmpty).map(b64),
      str("ts").flatMap(t =>
        scala.util.Try(java.time.Instant.parse(t).toEpochMilli).toOption),
      str("op"), str("statsB64").filter(_.nonEmpty).map(b64),
      str("constraintsB64").filter(_.nonEmpty).map(b64),
      str("mappingB64").filter(_.nonEmpty).map(b64),
      str("gensB64").filter(_.nonEmpty).map(b64),
      str("propsB64").filter(_.nonEmpty).map(b64),
      // dir-granular selective rewrite (OPTIMIZE WHERE): the BASE NAMES
      // of the dirs this commit's folded copy supersedes — base names,
      // not full dirs, so a clone's re-pointed `../src/<dir>` spelling
      // still matches (same prefix-independence as DV mask paths)
      str("replacesB64").map(b64).toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty),
      // newline-separated: source URIs may contain commas
      str("copiedB64").map(b64).toSeq
        .flatMap(_.split('\n')).filter(_.nonEmpty),
      str("userMetaB64").filter(_.nonEmpty).map(b64), body)
  }

  private def readSmallFile(spark: SparkSession, p: String): String = {
    val in = fs(spark, p).open(new Path(p))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Full manifest, ascending by version: ONE listing, ONE checkpoint
    * read, plus only the markers newer than the newest checkpoint.
    * Retries when a concurrent [[vacuumLog]] deletes a file between our
    * listing and our read — retirement implies a NEWER checkpoint now
    * covers it, so a fresh listing always converges. */
  private def manifest(spark: SparkSession, table: String): Seq[Commit] = {
    var attempt = 0
    while (true) {
      try return manifestOnce(spark, table)
      catch {
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt >= 8) throw e
      }
    }
    Seq.empty // unreachable
  }

  private def manifestOnce(spark: SparkSession, table: String): Seq[Commit] = {
    val dir = new Path(commitDir(table))
    val f = fs(spark, commitDir(table))
    if (!f.exists(dir)) return Seq.empty
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    val cpVersion = names.filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong).sorted.lastOption
    val fromCp: Seq[Commit] = cpVersion match {
      case None => Seq.empty
      case Some(cp) =>
        readSmallFile(spark, s"${commitDir(table)}/$cp.checkpoint")
          .linesIterator.filter(_.nonEmpty).map { line =>
            val v = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(line)
              .getOrElse(throw new IllegalStateException(
                s"corrupt checkpoint line in $table cp$cp: $line"))
              .group(1).toLong
            parseCommit(v, line)
          }.toSeq
    }
    val tail = names.filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong)
      .filter(v => cpVersion.forall(v > _))
      .map(v => parseCommit(v, readSmallFile(spark, s"${commitDir(table)}/$v.commit")))
    (fromCp ++ tail).sortBy(_.version)
  }

  /** Committed version numbers, ascending — full history through the
    * manifest (checkpoint lines + newer markers), so it stays complete
    * even after [[vacuumLog]] retires checkpointed marker files. */
  def versions(spark: SparkSession, table: String): Seq[Long] =
    manifest(spark, table).map(_.version)

  /** Log retention (Delta's `delta.logRetentionDuration` shape):
    * deletes commit-marker files already SNAPSHOTTED by a checkpoint
    * (and superseded older checkpoints) once they age past
    * `olderThanMs`. Safe by construction: [[manifest]] reads every
    * version at or below the newest checkpoint FROM the checkpoint
    * (never from its marker file), and checkpoint lines carry the FULL
    * marker bodies — so time travel, keyed replay dedup, history, and
    * clones are all unaffected; the only change is that the `_commits`
    * listing stays O(interval + recent) instead of O(all versions
    * ever). Opt-in via the `graft.logRetentionDuration` TBLPROPERTIES
    * (honored by [[vacuum]]) or direct call. Returns files deleted. */
  def vacuumLog(spark: SparkSession, table: String,
      olderThanMs: Long): Int = {
    val dir = new Path(commitDir(table))
    val f = fs(spark, commitDir(table))
    if (!f.exists(dir)) return 0
    // ENFORCED deployment rule (was prose in the claim loop until r13):
    // the phantom-claim guard distinguishes "my fresh marker is
    // lag-hidden" from "I re-minted a vacuumed version" by the
    // checkpoint horizon, which is only sound when every marker
    // outlives the store's worst-case LIST lag — retiring markers
    // younger than the lag re-opens the silent-commit-loss window the
    // object-store emulation caught in r12. Refuse, loudly, instead of
    // letting a mis-set retention disarm the guard.
    val lagBound = storeMaxListLagMs(spark, table)
    if (olderThanMs < lagBound)
      throw new IllegalArgumentException(
        s"vacuumLog(olderThanMs=${olderThanMs}ms) on '$table' is below " +
          s"the declared store LIST lag (graft.store.maxListLag=" +
          s"${lagBound}ms): markers must outlive the lag or a stale " +
          "writer can re-mint a vacuumed version as a commit that " +
          "manifest() permanently filters out (silent loss). Raise " +
          "graft.logRetentionDuration / the olderThanMs argument, or " +
          "lower graft.store.maxListLag if the store is stronger.")
    val sts = f.listStatus(dir).toSeq
    val cp = sts.map(_.getPath.getName).filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong).sorted.lastOption
    cp.fold(0) { c =>
      val now = System.currentTimeMillis()
      val dead = sts.filter { st =>
        val n = st.getPath.getName
        val covered =
          (n.endsWith(".commit") &&
            n.stripSuffix(".commit").toLong <= c) ||
          (n.endsWith(".checkpoint") &&
            n.stripSuffix(".checkpoint").toLong < c)
        covered && now - st.getModificationTime >= olderThanMs
      }
      dead.foreach(st => f.delete(st.getPath, false))
      dead.size
    }
  }

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  override def append(df: DataFrame, table: String): Unit =
    doAppend(df, table, commitKey = None)

  /** Append with opt-in schema evolution (Delta's `mergeSchema` parity):
    * the incoming frame may ADD columns; every existing column must keep
    * its name and type. Earlier versions read the new columns as null —
    * including through time travel. */
  def append(df: DataFrame, table: String, allowEvolution: Boolean): Unit =
    doAppend(df, table, commitKey = None, allowEvolution = allowEvolution)

  /** Idempotent keyed append: if any committed marker carries this key,
    * the append is a no-op — the exactly-once contract for replayed
    * streaming micro-batches. The key check re-runs after losing a
    * version race, so two replicas replaying the same batch commit once.
    * Keys live in the manifest (markers + checkpoints), so dedup
    * survives checkpointing and compaction. */
  override def appendOnce(df: DataFrame, table: String,
      commitKey: String): Boolean =
    doAppend(df, table, Some(commitKey))

  /** Keyed append with opt-in schema evolution — the combination a
    * long-lived exactly-once ingest needs when its own bookkeeping
    * schema grows a column (see streaming/Rebalance's counts log). */
  def appendOnce(df: DataFrame, table: String, commitKey: String,
      allowEvolution: Boolean): Boolean =
    doAppend(df, table, Some(commitKey), allowEvolution = allowEvolution)

  private def doAppend(df: DataFrame, table: String,
      commitKey: Option[String], allowEvolution: Boolean = false,
      initialProps: Option[Map[String, String]] = None): Boolean = {
    val spark = df.sparkSession
    var attempt = 0
    while (true) {
      val entries = manifest(spark, table)
      if (commitKey.exists(k => entries.exists(_.key.contains(k))))
        return false
      // TBLPROPERTIES from the caller's snapshot: autoCompact/bloom are
      // steady-state behaviors, one commit of enablement lag is fine and
      // saves re-reading the manifest on every append
      val props = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.props)
          .orElse(initialProps.flatMap(p =>
            VersionedParquetSink.Constraints.render(p.toSeq)))).toMap
      val idents = identityDecls(props)
      if (idents.isEmpty) {
        val staged = stageAppend(df, table, entries, allowEvolution)
        val committed = claimStaged(spark, staged, commitKey, allowEvolution,
          snapshot = Some(entries), cleanupOnKeyLoss = true,
          initialProps = initialProps).isDefined
        if (committed) {
          maybeAutoCompact(spark, table, props)
          maybeBloom(spark, table, props)
        }
        return committed
      }
      // identity allocation: stamp values from the declared high waters,
      // stage, and commit PINNED to this base version — any concurrent
      // commit aborts the claim and the whole allocation retries from
      // the fresh high waters (Delta serializes identity transactions
      // the same way)
      // ALWAYS semantics: a writer may not supply values. SQL INSERT
      // with an explicit column list arrives with the identity column
      // auto-filled NULL — indistinguishable from "not supplied", so an
      // all-null column is dropped and allocated; any non-null value is
      // rejected (Delta's rule).
      val cleaned = idents.keys.foldLeft(df) { (d, c) =>
        if (!d.columns.contains(c)) d
        else {
          require(d.filter(col(c).isNotNull).isEmpty,
            s"column '$c' of '$table' is GENERATED ALWAYS AS IDENTITY — " +
              "writers may not supply it")
          d.drop(c)
        }
      }
      import org.apache.spark.sql.functions.monotonically_increasing_id
      val stamped = idents.foldLeft(cleaned) { case (d, (c, (_, step, hw))) =>
        d.withColumn(c, (monotonically_increasing_id() + 1L) * step + hw)
      }
      val staged = stageAppend(stamped, table, entries, allowEvolution)
      // new high waters from the commit's OWN per-file stats (the
      // extreme in the increment's direction) — no extra pass; an
      // empty batch leaves them unchanged. Stats cover only the first
      // FileStats.MaxStatsColumns eligible columns, so on a wide table
      // the identity column can be OUTSIDE the stats set — in that case
      // the extreme is derived directly from the staged files (one
      // single-column agg), and the append FAILS rather than commit a
      // high water it could not advance: a stale high water mints
      // duplicate identity values on the next append, violating the
      // GENERATED ALWAYS AS IDENTITY uniqueness contract.
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        entries.lastOption.flatMap(_.mapping))
      val perFile = FileStats.parse(staged.statsJson)
      val stagedRows = perFile.values.map(_.numRecords).sum
      val newDecls = idents.map { case (c, (s0, step, hw)) =>
        val phys =
          VersionedParquetSink.ColumnMapping.physicalName(mapping, c)
        val extremes = perFile.values.flatMap(pf =>
          (if (step > 0) pf.maxV else pf.minV).get(phys)).map(_.asLong)
        val ext: Seq[Long] =
          if (extremes.nonEmpty || stagedRows == 0L) extremes.toSeq
          else {
            val r = spark.read
              .parquet(s"${tableDir(table)}/${staged.unique}")
              .agg((if (step > 0)
                org.apache.spark.sql.functions.max(col(phys))
              else org.apache.spark.sql.functions.min(col(phys)))
                .cast("long")).head()
            if (r.isNullAt(0)) throw new IllegalStateException(
              s"cannot derive the identity high water for column '$c' " +
                s"of '$table': the staged commit has $stagedRows rows " +
                "but no stamped extreme — refusing to commit a stale " +
                "high water (it would mint duplicate identity values)")
            Seq(r.getLong(0))
          }
        val nhw = if (ext.isEmpty) hw
          else if (step > 0) math.max(hw, ext.max)
          else math.min(hw, ext.min)
        s"graft.identity.$c" -> s"$s0:$step:$nhw"
      }
      try {
        val committed = commitLoop(spark, table, staged.unique, commitKey,
          compacts = None, schemaDdl = staged.schemaDdl,
          cleanupOnKeyLoss = true, snapshot = Some(entries),
          enforceSchema = true, allowEvolution = allowEvolution,
          // conflict scope: the PROPS payload (which carries the high
          // waters) — another allocation or SET TBLPROPERTIES aborts
          // us; compactions and plain appends sail through, so identity
          // appends stay live under maintenance churn
          enforcedProps = Some(entries.lastOption.flatMap(_.props)),
          statsJson = Some(staged.statsJson),
          enforcedConstraints = Some(staged.constraints),
          newMapping = staged.newMapping.map(m => Some(m)),
          enforcedMapping =
            if (staged.mapping.isDefined) Some(staged.mapping) else None,
          enforcedGenerated = Some(staged.generated),
          newProps = Some(VersionedParquetSink.Constraints.render(
            (props ++ newDecls).toSeq))).isDefined
        if (committed) {
          maybeAutoCompact(spark, table, props)
          maybeBloom(spark, table, props)
        }
        return committed
      } catch {
        case _: VersionedParquetSink.ConcurrentRewriteException =>
          attempt += 1
          if (attempt >= 20) throw new IllegalStateException(
            s"identity append to '$table' lost $attempt allocation " +
              "races; giving up")
          Thread.sleep(math.min(50L * attempt, 500L)) // contention backoff
        // loop: re-read the manifest and re-allocate
      }
    }
    false // unreachable
  }

  /** GENERATE symlink_format_manifest (Delta parity): writes
    * `_symlink_format_manifest/manifest` under the table dir — one
    * absolute data-file URI per line for the CURRENT snapshot, the
    * format Presto/Trino/Athena external tables consume. Atomic
    * (temp-write + rename), so concurrent readers see the old or the
    * new manifest, never a torn one. Refused while live deletion
    * vectors / merge-on-read masks exist (an external reader cannot
    * apply them — serving the unmasked files would resurrect deleted
    * rows; run [[reorgPurge]] first), exactly Delta's rule. Driver-side
    * O(live files) listing; returns the file count. */
  def generateManifest(spark: SparkSession, table: String): Int = {
    val entries = manifest(spark, table)
    require(entries.nonEmpty, s"no committed versions for $table")
    val live = liveEntries(entries)
    val masked = live.filter(VersionedParquetSink.isMergeOnRead)
    require(masked.isEmpty,
      s"cannot generate a symlink manifest for '$table': live deletion-" +
        s"vector commit(s) ${masked.map(e => s"v${e.version}").mkString(", ")}" +
        " — an external reader cannot apply row masks; run REORG APPLY " +
        "(PURGE) first")
    val f = fs(spark, tableDir(table))
    val files = live.filterNot(VersionedParquetSink.isDv).flatMap { e =>
      val p = new Path(
        VersionedParquetSink.resolveDir(tableDir(table), e.dir))
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => f.makeQualified(st.getPath).toUri.toString)
    }.sorted
    val dir = new Path(tableDir(table), "_symlink_format_manifest")
    f.mkdirs(dir)
    val tmp = new Path(dir, s".manifest.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(files.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, "manifest")
    // Overwriting rename (FileContext supports Rename.OVERWRITE where
    // plain FileSystem.rename does not): readers see the old manifest
    // or the new one — never an ENOENT window, and a crash mid-publish
    // leaves the previous manifest intact. Falls back to delete+rename
    // only on stores whose FileContext cannot overwrite.
    // fallback catches IOException too: stores with no AbstractFileSystem
    // binding throw UnsupportedFileSystemException (an IOException) from
    // getFileContext, and a transient rename failure should still try
    // the plain path rather than leak the tmp file
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.makeQualified(dir).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        f.delete(target, false)
        if (!f.rename(tmp, target)) {
          f.delete(tmp, false)
          throw new IllegalStateException(
            s"failed to publish symlink manifest for '$table'")
        }
    }
    files.size
  }

  /** COPY INTO (Delta parity): idempotent FILE-granular bulk load from
    * a directory of parquet files into an EXISTING table. Each source
    * file is identified as `uri@mtime:length`; identities recorded by
    * an earlier COPY ride the commit marker itself (`copiedB64`), so a
    * re-run loads only the new files and a crash-replay never
    * double-loads — the ledger and the rows land in ONE atomic commit.
    * All write governance applies (schema check, CHECK constraints,
    * generated columns, optimizeWrite shaping, bloom indexing).
    * Concurrency: the commit pins its base version and the whole
    * compute-stage-claim retries from a fresh snapshot on conflict, so
    * racing COPYs converge with every file loaded exactly once.
    * Returns the number of files loaded (0 = already up to date).
    *
    * Scale: the ledger diff is driver-side set arithmetic over the
    * manifest (O(loaded files) strings, same order as the manifest
    * itself); the data path is one distributed parquet read over ONLY
    * the fresh files. */
  def copyInto(spark: SparkSession, table: String, sourceDir: String,
      pattern: String = "*.parquet",
      allowEvolution: Boolean = false): Long = {
    val srcFs = fs(spark, sourceDir)
    require(srcFs.exists(new Path(sourceDir)),
      s"COPY INTO source not found: $sourceDir")
    val files = Option(srcFs.globStatus(new Path(sourceDir, pattern)))
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.isFile)
    def id(st: org.apache.hadoop.fs.FileStatus): String =
      s"${st.getPath.toUri}@${st.getModificationTime}:${st.getLen}"
    var n = 0L
    retryingRewrite(spark, table, "COPY INTO", commitKey = None) { entries =>
      val loaded = entries.flatMap(_.copied).toSet
      val fresh = files.filterNot(st => loaded.contains(id(st)))
        .sortBy(_.getPath.toString)
      n = fresh.size.toLong
      if (fresh.isEmpty) entries.last.version
      else {
        val df = spark.read.parquet(fresh.map(_.getPath.toString): _*)
        val staged = stageAppend(df, table, entries, allowEvolution)
        commitLoop(spark, table, staged.unique, commitKey = None,
          compacts = None, schemaDdl = staged.schemaDdl,
          cleanupOnKeyLoss = false, snapshot = Some(entries),
          enforceSchema = true, allowEvolution = allowEvolution,
          requireBase = Some(entries.last.version),
          op = Some("copy"), statsJson = Some(staged.statsJson),
          enforcedConstraints = Some(staged.constraints),
          newMapping = staged.newMapping.map(m => Some(m)),
          enforcedMapping =
            if (staged.mapping.isDefined) Some(staged.mapping) else None,
          enforcedGenerated = Some(staged.generated),
          copied = fresh.map(id)).getOrElse(
            throw new IllegalStateException(
              "keyless COPY commit cannot lose a key race"))
      }
    }
    n
  }

  /** Best-effort [[ensureBloomIndex]] after a successful write — same
    * contract as [[maybeAutoCompact]]: any failure skips silently (the
    * index is advisory; the next write retries). */
  private def maybeBloom(spark: SparkSession, table: String,
      props: Map[String, String]): Unit =
    if (BloomIndex.configured(props).nonEmpty) {
      try ensureBloomIndex(spark, table)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bloom] $table skipped: ${e.getMessage}")
      }
    }

  /** Builds missing Bloom-filter sidecars ([[BloomIndex]]) for every
    * live data dir of a table whose TBLPROPERTIES opt in
    * (`graft.bloom.columns`). Steady-state cost is one existence probe
    * per live dir (`_bloom/_SUCCESS` marks indexed dirs; commit dirs
    * are immutable so a stamped dir never re-checks); unindexed dirs
    * each get one distributed build pass. Runs automatically after
    * appends and stream epochs; call directly after OPTIMIZE/MERGE or
    * after first enabling the property on an existing table. */
  def ensureBloomIndex(spark: SparkSession, table: String): Unit = {
    val entries = manifest(spark, table)
    val props = VersionedParquetSink.Constraints.parse(
      entries.lastOption.flatMap(_.props)).toMap
    val logicalCols = BloomIndex.configured(props)
    if (logicalCols.isEmpty) return
    val fppValue = BloomIndex.fpp(props)
    val f = fs(spark, tableDir(table))
    liveEntries(entries).filterNot(VersionedParquetSink.isDv)
      .foreach { e =>
      val dir = VersionedParquetSink.resolveDir(tableDir(table), e.dir)
      // a SHALLOW CLONE's inherited dirs resolve `../source/<dir>` —
      // building there would write `_bloom` sidecars into the SOURCE
      // table's data dirs (clone inherits graft.bloom.columns), racing
      // any source-side build and violating the clone contract that
      // maintenance never touches the source. An inherited dir already
      // indexed by the source is served by those sidecars; otherwise
      // (source never opted in, or its sidecars were dropped) the
      // build lands CLONE-LOCALLY under `_bloom_ext/<digest(e.dir)>`,
      // which the read path consults as a fallback.
      val inherited = e.dir.startsWith("../")
      val out: Option[String] =
        if (!f.exists(new Path(dir))) None
        else if (inherited) {
          if (BloomIndex.isIndexed(f, dir)) None
          else {
            val ext = BloomIndex.extRoot(tableDir(table), e.dir)
            if (BloomIndex.isIndexedAt(f, ext)) None else Some(ext)
          }
        } else if (BloomIndex.isIndexed(f, dir)) None
        else Some(s"$dir/_bloom")
      out.foreach { bloomOut =>
        // the dir's files spell the schema/mapping AS OF ITS COMMIT —
        // configured columns missing back then are skipped for that dir
        val logical = e.schemaDdl.map(StructType.fromDDL)
          .getOrElse(StructType(Nil))
        val mapping = VersionedParquetSink.ColumnMapping.parse(e.mapping)
        val physSchema =
          VersionedParquetSink.ColumnMapping.physicalSchema(logical, mapping)
        val physNames = logicalCols
          .filter(lc => logical.fieldNames.contains(lc))
          .map(lc =>
            VersionedParquetSink.ColumnMapping.physicalName(mapping, lc))
          .toSet
        val physCols = physSchema.fields.toSeq
          .filter(sf => physNames.contains(sf.name))
        val counts = e.stats.map(FileStats.parse).getOrElse(Map.empty)
          .map { case (file, pf) => file -> pf.numRecords }
        BloomIndex.buildDirAt(spark, dir, bloomOut, physSchema, physCols,
          counts, fppValue)
      }
    }
  }

  /** Auto-compaction (Delta's `autoOptimize.autoCompact` parity): when
    * `graft.autoCompact.minDirs` is set in TBLPROPERTIES, every
    * successful append checks the live dir population and folds the
    * SMALL dirs (total bytes under `graft.autoCompact.targetBytes`,
    * default 128 MiB) once at least `minDirs` of them accumulate — the
    * LSM-style amortization that keeps a micro-batch-appended table's
    * dir count bounded without any scheduled OPTIMIZE. Only small dirs
    * fold (an output that crossed the size target is never rewritten
    * again), so steady-state write amplification is logarithmic, never
    * O(table) per trigger. Best-effort: a lost conflict race or any
    * failure skips silently — the next append retries. */
  private def maybeAutoCompact(spark: SparkSession, table: String,
      props: Map[String, String]): Unit =
    try props.get("graft.autoCompact.minDirs").map(_.toInt).foreach { minDirs =>
      val target = props.get("graft.autoCompact.targetBytes")
        .map(_.toLong).getOrElse(128L * 1024 * 1024)
      val entries = manifest(spark, table)
      val f = fs(spark, tableDir(table))
      val small = liveEntries(entries).filter(e =>
        e.compacts.isEmpty && !VersionedParquetSink.isMergeOnRead(e))
        .filter { e =>
          val p = new Path(
            VersionedParquetSink.resolveDir(tableDir(table), e.dir))
          f.exists(p) &&
            f.listStatus(p).filter(_.isFile).map(_.getLen).sum < target
        }
      if (small.size >= minDirs) {
        // clustered tables re-cluster the fold on the declared columns
        foldSelected(spark, table, entries, small, Nil,
          targetFiles = Some(1), zorderBy = clusterColumns(props),
          commitKey = Some(s"autocompact-${entries.last.version}"))
        ()
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[auto-compact] $table skipped: ${e.getMessage}")
    }

  /** CREATE TABLE with TBLPROPERTIES as ONE atomic commit: the creating
    * append carries the property set in its own marker, so there is no
    * window where the table is visible without its properties, and the
    * created table's version numbering matches a property-less CREATE. */
  def createWithProperties(df: DataFrame, table: String,
      props: Map[String, String]): Unit =
    doAppend(df, table, commitKey = None,
      initialProps = if (props.isEmpty) None else Some(props))

  /** Claim a streaming epoch's executor-written staged dir into the
    * commit log (the driver half of the DSv2 StreamingWrite): the dir
    * under `tableDir/<unique>` was produced by executor DataWriters and
    * is invisible until this claim. Exactly-once rides the keyed-marker
    * protocol — a replayed epoch (same key) discards its dir and
    * no-ops.
    *
    * Governance: a plain table (no constraints / column mapping /
    * generated columns) claims the dir DIRECTLY — zero extra data
    * movement, per-file stats collected in one distributed pass, and
    * the claim pins "no governance" so a concurrent ADD CONSTRAINT /
    * rename aborts it (the epoch retries and takes the governed path).
    * A governed table re-stages the rows through the full append
    * machinery (constraint guard, generated-column completion,
    * physical-name mapping) — one extra write, only when governance
    * features are actually in play. */
  def commitStreamEpoch(spark: SparkSession, table: String, unique: String,
      querySchema: StructType, commitKey: String,
      replace: Boolean = false): Boolean = {
    val f = fs(spark, tableDir(table))
    val dirPath = new Path(s"${tableDir(table)}/$unique")
    val entries = manifest(spark, table)
    if (entries.exists(_.key.contains(commitKey))) {
      f.delete(dirPath, true)
      return false
    }
    if (replace) {
      // complete-mode epoch: the staged rows REPLACE the table — a keyed
      // logged rewrite (atomic swap, time-travelable history, CDF sees a
      // data change). Epoch outputs are aggregate-sized, so re-staging
      // through the governed overwrite path costs one small extra write
      // and buys uniform schema-replace/governance semantics.
      val df = spark.read.schema(querySchema)
        .parquet(s"${tableDir(table)}/$unique")
      overwrite(df, table, Some(commitKey))
      f.delete(dirPath, true)
      return true
    }
    val last = entries.lastOption
    // identity tables re-stage like other governed tables: the epoch's
    // rows need engine-assigned values the executor writers can't mint
    val governed = last.exists(e => e.mapping.isDefined ||
      e.generated.isDefined || e.constraints.isDefined ||
      identityDecls(VersionedParquetSink.Constraints.parse(e.props)
        .toMap).nonEmpty)
    if (governed) {
      val df = spark.read.schema(querySchema)
        .parquet(s"${tableDir(table)}/$unique")
      val ok = appendOnce(df, table, commitKey)
      f.delete(dirPath, true)
      ok
    } else {
      // fail fast (and clean up) on drift before the stats pass; the
      // claim re-checks under the lock against a fresh manifest
      try SchemaCheck.enforceAppend(table,
        last.flatMap(_.schemaDdl).map(StructType.fromDDL), querySchema)
      catch { case e: Throwable => f.delete(dirPath, true); throw e }
      val stats = FileStats.collect(spark,
        s"${tableDir(table)}/$unique", querySchema)
      val ok = commitLoop(spark, table, unique, Some(commitKey),
        compacts = None,
        schemaDdl = querySchema.toDDL, cleanupOnKeyLoss = true,
        snapshot = Some(entries), enforceSchema = true,
        statsJson = Some(stats),
        enforcedConstraints = Some(None),
        enforcedMapping = Some(None),
        enforcedGenerated = Some(None)).isDefined
      // micro-batch streaming is auto-compaction's prime customer: a
      // dir per epoch is exactly the population it bounds
      if (ok) {
        val props = VersionedParquetSink.Constraints.parse(
          entries.lastOption.flatMap(_.props)).toMap
        maybeAutoCompact(spark, table, props)
        maybeBloom(spark, table, props)
      }
      ok
    }
  }

  /** Optimized writes (Delta's `autoOptimize.optimizeWrite` parity):
    * with `TBLPROPERTIES('graft.optimizeWrite'='true')`, an append's
    * partitions COALESCE down so each output file targets
    * `graft.optimizeWrite.targetBytes` (default 128 MiB) of PLANNED
    * size — without it, a 1000-task pipeline writing a few MB commits
    * 1000 tiny files per append and the small-file problem compounds
    * with every micro-batch. Coalesce is narrow (no shuffle, unlike
    * Delta's adaptive shuffle — the right trade when the write is the
    * last stage anyway) and never INCREASES the partition count, so a
    * genuinely large append keeps its parallelism. The size estimate is
    * Catalyst's in-memory `sizeInBytes`, so on-disk parquet files land
    * a few× smaller than the target — same ballpark Delta's binning
    * hits. Complements [[maybeAutoCompact]]: this shapes files at write
    * time, that folds history after. */
  /** Size-targeted partition count for an append: Catalyst's planned
    * size over the target bin, clamped to [1, incoming partitions] so a
    * write never LOSES parallelism it arrived with. */
  private def sizedPartitions(df: DataFrame,
      props: Map[String, String]): Int = {
    val target = props.get("graft.optimizeWrite.targetBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(128L * 1024 * 1024)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = ((est + target - 1) / target).toLong
    val cur = df.rdd.getNumPartitions
    math.max(1L, math.min(want, cur.toLong)).toInt
  }

  /** Clustering columns of a clustered table (Delta liquid-clustering
    * UX: declare once in TBLPROPERTIES, every write and maintenance
    * pass keeps the layout): `graft.cluster.columns` = comma list of
    * numeric/date/timestamp columns. */
  private def clusterColumns(props: Map[String, String]): Seq[String] =
    props.get("graft.cluster.columns").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))

  private def optimizeWrite(df: DataFrame,
      props: Map[String, String]): DataFrame = {
    val cluster = clusterColumns(props)
    if (cluster.nonEmpty) {
      // clustered tables imply optimized writes (Delta's coupling): the
      // batch Morton-clusters on the declared columns into size-targeted
      // files, so every append's per-file stats are tight on all of them
      ZOrder.zOrderedN(df, cluster, sizedPartitions(df, props))
    } else if (!props.get("graft.optimizeWrite").exists(_.toBoolean)) df
    else {
      val n = sizedPartitions(df, props)
      if (n >= df.rdd.getNumPartitions) df else df.coalesce(n)
    }
  }

  /** Everything [[doAppend]] does BEFORE the commit claim: governance
    * completion/guards, schema pre-check, the unique data-dir write,
    * per-file stats. The staged dir is invisible until a marker claims
    * it — which is what the multi-table transaction exploits. */
  private def stageAppend(df: DataFrame, table: String,
      entries: Seq[Commit], allowEvolution: Boolean):
      VersionedParquetSink.Staged = {
    val spark = df.sparkSession
    val tableSchema =
      entries.lastOption.flatMap(_.schemaDdl).map(StructType.fromDDL)
    // generated columns: a missing one is COMPUTED inside the write's
    // own pass; a caller-provided one is VALIDATED to equal its
    // expression per row (both Delta's rules). Runs before the schema
    // check so a frame omitting generated columns still schema-matches.
    val gensJson = entries.lastOption.flatMap(_.generated)
    val completed = completeGenerated(df, gensJson, tableSchema, table)
    // early check: fail BEFORE the data write on the common path (the
    // claim loop re-checks against a FRESH manifest under the lock —
    // this snapshot can be stale by commit time)
    SchemaCheck.enforceAppend(table, tableSchema,
      completed.schema, allowEvolution)
    // CHECK constraints ride the write's own pass as a per-row guard;
    // the claim loop aborts if the set changes before we commit
    val cons = entries.lastOption.flatMap(_.constraints)
    val guarded = constraintGuard(completed, cons, table)
    // column mapping: files carry PHYSICAL names; an evolution append on
    // a mapped table mints fresh physical names/ids for its new columns
    // (never reusing a dropped column's), and the claim aborts if the
    // mapping moved under us — our files' physical names bind us to the
    // mapping we extended
    val mappingJson = entries.lastOption.flatMap(_.mapping)
    val mapping = VersionedParquetSink.ColumnMapping.parse(mappingJson)
    val newCols = if (mappingJson.isDefined)
      completed.schema.fields.toSeq
        .filterNot(f => mapping.exists(_._1 == f.name))
    else Seq.empty
    val extended = if (newCols.isEmpty) mapping else {
      val maxId = mapping.map(_._2.id).maxOption.getOrElse(0)
      mapping ++ newCols.zipWithIndex.map { case (f, i) =>
        f.name -> VersionedParquetSink.ColumnMapping.Entry(
          s"col-${UUID.randomUUID()}", maxId + 1 + i)
      }
    }
    val unique = s"d-${UUID.randomUUID()}"
    val shaped = optimizeWrite(guarded, VersionedParquetSink.Constraints
      .parse(entries.lastOption.flatMap(_.props)).toMap)
    toPhysical(shaped, extended).write.mode(SaveMode.ErrorIfExists)
      .parquet(s"${tableDir(table)}/$unique") // step 1: unique data dir
    val stats = FileStats.collect(spark, s"${tableDir(table)}/$unique",
      VersionedParquetSink.ColumnMapping
        .physicalSchema(completed.schema, extended))
    VersionedParquetSink.Staged(table, unique, completed.schema.toDDL,
      stats, cons,
      // pin the mapping we translated against whenever the table IS
      // mapped (not only when extending): our files carry its physical
      // names, so a concurrent rename/drop must abort this append at
      // the claim — otherwise a drop racing a non-extending
      // allowEvolution append could re-add the column under the
      // dropped column's frozen physical name and resurrect old data
      mappingJson,
      if (newCols.isEmpty) None
      else VersionedParquetSink.ColumnMapping.render(extended),
      gensJson)
  }

  /** The commit claim for a [[stageAppend]]-staged dir.
    * `preserveOnAbort` keeps the staged dir on a governance/schema abort
    * (multi-table transactions: the dir is named by a `_txn` manifest and
    * recovery re-validates it — deleting it would poison recovery). */
  private def claimStaged(spark: SparkSession,
      s: VersionedParquetSink.Staged, commitKey: Option[String],
      allowEvolution: Boolean, snapshot: Option[Seq[Commit]],
      cleanupOnKeyLoss: Boolean,
      preserveOnAbort: Boolean = false,
      initialProps: Option[Map[String, String]] = None): Option[Long] =
    commitLoop(spark, s.table, s.unique, commitKey, compacts = None,
      schemaDdl = s.schemaDdl, cleanupOnKeyLoss = cleanupOnKeyLoss,
      snapshot = snapshot, enforceSchema = true,
      allowEvolution = allowEvolution, statsJson = Some(s.statsJson),
      enforcedConstraints = Some(s.constraints),
      newMapping = s.newMapping.map(m => Some(m)),
      enforcedMapping = if (s.mapping.isDefined) Some(s.mapping) else None,
      enforcedGenerated = Some(s.generated),
      newProps = initialProps.map(p =>
        VersionedParquetSink.Constraints.render(p.toSeq)),
      preserveOnAbort = preserveOnAbort)

  private def txnDir: String = s"$basePath/_txn"
  private def txnFileName(key: String): String =
    Base64.getUrlEncoder.withoutPadding
      .encodeToString(key.getBytes(StandardCharsets.UTF_8)) + ".json"

  /** Cross-table TRANSACTIONAL append: one logical batch lands in every
    * named table or in none of them. Protocol (the classic stage +
    * intent-log shape, built from the sink's own primitives):
    *
    *  1. stage each table's data dir ([[stageAppend]]) — invisible until
    *     a marker claims it; a crash here orphans unclaimed dirs that
    *     [[vacuum]] collects, and NO table shows the batch;
    *  2. atomically rename ONE txn manifest into `_txn/` — the commit
    *     point. From this instant the batch is durable for ALL tables:
    *     [[recoverTransactions]] (run at the start of every
    *     multiAppendOnce, or directly) completes any claims a crash
    *     interrupted;
    *  3. claim each table's marker under `txnKey` (idempotent keyed
    *     commits; a key-loss never deletes the shared staged dir), then
    *     delete the manifest.
    *
    * Readers of a single table may observe the batch in table A
    * moments before table B while step 3 is in flight — the guarantee
    * is atomic durability (all-or-none after recovery), not a
    * cross-table read snapshot. A concurrent call with the SAME txnKey
    * loses the manifest rename, discards its own staging and completes
    * the winner's — exactly-once on the key either way. Governance
    * (constraints, mapping, generated columns) is pinned per table at
    * stage time; a concurrent governance change aborts the claim loudly
    * rather than committing unvalidated rows. */
  override def multiAppendOnce(writes: Seq[(DataFrame, String)],
      txnKey: String): Boolean = {
    require(writes.nonEmpty, "multiAppendOnce needs at least one write")
    require(writes.map(_._2).distinct.size == writes.size,
      s"one write per table in a transaction; got ${writes.map(_._2)}")
    val spark = writes.head._1.sparkSession
    val f = fs(spark, basePath)
    recoverTransactions(spark) // finish anything a crashed writer left
    val pending = writes.filterNot { case (_, t) =>
      manifest(spark, t).exists(_.key.contains(txnKey)) }
    if (pending.isEmpty) return false // full keyed replay: no-op
    val staged = pending.map { case (df, t) =>
      stageAppend(df, t, manifest(spark, t), allowEvolution = false) }
    f.mkdirs(new Path(txnDir))
    if (!coordinator.publishIfAbsent(f,
        new Path(s"$txnDir/${txnFileName(txnKey)}"),
        VersionedParquetSink.Staged.renderTxn(txnKey, staged)
          .getBytes(StandardCharsets.UTF_8))) {
      // a concurrent writer of the SAME logical batch owns the commit
      // point (or a crashed one left it): discard OUR staging and
      // complete THEIRS
      staged.foreach(s =>
        f.delete(new Path(s"${tableDir(s.table)}/${s.unique}"), true))
      recoverTransactions(spark)
      return false
    }
    staged.foreach { s =>
      txnClaimHook(s.table) // test seam: a throwing hook = writer death
      // preserveOnAbort: past the commit point the staged dir belongs to
      // the manifest — a governance abort here must leave the bytes for
      // recoverTransactions to re-validate and roll forward
      claimStaged(spark, s, Some(txnKey),
        allowEvolution = false, snapshot = None, cleanupOnKeyLoss = false,
        preserveOnAbort = true)
    }
    f.delete(new Path(s"$txnDir/${txnFileName(txnKey)}"), false)
    true
  }

  /** Test seam for the multi-table transaction's chaos coverage: called
    * before each per-table claim in step 3; a hook that throws
    * simulates the writer dying between table writes (after the commit
    * point). Production value is a no-op. */
  private[graft] var txnClaimHook: String => Unit = _ => ()

  /** Complete every pending multi-table transaction's claims (step 3 of
    * [[multiAppendOnce]]) — idempotent, safe to race. Returns the number
    * of table claims healed.
    *
    * Recovery never poison-pills the store. A claim that aborts because
    * governance moved past the commit point (concurrent ADD CONSTRAINT /
    * generated-column / schema change) is ROLLED FORWARD: the staged rows
    * are re-validated against the CURRENT governance and committed pinned
    * to it — the same outcome as if the batch had been staged after the
    * change. A manifest that genuinely cannot complete (staged dir
    * vanished before its table committed, or the staged rows violate the
    * new governance) is QUARANTINED — renamed to `*.json.failed` so later
    * recovery skips it and later writes proceed — and reported in ONE
    * loud exception AFTER every other manifest healed, naming which
    * tables the batch did and did not reach. */
  def recoverTransactions(spark: SparkSession): Int = {
    val f = fs(spark, basePath)
    val dir = new Path(txnDir)
    if (!f.exists(dir)) return 0
    var healed = 0
    val quarantined = scala.collection.mutable.ListBuffer.empty[String]
    f.listStatus(dir).toSeq.filter(st => st.isFile &&
        st.getPath.getName.endsWith(".json")).foreach { st =>
      val (key, staged) = VersionedParquetSink.Staged.parseTxn(
        readSmallFile(spark, st.getPath.toString))
      // first failure wins; remaining tables stay unclaimed (the
      // quarantined manifest records them for manual repair)
      val failure: Option[String] =
        staged.foldLeft(Option.empty[String]) { (err, s) =>
          if (err.isDefined) err
          else if (manifest(spark, s.table).exists(_.key.contains(key))) None
          else if (!f.exists(new Path(s"${tableDir(s.table)}/${s.unique}")))
            Some(s"staged dir ${s.unique} for table '${s.table}' is gone " +
              "but never committed (deleted outside the sink?)")
          else {
            try {
              claimStaged(spark, s, Some(key), allowEvolution = false,
                snapshot = None, cleanupOnKeyLoss = false,
                preserveOnAbort = true)
              healed += 1; None
            } catch {
              case _: IllegalStateException =>
                // governance moved past the commit point: roll forward
                rollForward(spark, key, s) match {
                  case None => healed += 1; None
                  case why => why
                }
              case e: IllegalArgumentException =>
                // schema moved past the commit point (enforceAppend)
                rollForwardFailure(s, e)
            }
          }
        }
      failure match {
        case None => f.delete(st.getPath, false)
        case Some(why) =>
          val committed = staged.filter(s =>
            manifest(spark, s.table).exists(_.key.contains(key)))
            .map(_.table)
          f.rename(st.getPath, new Path(st.getPath.toString + ".failed"))
          quarantined += s"transaction '$key': $why; the batch is " +
            (if (committed.isEmpty) "applied to NO table"
             else s"PARTIALLY applied (committed to " +
               s"${committed.mkString(", ")}; missing from " +
               s"${staged.map(_.table).diff(committed).mkString(", ")})") +
            s" — manifest quarantined as ${st.getPath.getName}.failed"
      }
    }
    if (quarantined.nonEmpty) throw new IllegalStateException(
      "unrecoverable multi-table transaction(s) quarantined — later " +
        "writes are NOT blocked, but these batches need manual repair:\n  " +
        quarantined.mkString("\n  "))
    healed
  }

  private def rollForwardFailure(s: VersionedParquetSink.Staged,
      e: Throwable): Option[String] =
    Some(s"staged rows for '${s.table}' cannot commit under the " +
      s"governance/schema that changed past the commit point: ${e.getMessage}")

  /** Roll a committed-but-unclaimed staged table forward past a
    * governance change: re-validate the staged rows against the CURRENT
    * constraint / generated-column expressions (executing the same
    * per-row guards a fresh write would run), then claim pinned to them.
    * Returns None on success, Some(reason) when the staged rows are
    * invalid under the new governance — the caller quarantines. */
  private def rollForward(spark: SparkSession, key: String,
      s: VersionedParquetSink.Staged): Option[String] = {
    var attempt = 0
    while (attempt < 3) {
      attempt += 1
      val entries = manifest(spark, s.table)
      val curMapping = entries.lastOption.flatMap(_.mapping)
      if (curMapping != s.mapping)
        return Some(s"column mapping on '${s.table}' changed while the " +
          "transaction was in flight; the staged files bake physical " +
          "names from the old mapping and cannot be rolled forward")
      val curCons = entries.lastOption.flatMap(_.constraints)
      val curGens = entries.lastOption.flatMap(_.generated)
      try {
        val schema = StructType.fromDDL(s.schemaDdl)
        val mapping = VersionedParquetSink.ColumnMapping.parse(s.mapping)
        val phys = spark.read.schema(VersionedParquetSink.ColumnMapping
            .physicalSchema(schema, mapping))
          .parquet(s"${tableDir(s.table)}/${s.unique}")
        val logical = if (mapping.isEmpty) phys
          else phys.select(schema.fields.toSeq.map(fl =>
            col(VersionedParquetSink.ColumnMapping
              .physicalName(mapping, fl.name)).as(fl.name)): _*)
        // provided generated columns validate per row against the NEW
        // expressions, constraints guard likewise — executing the
        // guarded plan IS the validation (raise_error on violation)
        constraintGuard(
          completeGenerated(logical, curGens, Some(schema), s.table),
          curCons, s.table)
          .foreach(_ => ())
        claimStaged(spark,
          s.copy(constraints = curCons, generated = curGens), Some(key),
          allowEvolution = false, snapshot = None,
          cleanupOnKeyLoss = false, preserveOnAbort = true)
        return None
      } catch {
        case _: IllegalStateException => () // moved again mid-recovery; retry
        case e: Throwable => return rollForwardFailure(s, e)
      }
    }
    Some(s"governance on '${s.table}' kept changing during recovery " +
      "(3 attempts)")
  }

  /** Complete and enforce generated columns for a write: absent columns
    * are computed from their expressions (cast to the table's declared
    * type, re-ordered to the table schema when that makes the frame
    * schema-exact); provided columns get a per-row null-safe equality
    * guard that throws naming the column — Delta's generated-column
    * write semantics. */
  private def completeGenerated(df: DataFrame, gensJson: Option[String],
      tableSchema: Option[StructType], table: String): DataFrame = {
    import org.apache.spark.sql.functions.{concat, expr, not, raise_error, when}
    val gens = VersionedParquetSink.Constraints.parse(gensJson)
    if (gens.isEmpty) return df
    def declaredType(n: String) =
      tableSchema.flatMap(_.fields.find(_.name == n)).map(_.dataType)
    val provided = gens.filter { case (n, _) => df.columns.contains(n) }
    val missing = gens.filterNot { case (n, _) => df.columns.contains(n) }
    val withComputed = missing.foldLeft(df) { case (d, (n, sql)) =>
      d.withColumn(n, declaredType(n)
        .fold(expr(sql))(t => expr(sql).cast(t)))
    }
    // completion restores the table's column order when it can (the
    // exact-schema check is order-sensitive); an evolution append with
    // extra new columns keeps them trailing
    val ordered = tableSchema match {
      case Some(ts) if ts.fieldNames.forall(withComputed.columns.contains) =>
        withComputed.select((ts.fieldNames.toSeq ++
          withComputed.columns.filterNot(ts.fieldNames.contains))
          .map(col): _*)
      case _ => withComputed
    }
    provided.foldLeft(ordered) { case (d, (n, sql)) =>
      d.filter(
        when(not(col(n) <=> (declaredType(n)
            .fold(expr(sql))(t => expr(sql).cast(t)))),
          raise_error(concat(
            lit(s"generated column '$n' of '$table': provided value " +
              s"does not match its expression ($sql)"))))
          .otherwise(lit(true)))
    }
  }

  /** Rename a frame's columns logical -> physical for writing (identity
    * on unmapped tables — physical == logical until the first
    * rename/drop enables mapping). */
  private def toPhysical(df: DataFrame,
      m: Seq[(String, VersionedParquetSink.ColumnMapping.Entry)]): DataFrame =
    if (m.isEmpty) df
    else df.select(df.columns.map(c => col(c).as(
      VersionedParquetSink.ColumnMapping.physicalName(m, c))): _*)

  /** Claim the next version for data dir `unique`. Returns the claimed
    * version, or None iff a competing commit with the same idempotency
    * key won the race (the orphaned data dir is then deleted).
    *
    * Concurrency protocol (Delta-style optimistic commit): each attempt
    * claims EXACTLY latest+1 from a manifest snapshot that also supplied
    * the idempotency-key check. The first attempt may reuse the caller's
    * snapshot (saving a listing on the uncontended path — any commit that
    * slipped in since occupies exactly the version we claim, failing the
    * rename); retries always re-read fresh, so a same-key racer's commit
    * is seen before we'd claim past it. HDFS-style rename is
    * atomic-no-overwrite across writers; the LOCAL filesystem's rename is
    * check-then-move (TOCTOU), so same-JVM racers — exactly the local[*]
    * deployment — additionally serialize the read-check-claim on a JVM
    * lock. Cross-JVM writers need an atomic-rename fs (HDFS/ABFS), the
    * same contract Delta's LogStore documents. A rename that fails with
    * NO competing marker is a filesystem fault and throws rather than
    * spinning. */
  private def commitLoop(spark: SparkSession, table: String, unique: String,
      commitKey: Option[String], compacts: Option[Long], schemaDdl: String,
      cleanupOnKeyLoss: Boolean,
      snapshot: Option[Seq[Commit]] = None,
      enforceSchema: Boolean = false,
      allowEvolution: Boolean = false,
      requireBase: Option[Long] = None,
      rewriteOnlyConflict: Boolean = false,
      op: Option[String] = None,
      statsJson: Option[String] = None,
      // dir-granular selective rewrite (OPTIMIZE WHERE): base names of
      // the live dirs whose content this commit's dir now carries —
      // liveEntries drops them once this commit lands
      replaces: Seq[String] = Nil,
      // COPY INTO's loaded-source-file identities for this commit
      copied: Seq[String] = Nil,
      // None = inherit the latest commit's constraint set (every normal
      // commit); Some(x) = set it to x (add/dropConstraint)
      newConstraints: Option[Option[String]] = None,
      // when set, abort (cleaning up) if the latest constraint set is not
      // the one the caller validated its rows against — closes the race
      // where an append straddles a concurrent ADD CONSTRAINT
      enforcedConstraints: Option[Option[String]] = None,
      // None = inherit the latest commit's column mapping; Some(x) = set
      // it (rename/drop column, mapping-extending evolution append)
      newMapping: Option[Option[String]] = None,
      // when set, abort if the latest mapping differs from the one the
      // caller baked into its data files' physical column names
      enforcedMapping: Option[Option[String]] = None,
      // generated-column expressions: inherit / set / abort-on-change,
      // same protocol as constraints
      newGenerated: Option[Option[String]] = None,
      enforcedGenerated: Option[Option[String]] = None,
      // table properties (TBLPROPERTIES): inherit commit-to-commit like
      // constraints; set by SET/UNSET TBLPROPERTIES metadata commits
      newProps: Option[Option[String]] = None,
      // when set, abort (retryably) if the latest props payload is not
      // the one the caller derived its newProps from — the identity
      // allocator's conflict scope: ONLY a concurrent props change
      // (another allocation, SET TBLPROPERTIES) invalidates it, so
      // compactions and plain appends never starve identity appends
      enforcedProps: Option[Option[String]] = None,
      // keep the staged dir when a governance/schema abort throws: a
      // multi-table transaction's dir is named by its `_txn` manifest,
      // and recovery needs the BYTES to re-validate and roll forward —
      // deleting them turns a retryable abort into an unrecoverable txn
      preserveOnAbort: Boolean = false): Option[Long] = {
    val f = fs(spark, commitDir(table))
    f.mkdirs(new Path(commitDir(table)))
    // key travels base64'd: raw interpolation would corrupt the marker on
    // a quote-bearing key, and the [^"]+ reader would drop an empty key —
    // both silently breaking exactly-once dedup
    val keyField = commitKey.map(k => s""","keyB64":"${
      Base64.getEncoder.encodeToString(k.getBytes(StandardCharsets.UTF_8))}"""")
      .getOrElse("")
    val compField = compacts.map(c => s""","compacts":$c""").getOrElse("") +
      op.map(o => s""","op":"$o"""").getOrElse("") +
      // stats travel base64'd like schema/key — the nested JSON would
      // otherwise defeat the marker's flat field regexes
      statsJson.map(st => s""","statsB64":"${
        Base64.getEncoder.encodeToString(st.getBytes(StandardCharsets.UTF_8))}"""")
        .getOrElse("") +
      (if (replaces.isEmpty) "" else s""","replacesB64":"${
        Base64.getEncoder.encodeToString(
          replaces.mkString(",").getBytes(StandardCharsets.UTF_8))}"""") +
      (if (copied.isEmpty) "" else s""","copiedB64":"${
        Base64.getEncoder.encodeToString(
          copied.mkString("\n").getBytes(StandardCharsets.UTF_8))}"""") +
      // commit annotation (Delta's userMetadata UX: a session conf so
      // every write path — API, SQL, streaming — carries it uniformly)
      spark.conf.getOption("spark.graft.commitInfo.userMetadata")
        .filter(_.nonEmpty).map(m => s""","userMetaB64":"${
          Base64.getEncoder.encodeToString(
            m.getBytes(StandardCharsets.UTF_8))}"""").getOrElse("")
    def b64enc(s: String): String =
      Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
    var reuse = snapshot // first attempt only; retries re-read under the lock
    // the marker body of the most recent successful claim, carried out
    // of the claim block for the post-claim validation/checkpoint path
    var claimedBody: Array[Byte] = null
    while (true) {
      val claimed: Option[Option[Long]] = // None=retry, Some(None)=key lost
        VersionedParquetSink.localClaimLock.synchronized {
          val fromSnapshot = reuse.isDefined
          val entries = reuse.getOrElse(manifest(spark, table))
          reuse = None
          if (commitKey.exists(k => entries.exists(_.key.contains(k)))) {
            Some(None)
          } else if (requireBase.exists { b =>
              // Stale-snapshot aborts (Delta's ConcurrentWriteException;
              // callers retry from a fresh snapshot):
              //  - delete/merge conflict with ANY newer commit — a stale
              //    data-dependent rewrite would silently drop an
              //    intervening append's rows or resurrect deleted ones;
              //  - compact (rewriteOnlyConflict) conflicts only with a
              //    newer REWRITE — appends stay visible past a compaction
              //    (liveEntries keeps version > compacts), but committing
              //    a compaction derived from a pre-delete snapshot would
              //    shadow the delete ("last compaction wins" in
              //    liveEntries) and resurrect its rows. A newer DELETION
              //    VECTOR conflicts the same way: the compaction's new
              //    file paths would orphan the DV's (path, pos) refs and
              //    silently resurrect the masked rows.
              // a selective rewrite (replaces.nonEmpty) conflicts like a
              // full one: committing a fold derived from a snapshot that
              // predates another fold of the SAME dirs would duplicate
              // every overlapping row (both folded copies stay live)
              if (rewriteOnlyConflict)
                entries.exists(e => e.version > b &&
                  (e.compacts.isDefined || e.replaces.nonEmpty ||
                    VersionedParquetSink.isMergeOnRead(e)))
              else entries.lastOption.map(_.version).getOrElse(-1L) != b
            }) {
            f.delete(new Path(s"${tableDir(table)}/$unique"), true)
            throw new VersionedParquetSink.ConcurrentRewriteException(
              table, requireBase.get,
              entries.lastOption.map(_.version).getOrElse(-1L))
          } else if (enforcedProps.exists(p =>
              entries.lastOption.flatMap(_.props) != p)) {
            // honor preserveOnAbort like the adjacent governance-abort
            // branches: a multi-table-transaction caller relies on the
            // staged dir surviving the abort for recovery
            if (!preserveOnAbort)
              f.delete(new Path(s"${tableDir(table)}/$unique"), true)
            throw new VersionedParquetSink.ConcurrentRewriteException(
              table, requireBase.getOrElse(-1L),
              entries.lastOption.map(_.version).getOrElse(-1L))
          } else if (enforcedConstraints.exists(c =>
              entries.lastOption.flatMap(_.constraints) != c)) {
            if (!preserveOnAbort)
              f.delete(new Path(s"${tableDir(table)}/$unique"), true)
            throw new IllegalStateException(
              s"CHECK constraints on '$table' changed while this append " +
                "was validating against the old set; retry the append")
          } else if (enforcedMapping.exists(m =>
              entries.lastOption.flatMap(_.mapping) != m)) {
            if (!preserveOnAbort)
              f.delete(new Path(s"${tableDir(table)}/$unique"), true)
            throw new IllegalStateException(
              s"column mapping on '$table' changed while this write baked " +
                "physical column names from the old mapping; retry")
          } else if (enforcedGenerated.exists(g =>
              entries.lastOption.flatMap(_.generated) != g)) {
            if (!preserveOnAbort)
              f.delete(new Path(s"${tableDir(table)}/$unique"), true)
            throw new IllegalStateException(
              s"generated columns on '$table' changed while this write " +
                "computed/validated against the old expressions; retry")
          } else {
            // Re-check the schema whenever the manifest was re-read: a
            // commit that slipped in since the caller's snapshot may have
            // changed the table schema, and claiming past it would let
            // two concurrent appends with different schemas both land
            // (the mixed-schema table the check exists to prevent). The
            // snapshot path needs no re-check — claiming snapshot-latest+1
            // atomically fails if ANY commit intervened.
            if (enforceSchema && !fromSnapshot) {
              try SchemaCheck.enforceAppend(table,
                entries.lastOption.flatMap(_.schemaDdl).map(StructType.fromDDL),
                StructType.fromDDL(schemaDdl), allowEvolution)
              catch { case e: Throwable =>
                if (!preserveOnAbort)
                  f.delete(new Path(s"${tableDir(table)}/$unique"), true)
                throw e
              }
            }
            val attempt = entries.lastOption.map(_.version + 1).getOrElse(0L)
            // A compaction's DDL must be the LATEST committed DDL, not
            // its caller's snapshot: a schema-evolution append racing
            // past the compaction's base is non-conflicting (its data
            // dir stays in the scan set), but committing the snapshot's
            // pre-evolution DDL on top of it would make every later
            // reader project the evolved column away — silent column
            // loss. The folded rows simply read the evolved column as
            // null, exactly like any pre-evolution file. delete/merge
            // never get here stale (requireBase aborts on ANY newer
            // commit), so using the latest DDL is correct for every
            // rewrite.
            val effectiveDdl =
              if (rewriteOnlyConflict)
                entries.lastOption.flatMap(_.schemaDdl).getOrElse(schemaDdl)
              else schemaDdl
            // constraints travel commit-to-commit like schema: inherit
            // the latest set unless this commit explicitly changes it
            val effConstraints: Option[String] = newConstraints
              .getOrElse(entries.lastOption.flatMap(_.constraints))
            val consField = effConstraints.map(c =>
              s""","constraintsB64":"${b64enc(c)}"""").getOrElse("")
            // column mapping inherits commit-to-commit like constraints
            val effMapping: Option[String] = newMapping
              .getOrElse(entries.lastOption.flatMap(_.mapping))
            val mapField = effMapping.map(m =>
              s""","mappingB64":"${b64enc(m)}"""").getOrElse("")
            val effGenerated: Option[String] = newGenerated
              .getOrElse(entries.lastOption.flatMap(_.generated))
            val genField = effGenerated.map(g =>
              s""","gensB64":"${b64enc(g)}"""").getOrElse("")
            val effProps: Option[String] = newProps
              .getOrElse(entries.lastOption.flatMap(_.props))
            val propsField = effProps.map(p =>
              s""","propsB64":"${b64enc(p)}"""").getOrElse("")
            // The claim itself is the coordinator's publish-if-absent
            // (temp-write + atomic rename here; conditional PUT on
            // object stores): the FULL body lands atomically, so an
            // EMPTY marker is never visible — readers would throw on
            // one and a same-key committer would double-commit. The
            // coordinator throws (not "lost") when the store fails in
            // a way a competing marker cannot explain.
            val marker = new Path(s"${commitDir(table)}/$attempt.commit")
            val body =
              s"""{"version":$attempt,"dir":"$unique"$keyField$compField$consField$mapField$genField$propsField,"schemaB64":"${b64enc(effectiveDdl)}","ts":"${java.time.Instant.now}"}"""
                .getBytes(StandardCharsets.UTF_8)
            if (coordinator.publishIfAbsent(f, marker, body)) {
              claimedBody = body
              Some(Some(attempt))
            } else None // lost the race; retry at the next version
          }
        }
      claimed match {
        case Some(Some(v)) =>
          // Phantom-claim guard (found by the log-retention soak): a
          // writer holding a STALE snapshot computes attempt =
          // stale_latest + 1; normally that version's marker exists and
          // the rename is blocked, but vacuumLog may have RETIRED it
          // (it sits behind the checkpoint horizon) — the rename then
          // succeeds and mints a marker manifest() filters out, i.e. a
          // commit that silently never happened. Validate the claim is
          // actually visible; if not, undo the marker and retry from a
          // fresh manifest. The validation read is the same manifest()
          // the mirror sync needs, so the healthy path pays nothing.
          val after = manifest(spark, table)
          val inListing = after.exists(e => e.version == v && e.dir == unique)
          // LIST-lag fallback (object stores whose listing trails PUTs —
          // the pre-2020 S3 shape the conditional-PUT coordinator
          // emulation injects): the listing may simply not include the
          // marker we JUST published. A point read of the exact marker
          // path is read-after-write consistent on every store in the
          // CommitCoordinator mapping; the true phantom case (we
          // re-minted a version vacuumLog retired) is distinguished by
          // the checkpoint HORIZON — but NOT the horizon of the same
          // lagged listing (ADVICE r12): a covering checkpoint written
          // just before the stale claim is itself lag-hidden, and
          // retention bounds MARKER age, not checkpoint age. So the
          // horizon is read from a listing proven MONOTONE past our own
          // PUT: lag is mtime-monotone (once listed, always listed;
          // LagListFileSystem documents the model), so a listing that
          // contains the marker we just wrote contains every file put
          // before it — a fresh covering checkpoint cannot hide. The
          // wait is bounded by the declared store lag
          // (graft.store.maxListLag, enforced against retention by
          // vacuumLog); past the bound we fall back to the freshest
          // horizon, which the retention guard makes sound for any
          // correctly-declared store.
          val visible = inListing || {
            markerOwned(spark, table, v, unique) && {
              val lagBound = storeMaxListLagMs(spark, table, Some(after))
              val deadline = System.currentTimeMillis() +
                math.max(lagBound, 2000L)
              var decided: Option[Boolean] = None
              while (decided.isEmpty) {
                val names = commitDirNames(spark, table)
                val horizon = names.filter(_.endsWith(".checkpoint"))
                  .map(_.stripSuffix(".checkpoint").toLong)
                  .sorted.lastOption
                if (names.contains(s"$v.commit") ||
                    System.currentTimeMillis() >= deadline)
                  decided = Some(horizon.forall(v > _))
                else Thread.sleep(25L)
              }
              decided.get
            }
          }
          if (!visible) {
            f.delete(new Path(s"${commitDir(table)}/$v.commit"), false)
          } else {
            maybeCheckpoint(spark, table, v,
              selfRaw = Some(new String(claimedBody, StandardCharsets.UTF_8)))
            // external interop: mirror the commit (and any gap a crashed
            // writer left) into _delta_log; best-effort, never throws
            DeltaLogMirror.sync(spark, tableDir(table), after)
            return Some(v)
          }
        case Some(None) =>
          if (cleanupOnKeyLoss)
            f.delete(new Path(s"${tableDir(table)}/$unique"), true)
          return None
        case None => () // re-read manifest and try the next version
      }
    }
    None // unreachable
  }

  /** Snapshot the manifest into `<v>.checkpoint` on the deterministic
    * grid (every `checkpointInterval`-th version) — a pure function of v,
    * so the uncontended commit path pays NO extra listing to decide.
    * Losing the checkpoint rename race is harmless — someone else
    * snapshotted; a writer crashing before its checkpoint just defers to
    * the next grid point. */
  private def maybeCheckpoint(spark: SparkSession, table: String, v: Long,
      selfRaw: Option[String] = None): Unit = {
    if (v % checkpointInterval != checkpointInterval - 1) return
    val f = fs(spark, commitDir(table))
    // entries may still be mid-race-sparse (a writer between marker and
    // rename); checkpoint only what is durably visible NOW — EXCEPT the
    // checkpointer's OWN just-committed entry, which a lagged LIST may
    // not return yet (conditional-PUT stores): writing a checkpoint at
    // v WITHOUT v's own line would make manifest() filter v's marker
    // out of the tail (tail keeps only versions > checkpoint), silently
    // losing the commit — so the claimant passes its own body and we
    // splice it in. Under mtime-monotone list lag this keeps the
    // snapshot gap-free: claims are listing-gated (you can only claim v
    // after LISTING v-1), so a listing that includes v-1 includes every
    // older version too; v itself is the only possibly-hidden entry.
    var entries = manifest(spark, table).filter(_.version <= v)
    if (!entries.exists(_.version == v)) selfRaw match {
      case Some(raw) => entries = entries :+ parseCommit(v, raw)
      case None => return // never snapshot a horizon that hides v itself
    }
    val body = entries.map(_.raw).mkString("", "\n", "\n")
    val tmp = new Path(s"${commitDir(table)}/.cptmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, new Path(s"${commitDir(table)}/$v.checkpoint")))
      f.delete(tmp, false)
  }

  /** Raw file names in the commit dir — the claim-validation loop's
    * repeated cheap listing (no marker-body reads). */
  private def commitDirNames(spark: SparkSession,
      table: String): Seq[String] = {
    val dir = new Path(commitDir(table))
    val f = fs(spark, commitDir(table))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
  }

  /** The declared worst-case LIST lag of the underlying store, in ms:
    * TBLPROPERTIES `graft.store.maxListLag` wins, then the session conf
    * `spark.graft.store.maxListLag`, default `0s` (strong LIST — local
    * filesystems, HDFS, and post-2020 S3). Duration strings in Spark's
    * time-string shape (`0s`, `5m`, `1h`). This is the bound
    * [[vacuumLog]] enforces retention against and the claim-validation
    * loop waits out before trusting a listing's checkpoint horizon. */
  private def storeMaxListLagMs(spark: SparkSession, table: String,
      entries: Option[Seq[Commit]] = None): Long = {
    val props = VersionedParquetSink.Constraints.parse(
      entries.getOrElse(manifest(spark, table))
        .lastOption.flatMap(_.props)).toMap
    props.get("graft.store.maxListLag")
      .orElse(spark.conf.getOption("spark.graft.store.maxListLag"))
      .map(org.apache.spark.network.util.JavaUtils.timeStringAsMs)
      .getOrElse(0L)
  }

  /** Point read of version `v`'s marker: does it exist and carry OUR
    * data dir? Read-after-write consistent on local filesystems and on
    * every object store in the [[CommitCoordinator]] mapping — the
    * LIST-lag-proof form of "is my claim visible". */
  private def markerOwned(spark: SparkSession, table: String, v: Long,
      unique: String): Boolean =
    try readSmallFile(spark, s"${commitDir(table)}/$v.commit")
      .contains(s""""dir":"$unique"""")
    catch { case _: java.io.FileNotFoundException => false }

  /** OPTIMIZE: rewrite every live data directory into ONE compacted
    * directory and commit it as the next version. Readers at or past the
    * compaction version scan one directory (plus any appends that raced
    * in); pre-compaction markers and data dirs are kept, so
    * `readAt(olderVersion)` still time-travels. Returns the compaction's
    * version number.
    *
    * @param targetFiles optional file count for the compacted dir (e.g.
    *   `Some(1)` collapses a micro-batch dir-per-append history into a
    *   single file; None keeps the current partitioning — at 100 TB you
    *   coalesce to size, not to one file).
    * @param commitKey optional idempotency key: a REPLAYED maintenance
    *   run (e.g. a crash-recovered streaming batch) with a key already in
    *   the manifest skips the whole-table rewrite and returns the
    *   original compaction's version — without it, every replay would
    *   re-copy the entire table into yet another directory. */
  def compact(spark: SparkSession, table: String,
      targetFiles: Option[Int] = None,
      commitKey: Option[String] = None): Long = {
    // retry on rewrite-conflict aborts: a compaction that loses to a
    // concurrent delete/merge/compaction re-derives from the fresh
    // snapshot (concurrent APPENDS never abort it — they stay visible
    // past the compaction's high-water mark)
    retryingRewrite(spark, table, "compact", commitKey) { entries =>
      // OPTIMIZE on a clustered table re-clusters (Delta's behavior for
      // clustered tables: no ZORDER BY clause needed)
      val cluster = clusterColumns(VersionedParquetSink.Constraints
        .parse(entries.lastOption.flatMap(_.props)).toMap)
      doCompact(spark, table, entries, commitKey,
        snap =>
          if (cluster.nonEmpty)
            ZOrder.zOrderedN(snap, cluster, targetFiles.getOrElse(8))
          else targetFiles.fold(snap)(n => snap.coalesce(n)))
    }
  }

  /** OPTIMIZE ... ZORDER BY (Delta parity): a compaction whose folded
    * output is Morton-clustered on `cols` ([[ZOrder.zOrderedN]]), so
    * the compacted files carry TIGHT per-file min/max on every named
    * column and the sink's stats pruning (and any external reader of
    * the mirrored add-action stats) skips files for predicates on any
    * of them. Content-preserving like [[compact]] — CDF/streaming
    * consumers skip it, time travel below it still resolves — with the
    * same serializable conflict rules and keyed replay. */
  def optimizeZOrder(spark: SparkSession, table: String,
      cols: Seq[String], numFiles: Int = 8,
      commitKey: Option[String] = None): Long = {
    require(cols.nonEmpty, "optimizeZOrder requires at least one column")
    retryingRewrite(spark, table, "compact", commitKey)(entries =>
      doCompact(spark, table, entries, commitKey,
        snap => ZOrder.zOrderedN(snap, cols, numFiles)))
  }

  /** OPTIMIZE ... WHERE (Delta's selective OPTIMIZE): fold ONLY the live
    * data directories whose per-file min/max stats say they MAY hold
    * rows matching `condition` — at 100 TB the difference between
    * rewriting the whole table and rewriting yesterday's micro-batch
    * dirs. Content-preserving like [[compact]] (compacting a stats
    * superset is always safe), same serializable conflict rules and
    * keyed replay; time travel below it still resolves, CDF/streaming
    * consumers skip it.
    *
    * Mechanics: the commit carries a `replaces` list (the folded dirs'
    * base names) instead of a `compacts` watermark, so NON-matching
    * dirs stay live untouched — [[VersionedParquetSink.liveEntries]]
    * drops exactly the replaced dirs. Live DV masks over the folded
    * dirs are materialized into the fold (masks over untouched dirs
    * stay live and keep applying); merge-on-read commits are never
    * folded (their `_dv/` masks must keep applying to OTHER dirs).
    * A dir without stats conservatively matches. Selecting fewer than
    * two dirs commits nothing (there is nothing to fold) and returns
    * the current version.
    *
    * `zorderBy` non-empty gives Delta's `OPTIMIZE ... WHERE ... ZORDER
    * BY`: the folded output is Morton-clustered so the new files carry
    * tight per-column ranges for the sink's stats pruning. */
  def compactWhere(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column,
      targetFiles: Option[Int] = None,
      zorderBy: Seq[String] = Nil,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "compact", commitKey) { entries =>
      val baseV = entries.last.version
      val live = liveEntries(entries)
      // foldable = plain data commits (appends and earlier selective
      // folds). The newest FULL compaction keeps its watermark role;
      // merge-on-read dirs carry masks that must keep applying.
      val foldable = live.filter(e =>
        e.compacts.isEmpty && !VersionedParquetSink.isMergeOnRead(e))
      val logical = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
        StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        entries.lastOption.flatMap(_.mapping))
      val physSchema = logical.map(
        VersionedParquetSink.ColumnMapping.physicalSchema(_, mapping))
      val pred = logical.flatMap(
          FileStats.resolvePredicate(spark, _, condition))
        .map(_.transform {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
              if mapping.nonEmpty =>
            a.withName(VersionedParquetSink.ColumnMapping
              .physicalName(mapping, a.name))
        })
      val selected = foldable.filter { e =>
        (e.stats, pred, physSchema) match {
          case (Some(json), Some(p), Some(sc)) =>
            FileStats.parse(json).exists {
              case (_, pf) => FileStats.mayMatch(p, sc, pf) }
          case _ => true // no stats / unresolvable predicate: may match
        }
      }
      if (selected.size < 2) baseV // nothing to fold; no commit
      else foldSelected(spark, table, entries, selected, Nil,
        targetFiles, zorderBy, commitKey)
    }

  /** REORG TABLE ... APPLY (PURGE) (Delta parity): materialize every
    * live deletion-vector mask by folding ONLY the data dirs the masks
    * target (plus merge-on-read update dirs, whose `_dv/` masks ride
    * their data), and RETIRE every mask-carrying commit via the fold's
    * `replaces` list — after the purge no reader pays the mask
    * anti-join, and the `_delta_log` mirror's unmaterialized-DV lag
    * clears. Cost ∝ masked data, never table size (the point of REORG
    * vs full OPTIMIZE). No live masks: no commit, returns the current
    * version. Content-preserving; same conflict/replay rules as
    * [[compactWhere]]. */
  def reorgPurge(spark: SparkSession, table: String,
      targetFiles: Option[Int] = None,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "compact", commitKey) { entries =>
      val baseV = entries.last.version
      val live = liveEntries(entries)
      val dvs = live.filter(VersionedParquetSink.isMergeOnRead)
      if (dvs.isEmpty) baseV
      else {
        // dirs targeted by any live mask (bounded: masks are position
        // lists; the distinct-dir projection is tiny)
        val maskDirs = dvs.map(e => VersionedParquetSink.resolveDir(
          tableDir(table), VersionedParquetSink.maskDir(e)))
        val targeted: Set[String] = spark.read
          .schema("path STRING, pos BIGINT").parquet(maskDirs: _*)
          .select(org.apache.spark.sql.functions
            .expr("split_part(path, '/', 1)").as("d"))
          .distinct().collect().map(_.getString(0)).toSet
        // fold: data-bearing live dirs the masks target (the newest
        // full compaction included — its watermark role survives the
        // dir replacement) + every update commit's own data dir
        val folded = live.filter(e =>
          !VersionedParquetSink.isDv(e) &&
            (targeted.contains(e.dir.split('/').last) ||
              e.op.contains("update")))
        val pureDvDirs = dvs.filter(VersionedParquetSink.isDv)
          .map(_.dir.split('/').last)
        if (folded.nonEmpty)
          // retire ALL mask commits: every mask's targets are in the fold
          foldSelected(spark, table, entries, folded, pureDvDirs,
            targetFiles, Nil, commitKey)
        else {
          // every live mask targets only already-replaced dirs (stale
          // no-op masks): nothing to rewrite — commit an EMPTY data dir
          // whose replaces list retires the mask commits, so readers
          // stop paying the anti-join
          val unique = s"d-${UUID.randomUUID()}"
          fs(spark, tableDir(table))
            .mkdirs(new Path(s"${tableDir(table)}/$unique"))
          commitLoop(spark, table, unique, commitKey, compacts = None,
            schemaDdl = entries.lastOption.flatMap(_.schemaDdl)
              .getOrElse(readAt(spark, table, baseV).schema.toDDL),
            cleanupOnKeyLoss = true,
            requireBase = Some(baseV), rewriteOnlyConflict = true,
            op = Some("compact"), statsJson = None,
            replaces = pureDvDirs)
            .orElse(commitKey.flatMap(k =>
              manifest(spark, table).find(_.key.contains(k)).map(_.version)))
            .getOrElse(throw new IllegalStateException(
              s"reorg purge of $table lost the commit race with no " +
                "keyed winner"))
        }
      }
    }

  /** Shared selective-fold body: scan `folded`'s dirs physically, apply
    * every live mask, lay out, and commit with
    * `replaces = folded ++ alsoReplaces`. */
  private def foldSelected(spark: SparkSession, table: String,
      entries: Seq[Commit], folded: Seq[Commit],
      alsoReplaces: Seq[String], targetFiles: Option[Int],
      zorderBy: Seq[String], commitKey: Option[String]): Long = {
    val baseV = entries.last.version
    val live = liveEntries(entries)
    val logical = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
      StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val physSchema = logical.map(
      VersionedParquetSink.ColumnMapping.physicalSchema(_, mapping))
    val dirs = folded.map(e =>
      VersionedParquetSink.resolveDir(tableDir(table), e.dir))
    // scan PHYSICAL (write stays physical — no mapping round-trip);
    // pre-evolution files read the later columns as null
    val plain = physSchema match {
      case Some(sc) => spark.read.schema(sc).parquet(dirs: _*)
      case None => spark.read.parquet(dirs: _*)
    }
    val dvs = live.filter(VersionedParquetSink.isMergeOnRead)
    val content =
      if (dvs.isEmpty) plain
      else applyDvMask(spark, table, withPosCols(spark, table, plain),
        dvs).drop("__dv_path", "__dv_pos")
    val out =
      if (zorderBy.nonEmpty)
        ZOrder.zOrderedN(content, zorderBy, targetFiles.getOrElse(8))
      else targetFiles.fold(content)(n => content.coalesce(n))
    val unique = s"d-${UUID.randomUUID()}"
    out.write.mode(SaveMode.ErrorIfExists)
      .parquet(s"${tableDir(table)}/$unique")
    commitLoop(spark, table, unique, commitKey, compacts = None,
      schemaDdl = entries.lastOption.flatMap(_.schemaDdl)
        .getOrElse(out.schema.toDDL),
      cleanupOnKeyLoss = true,
      requireBase = Some(baseV), rewriteOnlyConflict = true,
      op = Some("compact"),
      statsJson = Some(FileStats.collect(spark,
        s"${tableDir(table)}/$unique",
        physSchema.getOrElse(out.schema))),
      replaces = folded.map(_.dir.split('/').last) ++ alsoReplaces)
      .orElse(commitKey.flatMap(k =>
        manifest(spark, table).find(_.key.contains(k)).map(_.version)))
      .getOrElse(throw new IllegalStateException(
        s"selective compaction of $table lost the commit race with " +
          "no keyed winner"))
  }

  private def doCompact(spark: SparkSession, table: String,
      entries: Seq[Commit], commitKey: Option[String],
      layout: DataFrame => DataFrame): Long = {
    val maxV = entries.last.version
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val snap = readAt(spark, table, maxV)
    val out = layout(snap)
    val unique = s"d-${UUID.randomUUID()}"
    toPhysical(out, mapping).write.mode(SaveMode.ErrorIfExists)
      .parquet(s"${tableDir(table)}/$unique")
    // `compacts = maxV` records exactly which versions were folded in —
    // an append that commits while the rewrite runs gets a version > maxV
    // and stays visible alongside the compacted dir.
    commitLoop(spark, table, unique, commitKey, compacts = Some(maxV),
      schemaDdl = entries.lastOption.flatMap(_.schemaDdl)
        .getOrElse(snap.schema.toDDL),
      cleanupOnKeyLoss = true, // same-key racer won: drop our rewrite
      requireBase = Some(maxV), rewriteOnlyConflict = true,
      op = Some("compact"),
      statsJson = Some(FileStats.collect(spark,
        s"${tableDir(table)}/$unique",
        VersionedParquetSink.ColumnMapping
          .physicalSchema(snap.schema, mapping))))
      .orElse(commitKey.flatMap(k =>
        manifest(spark, table).find(_.key.contains(k)).map(_.version)))
      .getOrElse(throw new IllegalStateException(
        s"compaction of $table lost the commit race with no keyed winner"))
    // NOT latestVersion(): an append racing past the compaction would
    // otherwise be reported as "the compaction's version"
  }

  /** DELETE (Delta `DELETE FROM t WHERE cond` parity): copy-on-write —
    * rewrites the live snapshot minus the matching rows and commits it as
    * a rewrite version (pre-delete versions stay time-travelable). Rows
    * where `condition` is TRUE are deleted; rows where it is false or
    * NULL are kept (SQL DELETE semantics). Returns the committed version.
    *
    * Isolation: SERIALIZABLE for data-changing operations — the commit
    * aborts and retries from a fresh snapshot if ANY commit (append or
    * rewrite) lands after the snapshot it was derived from, so a racing
    * append's rows are never silently dropped. `commitKey` makes a
    * replayed maintenance run a no-op returning the original version.
    *
    * Scale note: commit-dir-granular copy-on-write — one distributed
    * filter + rewrite of the live set. Delta narrows the rewrite to the
    * FILES whose min/max stats may match the predicate; the equivalent
    * lever here is partitioning the table (ParquetTableSink hive layout)
    * so deletes rewrite only matching partitions. */
  def delete(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column,
      commitKey: Option[String] = None): Long =
    rewriteWith(spark, table, "delete", commitKey,
      snap => snap.filter(!coalesce(condition, lit(false))))

  /** DELETE via a deletion vector (Delta's merge-on-read DVs): instead of
    * rewriting the live set, commits a parquet of `(path, pos)` row
    * positions — the rows where `condition` is TRUE — and every reader
    * anti-joins the mask. Deleting 3 rows from a 100 TB table writes
    * kilobytes; [[delete]]'s copy-on-write would rewrite the table. The
    * read-side cost is a (normally broadcast) anti-join per scan, paid
    * until a [[compact]] / [[delete]] / [[merge]] materializes the mask
    * into plain files (all three derive from [[readAt]], which applies
    * DVs, and their `compacts` watermark then retires the DV commits).
    *
    * Same SQL DELETE null semantics and serializable isolation as
    * [[delete]]: aborts and retries from a fresh snapshot if ANY commit
    * lands after the snapshot the positions were computed from (a stale
    * mask could miss a racing append's matching rows), and a concurrent
    * compaction aborts when it would orphan this mask's file refs.
    * Masks stack: a second DV delete masks additional positions; the
    * union applies. Row positions come from the parquet reader's
    * `_metadata.row_index`, exact for the sink's immutable files.
    * Returns the committed version; `commitKey` replays idempotently. */
  def deleteVectored(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column,
      commitKey: Option[String] = None): Long =
    maskCommit(spark, table, commitKey,
      snap => snap.filter(coalesce(condition, lit(false))))

  /** [[deleteMatching]] (the GDPR/right-to-erasure shape) as a deletion
    * vector: masks every row whose `keyCols` match a `keys` row via a
    * DISTRIBUTED semi-join — the key list can be table-sized, nothing
    * collects, and no data file is rewritten. */
  def deleteMatchingVectored(spark: SparkSession, table: String,
      keys: DataFrame, keyCols: Seq[String],
      commitKey: Option[String] = None): Long = {
    require(keyCols.nonEmpty,
      "deleteMatchingVectored requires at least one key column")
    maskCommit(spark, table, commitKey, snap =>
      snap.join(keys.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi"))
  }

  /** Shared DV-delete body: `matching` selects the doomed rows from the
    * position-annotated masked snapshot; their positions become the new
    * mask commit. */
  private def maskCommit(spark: SparkSession, table: String,
      commitKey: Option[String],
      matching: DataFrame => DataFrame): Long =
    retryingRewrite(spark, table, "dv", commitKey) { entries =>
      val baseV = entries.last.version
      val dv = matching(readAtPos(spark, table, baseV, keepPos = true))
        .select(col("__dv_path").as("path"), col("__dv_pos").as("pos"))
      val unique = s"d-${UUID.randomUUID()}"
      // globally sorted by (path, pos): executor-side mask resolution
      // (GraftMasks.positionsFor) filters on path, and sortedness turns
      // that into parquet row-group skipping
      dv.sort("path", "pos").write.mode(SaveMode.ErrorIfExists)
        .parquet(s"${tableDir(table)}/$unique")
      commitLoop(spark, table, unique, commitKey,
        compacts = None,
        schemaDdl = entries.last.schemaDdl.getOrElse(
          readAt(spark, table, baseV).schema.toDDL),
        cleanupOnKeyLoss = true, requireBase = Some(baseV),
        op = Some("dv"), statsJson = None)
        .orElse(commitKey.flatMap(k =>
          manifest(spark, table).find(_.key.contains(k)).map(_.version)))
        .getOrElse(throw new IllegalStateException(
          s"dv-delete of $table lost the commit race with no keyed winner"))
    }

  /** UPDATE via merge-on-read (Delta's DV-backed `UPDATE ... SET`):
    * rows where `condition` is TRUE get their old positions MASKED and
    * their updated images appended — in ONE commit whose dir carries
    * both payloads (new rows as top-level parquet; the mask under
    * `_dv/`, which the underscore convention hides from every data
    * listing, so the pairing is atomic with no marker format change).
    * Untouched files are never rewritten: updating 3 rows of a 100 TB
    * table writes the 3 new rows plus a kilobyte mask.
    *
    * `set` maps column name -> new-value expression (evaluated against
    * the matched rows, so expressions can reference existing columns);
    * every named column must exist — UPDATE never changes schema. Rows
    * where `condition` is false or NULL are untouched (SQL UPDATE
    * semantics). Serializable like [[deleteVectored]]; compaction
    * materializes and retires the mask the same way. Returns the
    * committed version. */
  def updateVectored(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      commitKey: Option[String] = None): Long = {
    require(set.nonEmpty, "updateVectored requires at least one SET column")
    retryingRewrite(spark, table, "update", commitKey) { entries =>
      val baseV = entries.last.version
      val snap = readAtPos(spark, table, baseV, keepPos = true)
      val dataCols = snap.columns
        .filterNot(c => c == "__dv_path" || c == "__dv_pos")
      set.keys.foreach(k => require(dataCols.contains(k),
        s"updateVectored: SET column '$k' does not exist in $table " +
          s"(${dataCols.mkString(", ")}); UPDATE never changes schema"))
      // matched drives both payloads — cache for the two writes
      val matched = snap.filter(coalesce(condition, lit(false))).cache()
      try {
        val unique = s"d-${UUID.randomUUID()}"
        val mapping = VersionedParquetSink.ColumnMapping.parse(
          entries.lastOption.flatMap(_.mapping))
        // generated columns: SET may not target one directly; their
        // values are RECOMPUTED after the update (Delta's rule — the
        // update may change their source columns)
        val gens = VersionedParquetSink.Constraints.parse(
          entries.lastOption.flatMap(_.generated))
        gens.foreach { case (g, _) => require(!set.contains(g),
          s"updateVectored: '$g' is a generated column of '$table'; " +
            "update its source columns instead") }
        val updated0 = set
          .foldLeft(matched) { case (df, (c, e)) => df.withColumn(c, e) }
        val schemaTypes = StructType.fromDDL(entries.last.schemaDdl
          .getOrElse(readAt(spark, table, baseV).schema.toDDL))
        val updated = gens.foldLeft(updated0) { case (df, (g, sql)) =>
          df.withColumn(g,
            org.apache.spark.sql.functions.expr(sql).cast(
              schemaTypes.fields.find(_.name == g).get.dataType))
        }
          .select(dataCols.map(col): _*)
        // updated images must still satisfy the CHECK constraints
        toPhysical(constraintGuard(updated,
          entries.lastOption.flatMap(_.constraints), table), mapping)
          .write.mode(SaveMode.ErrorIfExists)
          .parquet(s"${tableDir(table)}/$unique")
        matched
          .select(col("__dv_path").as("path"), col("__dv_pos").as("pos"))
          .sort("path", "pos") // row-group-skippable executor mask reads
          .write.mode(SaveMode.ErrorIfExists)
          .parquet(s"${tableDir(table)}/$unique/_dv")
        val ddl = entries.last.schemaDdl.getOrElse(
          readAt(spark, table, baseV).schema.toDDL)
        commitLoop(spark, table, unique, commitKey,
          compacts = None, schemaDdl = ddl,
          cleanupOnKeyLoss = true, requireBase = Some(baseV),
          op = Some("update"),
          statsJson = Some(FileStats.collect(spark,
            s"${tableDir(table)}/$unique",
            VersionedParquetSink.ColumnMapping.physicalSchema(
              StructType(StructType.fromDDL(ddl)
                .fields.map(_.copy(nullable = true))), mapping))))
          .orElse(commitKey.flatMap(k =>
            manifest(spark, table).find(_.key.contains(k)).map(_.version)))
          .getOrElse(throw new IllegalStateException(
            s"update of $table lost the commit race with no keyed winner"))
      } finally { matched.unpersist(); () }
    }
  }

  /** DELETE by key list (the GDPR/right-to-erasure shape): remove every
    * row whose `keyCols` match a row of `keys` — a DISTRIBUTED anti-join
    * rewrite, so the key list can itself be table-sized (a predicate
    * `isin` collapses at scale; this never collects). Same serializable
    * commit + replay semantics as [[delete]]. */
  def deleteMatching(spark: SparkSession, table: String, keys: DataFrame,
      keyCols: Seq[String], commitKey: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "deleteMatching requires at least one key column")
    rewriteWith(spark, table, "delete", commitKey, snap =>
      snap.join(keys.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti"))
  }

  /** MERGE/upsert (Delta `MERGE WHEN MATCHED UPDATE SET * WHEN NOT
    * MATCHED INSERT *` parity): every snapshot row whose `keyCols` match
    * an `updates` row is replaced by it; unmatched `updates` rows are
    * inserted. `updates` must carry the table's exact schema (evolution
    * via append first) and at most one row per key (ambiguous-merge
    * guard, same error Delta raises). Same serializable commit + replay
    * semantics as [[delete]]; returns the committed version.
    *
    * Scale shape: ONE left-anti join keyed on `keyCols` (broadcast when
    * `updates` is a trickle — the common CDC shape — else shuffle) plus a
    * union; nothing collects. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      keyCols: Seq[String], commitKey: Option[String] = None): Long =
    applyChanges(spark, table, updates,
      updates.select(keyCols.map(col): _*).limit(0), keyCols, commitKey)

  /** MERGE that also DELETES (Delta's `WHEN MATCHED THEN DELETE` arm in
    * the same statement): upsert every `upserts` row and remove every
    * row matching `deleteKeys`, in ONE serializable commit — a caller
    * needing both (e.g. incremental view maintenance) gets single-key
    * replay semantics instead of a crash window between two commits.
    * An upserted key also listed in `deleteKeys` ends up upserted (the
    * union applies after the anti-join). */
  def applyChanges(spark: SparkSession, table: String, upserts: DataFrame,
      deleteKeys: DataFrame, keyCols: Seq[String],
      commitKey: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "applyChanges requires at least one key column")
    // upserts is evaluated at least twice (dup-key guard + the rewrite,
    // which reads it for the anti-join AND the union) — cache it for the
    // duration unless the caller already did
    val preCached =
      upserts.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (!preCached) upserts.cache()
    try {
      val dupKeys = upserts.groupBy(keyCols.map(col): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dupKeys == 0,
        s"merge into '$table': updates carry duplicate rows for some " +
          s"(${keyCols.mkString(", ")}) key — ambiguous merge")
      val latest = manifest(spark, table).lastOption
      val cons = latest.flatMap(_.constraints)
      rewriteWith(spark, table, "merge", commitKey, { snap =>
        // generated columns: upserts may omit them (computed) or carry
        // them (validated per row) — same rules as append
        val completed = completeGenerated(upserts,
          latest.flatMap(_.generated), Some(snap.schema), table)
        SchemaCheck.enforceAppend(table, Some(snap.schema), completed.schema)
        val touched = upserts.select(keyCols.map(col): _*)
          .unionByName(deleteKeys.select(keyCols.map(col): _*))
          .distinct()
        // existing rows already satisfy the constraints; only the
        // incoming upserts need the guard
        snap.join(touched, keyCols, "left_anti")
          .unionByName(constraintGuard(
            completed.select(snap.columns.map(col): _*), cons, table))
      })
    } finally if (!preCached) { upserts.unpersist(); () }
  }

  /** The table's CHECK constraints (name -> SQL expression), empty if
    * none were ever added. */
  def constraintsOf(spark: SparkSession, table: String): Map[String, String] =
    VersionedParquetSink.Constraints.parse(
      manifest(spark, table).lastOption.flatMap(_.constraints)).toMap

  /** ALTER TABLE ADD CONSTRAINT (Delta CHECK-constraint parity): adds a
    * named SQL predicate that every FUTURE write must satisfy, after
    * validating that every EXISTING row already does (one distributed
    * scan, exactly like Delta). Constraint metadata travels in the
    * commit log, so it survives checkpoints, compaction, and time
    * travel; enforcement is a codegen'd per-row guard fused into each
    * write's own pass — no extra validation job per append. NULL
    * evaluations pass (SQL CHECK semantics). Serializable: aborts and
    * retries if any commit races the validation, and a concurrent
    * append that validated against the OLD set aborts at its claim.
    * Returns the metadata commit's version. */
  def addConstraint(spark: SparkSession, table: String, name: String,
      sqlExpr: String, commitKey: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.expr
    retryingRewrite(spark, table, "constraint", commitKey) { entries =>
      val baseV = entries.last.version
      val existing = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.constraints))
      require(!existing.exists(_._1 == name),
        s"constraint '$name' already exists on '$table'")
      val snap = readAt(spark, table, baseV)
      val bad = snap.filter(!coalesce(expr(sqlExpr), lit(true))).limit(1).count()
      require(bad == 0,
        s"cannot add CHECK constraint '$name' to '$table': existing rows " +
          s"violate ($sqlExpr)")
      commitMetadata(spark, table, commitKey, baseV, snap.schema,
        Some(VersionedParquetSink.Constraints.render(
          existing :+ (name -> sqlExpr))))
    }
  }

  /** ALTER TABLE DROP CONSTRAINT: removes a named CHECK constraint via a
    * metadata commit. Throws if the name is unknown. */
  def dropConstraint(spark: SparkSession, table: String, name: String,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "constraint", commitKey) { entries =>
      val baseV = entries.last.version
      val existing = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.constraints))
      require(existing.exists(_._1 == name),
        s"no constraint '$name' on '$table' " +
          s"(have: ${existing.map(_._1).mkString(", ")})")
      commitMetadata(spark, table, commitKey, baseV,
        readAt(spark, table, baseV).schema,
        Some(VersionedParquetSink.Constraints.render(
          existing.filterNot(_._1 == name))))
    }

  /** The table's TBLPROPERTIES (key -> value), empty if none were ever
    * set. Properties travel in the commit log like constraints, so they
    * survive checkpoints, compaction, and restore, and time travel sees
    * the set as of the pinned version. */
  def propertiesOf(spark: SparkSession, table: String): Map[String, String] =
    VersionedParquetSink.Constraints.parse(
      manifest(spark, table).lastOption.flatMap(_.props)).toMap

  /** ALTER TABLE SET TBLPROPERTIES: merges `props` into the current
    * set via a metadata-only commit (last writer wins per key).
    * Returns the commit's version. */
  def setProperties(spark: SparkSession, table: String,
      props: Map[String, String],
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "properties", commitKey) { entries =>
      val baseV = entries.last.version
      val merged = (VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.props)).toMap ++ props).toSeq
      commitMetadata(spark, table, commitKey, baseV,
        readAt(spark, table, baseV).schema, constraints = None,
        props = Some(VersionedParquetSink.Constraints.render(merged)),
        opName = "properties")
    }

  /** ALTER TABLE UNSET TBLPROPERTIES: removes `keys` (missing keys are
    * ignored, matching Spark's IF EXISTS-less default for V2 tables).
    * Returns the commit's version. */
  def unsetProperties(spark: SparkSession, table: String,
      keys: Seq[String], commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "properties", commitKey) { entries =>
      val baseV = entries.last.version
      val remaining = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.props))
        .filterNot(kv => keys.contains(kv._1))
      commitMetadata(spark, table, commitKey, baseV,
        readAt(spark, table, baseV).schema, constraints = None,
        props = Some(VersionedParquetSink.Constraints.render(remaining)),
        opName = "properties")
    }

  /** The table's generated columns (name -> SQL expression), empty if
    * none were ever declared. */
  def generatedColumnsOf(spark: SparkSession,
      table: String): Map[String, String] =
    VersionedParquetSink.Constraints.parse(
      manifest(spark, table).lastOption.flatMap(_.generated)).toMap

  /** Declare an EXISTING column as generated (Delta generated-column
    * parity, writer feature v4): every future write either omits the
    * column (it is computed from `sqlExpr` inside the write's own pass)
    * or provides values that a per-row null-safe equality guard
    * validates against the expression — Delta's exact write rules.
    * Existing rows are validated in one distributed scan before the
    * metadata commit lands (Delta only allows declaration at CREATE
    * TABLE; validating the backlog is the equivalent safety). The
    * expression may reference any non-generated column. Serializable;
    * a concurrent append that computed/validated against the old
    * expression set aborts at its claim. */
  def setGeneratedColumn(spark: SparkSession, table: String, name: String,
      sqlExpr: String, commitKey: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.expr
    retryingRewrite(spark, table, "generated", commitKey) { entries =>
      val baseV = entries.last.version
      val existing = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.generated))
      require(!existing.exists(_._1 == name),
        s"column '$name' of '$table' is already generated")
      val snap = readAt(spark, table, baseV)
      require(snap.columns.contains(name),
        s"no column '$name' in '$table' (${snap.columns.mkString(", ")})")
      val target = snap.schema.fields.find(_.name == name).get.dataType
      val bad = snap
        .filter(!(col(name) <=> expr(sqlExpr).cast(target))).limit(1).count()
      require(bad == 0,
        s"cannot declare '$name' generated on '$table': existing rows " +
          s"differ from ($sqlExpr)")
      commitMetadata(spark, table, commitKey, baseV, snap.schema,
        constraints = None,
        generated = Some(VersionedParquetSink.Constraints.render(
          existing :+ (name -> sqlExpr))),
        opName = "generated")
    }
  }

  /** Remove a column's generated-column declaration (the column and its
    * data stay; writes just stop computing/validating it). */
  def dropGeneratedColumn(spark: SparkSession, table: String, name: String,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "generated", commitKey) { entries =>
      val baseV = entries.last.version
      val existing = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.generated))
      require(existing.exists(_._1 == name),
        s"column '$name' of '$table' is not generated " +
          s"(generated: ${existing.map(_._1).mkString(", ")})")
      commitMetadata(spark, table, commitKey, baseV,
        readAt(spark, table, baseV).schema,
        constraints = None,
        generated = Some(VersionedParquetSink.Constraints.render(
          existing.filterNot(_._1 == name))),
        opName = "generated")
    }

  /** The table's column mapping (logical name -> physical name in the
    * parquet files), empty until the first rename/drop enables it. */
  def columnMappingOf(spark: SparkSession,
      table: String): Map[String, String] =
    VersionedParquetSink.ColumnMapping.parse(
      manifest(spark, table).lastOption.flatMap(_.mapping))
      .map { case (l, e) => l -> e.physical }.toMap

  /** ALTER TABLE RENAME COLUMN (Delta column-mapping parity): a
    * METADATA-ONLY commit — no data file is rewritten, ever. The first
    * rename enables `name`-mode column mapping: every column's physical
    * name (what the files carry) is frozen at its current name, and the
    * logical schema is free to diverge. Renames compose with time
    * travel (old versions show old names), data skipping (stats key on
    * physical names, which never change), DVs, CDF, compaction, and
    * RESTORE (which restores the old names). Rejected if the column is
    * referenced by a CHECK constraint (same rule as Delta) or the new
    * name already exists. Serializable; returns the commit's version. */
  def renameColumn(spark: SparkSession, table: String, oldName: String,
      newName: String, commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "rename_column", commitKey) { entries =>
      val baseV = entries.last.version
      val schema = StructType.fromDDL(entries.last.schemaDdl.getOrElse(
        readAt(spark, table, baseV).schema.toDDL))
      require(schema.fieldNames.contains(oldName),
        s"no column '$oldName' in '$table' (${schema.fieldNames.mkString(", ")})")
      require(!schema.fieldNames.contains(newName),
        s"column '$newName' already exists in '$table'")
      val newSchema = StructType(schema.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      // a generated column renames WITH its declaration; an expression
      // referencing the old name fails the resolution check below
      val gens = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.generated))
      val newGens = gens.map { case (n, sql) =>
        (if (n == oldName) newName else n) -> sql
      }
      requireConstraintsResolve(spark, table, entries, newSchema, newGens,
        s"rename column '$oldName' to '$newName'")
      val mapping = currentOrIdentityMapping(entries, schema)
      val renamed = mapping.map { case (l, e) =>
        (if (l == oldName) newName else l) -> e
      }
      // column-name-bearing TBLPROPERTIES follow the rename in the SAME
      // commit (the bloom index keys sidecars on stable PHYSICAL names,
      // so existing sidecars keep pruning under the new logical name)
      val props = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.props))
      val newProps = props.map {
        case (k @ BloomIndex.ColsProp, v) =>
          k -> v.split(',').map(_.trim)
            .map(c => if (c == oldName) newName else c).mkString(",")
        case other => other
      }
      commitMetadata(spark, table, commitKey, baseV, newSchema,
        constraints = None,
        mapping = Some(VersionedParquetSink.ColumnMapping.render(renamed)),
        generated = if (newGens == gens) None
          else Some(VersionedParquetSink.Constraints.render(newGens)),
        props = if (newProps == props) None
          else Some(VersionedParquetSink.Constraints.render(newProps)),
        opName = "rename_column")
    }

  /** ALTER TABLE DROP COLUMN (Delta column-mapping parity): a
    * METADATA-ONLY commit — the physical column stays in the files but
    * no reader at or past this version projects it. A later evolution
    * append re-adding the same logical name gets a FRESH physical name
    * and id, so the dropped data never resurrects (time travel before
    * the drop still sees it). Rejected if a CHECK constraint references
    * the column or it is the table's last column. */
  def dropColumn(spark: SparkSession, table: String, name: String,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "drop_column", commitKey) { entries =>
      val baseV = entries.last.version
      val schema = StructType.fromDDL(entries.last.schemaDdl.getOrElse(
        readAt(spark, table, baseV).schema.toDDL))
      require(schema.fieldNames.contains(name),
        s"no column '$name' in '$table' (${schema.fieldNames.mkString(", ")})")
      require(schema.fields.length > 1,
        s"cannot drop '$name': it is the last column of '$table'")
      val newSchema = StructType(schema.fields.filterNot(_.name == name))
      // dropping a generated column drops its declaration; dropping a
      // column another declaration REFERENCES fails resolution below
      val gens = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.generated))
      val newGens = gens.filterNot(_._1 == name)
      requireConstraintsResolve(spark, table, entries, newSchema, newGens,
        s"drop column '$name'")
      val mapping = currentOrIdentityMapping(entries, schema)
      commitMetadata(spark, table, commitKey, baseV, newSchema,
        constraints = None,
        mapping = Some(VersionedParquetSink.ColumnMapping.render(
          mapping.filterNot(_._1 == name))),
        generated = if (newGens == gens) None
          else Some(VersionedParquetSink.Constraints.render(newGens)),
        opName = "drop_column")
    }

  /** ALTER TABLE ADD COLUMN (Delta parity): a METADATA-ONLY commit that
    * appends a nullable column to the schema — no data file is written
    * or touched; every existing row reads the column as NULL (exactly
    * the schema-evolution read semantics appends with `allowEvolution`
    * already get). On a mapped table the new column is minted a fresh
    * physical name/id, so it can never collide with a previously
    * dropped column's bytes. */
  def addColumn(spark: SparkSession, table: String, name: String,
      dataType: org.apache.spark.sql.types.DataType,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "add_column", commitKey) { entries =>
      val baseV = entries.last.version
      val schema = StructType.fromDDL(entries.last.schemaDdl.getOrElse(
        readAt(spark, table, baseV).schema.toDDL))
      require(!schema.fieldNames.contains(name),
        s"column '$name' already exists in '$table'")
      val newSchema = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(name, dataType,
          nullable = true))
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        entries.lastOption.flatMap(_.mapping))
      val newMapping =
        if (mapping.isEmpty) None // mapping stays off until rename/drop
        else Some(VersionedParquetSink.ColumnMapping.render(mapping :+
          (name -> VersionedParquetSink.ColumnMapping.Entry(
            s"col-${UUID.randomUUID()}",
            mapping.map(_._2.id).max + 1))))
      commitMetadata(spark, table, commitKey, baseV, newSchema,
        constraints = None, mapping = newMapping,
        opName = "add_column")
    }

  /** GENERATED ALWAYS AS IDENTITY (Delta identity-column parity):
    * declares `name` as an engine-assigned BIGINT on an EXISTING table
    * — one metadata commit that adds the (nullable) column and records
    * the generator `(startWith, incrementBy, highWater)` in the props
    * payload. From then on every append ALLOCATES values: unique,
    * moving in the increment's direction, gaps allowed (Delta's
    * contract — each row gets `highWater + incrementBy·(k+1)` for a
    * per-row k from `monotonically_increasing_id`, and the new high
    * water is read from the commit's own per-file stats, no extra
    * pass). Writers may never supply the column (ALWAYS semantics).
    * Concurrent identity appends serialize: the allocation pins its
    * base version and a conflicting commit aborts-and-retries the whole
    * stage (Delta conflicts identity-high-water transactions the same
    * way). Pre-declaration rows read the column as NULL, including
    * through time travel.
    *
    * DML rewrites (UPDATE/DELETE/MERGE/applyChanges) preserve existing
    * values and pass supplied ones through DELIBERATELY — replication
    * flows (CDC apply, clone back-fill) must copy source ids verbatim;
    * only the APPEND path allocates. */
  def setIdentityColumn(spark: SparkSession, table: String, name: String,
      startWith: Long = 1L, incrementBy: Long = 1L,
      commitKey: Option[String] = None): Long = {
    require(incrementBy != 0L, "identity INCREMENT BY must be non-zero")
    retryingRewrite(spark, table, "identity_column", commitKey) { entries =>
      val baseV = entries.last.version
      val schema = StructType.fromDDL(entries.last.schemaDdl.getOrElse(
        readAt(spark, table, baseV).schema.toDDL))
      require(!schema.fieldNames.contains(name),
        s"column '$name' already exists in '$table' — identity columns " +
          "are declared fresh (their values are engine-owned)")
      val newSchema = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(name,
          org.apache.spark.sql.types.LongType, nullable = true))
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        entries.lastOption.flatMap(_.mapping))
      val newMapping =
        if (mapping.isEmpty) None
        else Some(VersionedParquetSink.ColumnMapping.render(mapping :+
          (name -> VersionedParquetSink.ColumnMapping.Entry(
            s"col-${UUID.randomUUID()}", mapping.map(_._2.id).max + 1))))
      val props = VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.props)).toMap
      val merged = props + (s"graft.identity.$name" ->
        s"$startWith:$incrementBy:${startWith - incrementBy}")
      commitMetadata(spark, table, commitKey, baseV, newSchema,
        constraints = None, mapping = newMapping,
        props = Some(VersionedParquetSink.Constraints.render(
          merged.toSeq)),
        opName = "identity_column")
    }
  }

  /** Parsed identity declarations: column -> (start, step, highWater). */
  private def identityDecls(
      props: Map[String, String]): Map[String, (Long, Long, Long)] =
    VersionedParquetSink.identityDecls(props)

  /** The current mapping, or — at first rename/drop — the identity
    * mapping that freezes every column's physical name at its current
    * one (consistent with every file already written). */
  private def currentOrIdentityMapping(entries: Seq[Commit],
      schema: StructType):
      Seq[(String, VersionedParquetSink.ColumnMapping.Entry)] = {
    val existing = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    if (existing.nonEmpty) existing
    else VersionedParquetSink.ColumnMapping.identity(schema)
  }

  /** A schema change must leave every CHECK constraint and generated-
    * column expression resolvable — renaming/dropping a column out from
    * under one would make all future writes fail (Delta rejects the
    * ALTER for the same reason). Resolution is the real analyzer's, on
    * an empty frame. */
  private def requireConstraintsResolve(spark: SparkSession, table: String,
      entries: Seq[Commit], newSchema: StructType,
      newGens: Seq[(String, String)], what: String): Unit = {
    import org.apache.spark.sql.functions.expr
    val dummy = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), newSchema)
    def check(kind: String, n: String, analyze: => Any): Unit =
      try { analyze; () }
      catch { case _: Exception =>
        throw new IllegalArgumentException(
          s"cannot $what on '$table': $kind '$n' references it — " +
            "drop it first")
      }
    VersionedParquetSink.Constraints.parse(
        entries.lastOption.flatMap(_.constraints))
      .foreach { case (n, sql) => check("CHECK constraint", n,
        dummy.filter(expr(sql)).queryExecution.analyzed) }
    // a generation expression is a value, not a predicate: resolve via
    // select (it must also still be computable, not just name-resolved)
    newGens.foreach { case (n, sql) =>
      check("generated-column expression for", n,
        dummy.select(expr(sql)).queryExecution.analyzed) }
  }

  /** A data-free commit carrying a metadata change (constraint set
    * and/or column mapping + schema): the dir is an empty parquet write
    * (so every reader/vacuum invariant holds unchanged), the marker
    * carries the new metadata. */
  private def commitMetadata(spark: SparkSession, table: String,
      commitKey: Option[String], baseV: Long, schema: StructType,
      constraints: Option[Option[String]],
      mapping: Option[Option[String]] = None,
      generated: Option[Option[String]] = None,
      props: Option[Option[String]] = None,
      opName: String = "constraint"): Long = {
    val unique = s"d-${UUID.randomUUID()}"
    // the commit's data dir exists (every reader/vacuum invariant over
    // live dirs holds unchanged) but holds NO files — truly metadata-
    // only: explicit-schema parquet scans skip file-less dirs
    fs(spark, tableDir(table)).mkdirs(new Path(s"${tableDir(table)}/$unique"))
    commitLoop(spark, table, unique, commitKey,
      compacts = None, schemaDdl = schema.toDDL,
      cleanupOnKeyLoss = true, requireBase = Some(baseV),
      op = Some(opName), statsJson = None,
      newConstraints = constraints, newMapping = mapping,
      newGenerated = generated, newProps = props)
      .orElse(commitKey.flatMap(k =>
        manifest(spark, table).find(_.key.contains(k)).map(_.version)))
      .getOrElse(throw new IllegalStateException(
        s"$opName change on $table lost the commit race with no keyed winner"))
  }

  /** Fuse the table's CHECK constraints into a write as a per-row guard:
    * a violating row throws (naming the constraint) inside the write's
    * own pass — zero extra jobs, stays in whole-stage codegen. */
  private def constraintGuard(df: DataFrame, constraints: Option[String],
      table: String): DataFrame = {
    import org.apache.spark.sql.functions.{concat, expr, not, raise_error, when}
    VersionedParquetSink.Constraints.parse(constraints)
      .foldLeft(df) { case (d, (name, sql)) =>
        d.filter(
          when(not(coalesce(expr(sql), lit(true))),
            raise_error(concat(
              lit(s"CHECK constraint '$name' violated writing to " +
                s"'$table': ($sql) is false"))))
            .otherwise(lit(true)))
      }
  }

  /** RESTORE TABLE ... TO VERSION AS OF (Delta RESTORE parity): commits
    * the table's content AND schema as they were at `toVersion` as a new
    * rewrite version — history is never erased, so the restore itself
    * can be time-traveled past or restored again. Live deletion vectors
    * are materialized by the restore's own rewrite. Like Delta, RESTORE
    * does not re-validate CHECK constraints added after `toVersion`
    * (constraint metadata keeps its CURRENT set). Serializable like
    * delete/merge; returns the committed version. */
  def restore(spark: SparkSession, table: String, toVersion: Long,
      commitKey: Option[String] = None): Long =
    retryingRewrite(spark, table, "restore", commitKey) { entries =>
      require(entries.exists(_.version <= toVersion),
        s"no committed versions <= $toVersion for $table")
      val baseV = entries.last.version
      val atTo = entries.filter(_.version <= toVersion)
      val restoredDdl = atTo.lastOption.flatMap(_.schemaDdl)
      // RESTORE also restores the column MAPPING and generated-column
      // declarations as of toVersion: both bind to the restored schema's
      // columns (CURRENT CHECK constraints are kept — they are guards on
      // future writes, not schema metadata; Delta draws the same line)
      val restoredMapJson = atTo.lastOption.flatMap(_.mapping)
      val restoredMap =
        VersionedParquetSink.ColumnMapping.parse(restoredMapJson)
      val out = readAt(spark, table, toVersion)
      val unique = s"d-${UUID.randomUUID()}"
      toPhysical(out, restoredMap).write.mode(SaveMode.ErrorIfExists)
        .parquet(s"${tableDir(table)}/$unique")
      commitLoop(spark, table, unique, commitKey,
        compacts = Some(baseV),
        schemaDdl = restoredDdl.getOrElse(out.schema.toDDL),
        cleanupOnKeyLoss = true, requireBase = Some(baseV),
        op = Some("restore"),
        statsJson = Some(FileStats.collect(spark,
          s"${tableDir(table)}/$unique",
          VersionedParquetSink.ColumnMapping
            .physicalSchema(out.schema, restoredMap))),
        newMapping = Some(restoredMapJson),
        newGenerated = Some(atTo.lastOption.flatMap(_.generated)))
        .orElse(commitKey.flatMap(k =>
          manifest(spark, table).find(_.key.contains(k)).map(_.version)))
        .getOrElse(throw new IllegalStateException(
          s"restore of $table lost the commit race with no keyed winner"))
    }

  /** Optimistic-retry scaffold shared by compact/delete/merge: re-reads
    * the manifest each attempt, short-circuits keyed replays to the
    * original version, and retries `body` from the fresh manifest when a
    * rewrite-conflict abort escapes — with a bounded livelock guard. */
  private def retryingRewrite(spark: SparkSession, table: String,
      opName: String, commitKey: Option[String])(
      body: Seq[Commit] => Long): Long = {
    val maxAttempts = 5
    var attempt = 0
    while (true) {
      val entries = manifest(spark, table)
      require(entries.nonEmpty, s"no committed versions for $table: cannot $opName")
      val replayed = commitKey.flatMap(k =>
        entries.find(_.key.contains(k)).map(_.version))
      replayed.foreach(v => return v)
      try {
        val v = body(entries)
        // every rewrite/metadata path funnels here: OPTIMIZE/REORG
        // outputs get their bloom sidecars without waiting for the next
        // append, and SET TBLPROPERTIES enabling the index backfills
        // immediately (no-op probe for un-indexed tables)
        maybeBloom(spark, table, propertiesOf(spark, table))
        return v
      } catch {
        case e: VersionedParquetSink.ConcurrentRewriteException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e // livelock guard: surface it
      }
    }
    -1L // unreachable
  }

  /** The shared copy-on-write loop: derive the new table content from the
    * current snapshot, write it to a unique dir, commit with
    * `compacts = baseVersion` (supersedes what it was derived from), and
    * retry from a FRESH snapshot when the serializability check aborts. */
  /** Serializable read-modify-write for engine-internal maintenance
    * (SampleIndex.compact): derives the new content from the CURRENT
    * snapshot via `transform` and, when a concurrent commit wins the
    * race, RE-DERIVES from a fresh snapshot — unlike overwrite(df),
    * whose caller-computed frame would go stale, nothing a concurrent
    * writer appended can be lost. */
  private[engine] def rewriteSnapshot(spark: SparkSession, table: String,
      opName: String, commitKey: Option[String] = None)(
      transform: DataFrame => DataFrame): Long =
    rewriteWith(spark, table, opName, commitKey, transform)

  private def rewriteWith(spark: SparkSession, table: String, opName: String,
      commitKey: Option[String],
      transform: DataFrame => DataFrame): Long =
    retryingRewrite(spark, table, opName, commitKey) { entries =>
      val baseV = entries.last.version
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        entries.lastOption.flatMap(_.mapping))
      val out = transform(readAt(spark, table, baseV))
      val unique = s"d-${UUID.randomUUID()}"
      toPhysical(out, mapping).write.mode(SaveMode.ErrorIfExists)
        .parquet(s"${tableDir(table)}/$unique")
      commitLoop(spark, table, unique, commitKey,
        compacts = Some(baseV),
        schemaDdl = entries.last.schemaDdl.getOrElse(out.schema.toDDL),
        cleanupOnKeyLoss = true, requireBase = Some(baseV),
        op = Some(opName),
        statsJson = Some(FileStats.collect(spark,
          s"${tableDir(table)}/$unique",
          VersionedParquetSink.ColumnMapping
            .physicalSchema(out.schema, mapping))))
        // None = a same-key racer committed first; report its version
        .orElse(commitKey.flatMap(k =>
          manifest(spark, table).find(_.key.contains(k)).map(_.version)))
        .getOrElse(throw new IllegalStateException(
          s"$opName of $table lost the commit race with no keyed winner"))
    }

  /** Change-data-feed between two versions (Delta CDF parity): the rows
    * added and removed going from `fromV` to `toV`, tagged with a
    * `_change_type` column (`insert` / `delete`; an upsert appears as
    * delete + insert of the key's row). `fromV = -1` means "from before
    * the first commit" (everything at `toV` is an insert).
    *
    * Append-only ranges are served for FREE: the changed rows are exactly
    * the range's data directories, read directly — no comparison (this is
    * why CDC consumers of an append-only ingest table pay O(new data),
    * never O(table)). COMPACTIONS in the range are content-preserving, so
    * they are skipped and the fast path survives periodic OPTIMIZE runs —
    * CDC consumers and table maintenance coexist for free. Only a range
    * containing a DATA-CHANGING rewrite (delete/merge — or a pre-`op`-
    * field rewrite marker, which cannot be told apart from one) falls
    * back to two distributed exceptAll anti-joins — O(table), the honest
    * cost of diffing arbitrary rewrites without per-commit change files
    * (which is how Delta's CDF avoids it, at write-time cost). */
  def changesBetween(spark: SparkSession, table: String, fromV: Long,
      toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: fromV $fromV > toV $toV")
    val entries = manifest(spark, table)
    val upToTo = entries.filter(_.version <= toV)
    require(upToTo.nonEmpty, s"no committed versions <= $toV for $table")
    val range = entries.filter(e => e.version > fromV && e.version <= toV)
    val schemaDdl = upToTo.last.schemaDdl
    def withType(df: DataFrame, t: String): DataFrame =
      df.withColumn("_change_type", lit(t))
    // a mask-carrying commit (DV delete / merge-on-read update) CHANGES
    // data without being a rewrite marker: any such commit in range
    // forces the snapshot-diff path (which reads masked snapshots and
    // reports masked rows as deletes, updated rows as delete+insert)
    // a selective fold (replaces.nonEmpty) is content-preserving like a
    // full compaction: excluded from the insert dirs (its rows are the
    // replaced dirs' rows, already delivered), allowed in the fast path
    val fastRange = range.filter(e =>
      e.compacts.isEmpty && e.replaces.isEmpty &&
        !VersionedParquetSink.isMergeOnRead(e))
    if (range.forall(e =>
        (e.compacts.isEmpty && !VersionedParquetSink.isMergeOnRead(e)) ||
          e.op.contains("compact"))) {
      val toSchema = schemaDdl.map(ddl => StructType(
        StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
      if (fastRange.isEmpty) {
        val schema = toSchema.getOrElse(
          readAt(spark, table, toV).schema)
        return withType(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), "insert")
      }
      val dirs = fastRange.map(e =>
        VersionedParquetSink.resolveDir(tableDir(table), e.dir))
      // mapped tables: scan physical, alias back to logical (as of toV)
      val mapping = VersionedParquetSink.ColumnMapping.parse(
        upToTo.lastOption.flatMap(_.mapping))
      val df = toSchema match {
        case Some(schema) =>
          val scanned = spark.read.schema(VersionedParquetSink.ColumnMapping
            .physicalSchema(schema, mapping)).parquet(dirs: _*)
          if (mapping.isEmpty) scanned
          else scanned.select(schema.fields.toSeq.map(f =>
            col(VersionedParquetSink.ColumnMapping
              .physicalName(mapping, f.name)).as(f.name)): _*)
        case None => spark.read.parquet(dirs: _*)
      }
      withType(df, "insert")
    } else {
      val b = readAt(spark, table, toV)
      val a0 =
        if (entries.exists(_.version <= fromV)) readAt(spark, table, fromV)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], b.schema)
      // align the pre-evolution snapshot to toV's columns (missing = null)
      val a = b.schema.fields.foldLeft(a0) { (df, f) =>
        if (a0.columns.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(b.columns.map(col): _*)
      withType(b.exceptAll(a), "insert")
        .unionByName(withType(a.exceptAll(b), "delete"))
    }
  }

  /** SHALLOW CLONE (Delta `CREATE TABLE t SHALLOW CLONE s` parity):
    * creates `target` as a METADATA-ONLY copy of `source` — every commit
    * marker replays byte-identical except its data dir, re-pointed at
    * the source table's directory (`../<source>/<dir>`, resolved by
    * [[VersionedParquetSink.resolveDir]] on every read). No data files
    * are copied: cloning a 100 TB table is an O(versions) marker write.
    * The clone then lives its own life — appends, deletes (masks over
    * source-owned files key on the prefix-independent last-two-segment
    * relative path, so they compose), compactions and vacuum land in
    * the CLONE's directory and never touch the source, and vice versa.
    * Because the whole manifest is cloned, time travel and CDF below
    * the clone point keep working on the clone (beyond Delta, whose
    * clones flatten history to one commit). Schema, CHECK constraints,
    * column mapping, generated columns, TBLPROPERTIES and idempotency
    * keys all carry over — keys intentionally, Delta's clones preserve
    * streaming txn ids for the same reason: a writer redirected to the
    * clone must not double-append its last batch.
    *
    * The Delta-documented hazard applies identically: VACUUM
    * (`includeSuperseded=true`) or data-removing maintenance on the
    * SOURCE deletes files the clone references — the source's manifest
    * doesn't know about clones. Vacuum on the CLONE is always safe: it
    * only ever deletes directories under the clone's own table dir. */
  def cloneShallow(spark: SparkSession, source: String,
      target: String, versionAsOf: Option[Long] = None): Long = {
    require(source != target, s"cannot clone '$source' onto itself")
    val entries = versionAsOf match {
      // CLONE ... VERSION AS OF: the clone is the source AS OF v — its
      // manifest stops there, so later source commits are invisible to
      // it (and time travel below v still works on the clone)
      case Some(v) => manifest(spark, source).filter(_.version <= v)
      case None => manifest(spark, source)
    }
    require(entries.nonEmpty, versionAsOf match {
      case Some(v) => s"no committed versions <= $v for $source"
      case None => s"no committed versions for $source"
    })
    require(manifest(spark, target).isEmpty,
      s"clone target '$target' already exists")
    val f = fs(spark, commitDir(target))
    f.mkdirs(new Path(commitDir(target)))
    // Register the clone FIRST with every table whose data it will
    // reference (the flattened owner — normally `source`, the original
    // for re-clones): a `_clones/<target>` breadcrumb that [[vacuum]]
    // consults so a source vacuum KEEPS directories live clones still
    // read. This closes Delta's documented shallow-clone hazard (vacuum
    // on the source silently breaks every clone). Breadcrumb before
    // markers: a vacuum racing the clone must already see the hold (it
    // tolerates a not-yet-committed clone within its grace period); the
    // breadcrumb is dropped once the clone's commit log disappears
    // (DROP TABLE) or never materializes.
    entries.map(e => VersionedParquetSink
        .resolveDir(tableDir(source), e.dir).stripPrefix(s"$basePath/")
        .takeWhile(_ != '/'))
      .distinct.foreach { owner =>
      val bc = new Path(s"${tableDir(owner)}/_clones/$target")
      val bf = fs(spark, tableDir(owner))
      bf.mkdirs(bc.getParent)
      val out = bf.create(bc, true)
      try out.write(target.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    entries.foreach { e =>
      // flatten chained clones: an ALREADY-escaping dir re-pointed at
      // this source would stack ../ hops — resolve to the owning table
      // first so every clone references the original data directly
      val abs = VersionedParquetSink.resolveDir(tableDir(source), e.dir)
      val newDir = "../" + abs.stripPrefix(s"$basePath/")
      val body = e.raw.replace(s""""dir":"${e.dir}"""",
        s""""dir":"$newDir"""")
      val marker = new Path(s"${commitDir(target)}/${e.version}.commit")
      if (!coordinator.publishIfAbsent(f, marker,
          body.getBytes(StandardCharsets.UTF_8)))
        throw new java.io.IOException(s"clone target '$target' gained " +
          s"commits concurrently (marker v${e.version})")
    }
    // external interop: mirror the cloned manifest into the clone's own
    // _delta_log (add actions carry absolute URIs for the cross-table
    // files, the Delta-spec form its own shallow clones use)
    DeltaLogMirror.sync(spark, tableDir(target), manifest(spark, target))
    entries.last.version
  }

  /** VACUUM: delete data directories no reader can see — orphans left by
    * writers that died before committing — and, with
    * `includeSuperseded=true`, the pre-compaction directories a
    * [[compact]] superseded (which truncates time travel to the latest
    * compaction, exactly like Delta's VACUUM vs its retention window).
    *
    * `graceMs` guards in-flight writers: an uncommitted directory younger
    * than the grace period might belong to a writer between its data
    * write and its marker claim, so it is left alone (Delta's
    * "retention check" for the same race). Returns the deleted count.
    *
    * `includeSuperseded=true` also truncates [[changesBetween]]'s fast
    * path for ranges below the latest rewrite (their append dirs are
    * gone), exactly as it truncates time travel — Delta's VACUUM has the
    * same effect on its CDF retention. */
  def vacuum(spark: SparkSession, table: String, graceMs: Long = -1L,
      includeSuperseded: Boolean = false, dryRun: Boolean = false): Int = {
    val f = fs(spark, tableDir(table))
    val td = new Path(tableDir(table))
    if (!f.exists(td)) return 0
    val entries = manifest(spark, table)
    // graceMs < 0 = "table default": the retention TBLPROPERTIES
    // (Delta's deletedFileRetentionDuration, time strings like "7d"),
    // else one hour — an explicit caller argument always wins
    val vacProps = VersionedParquetSink.Constraints.parse(
      entries.lastOption.flatMap(_.props)).toMap
    val grace: Long =
      if (graceMs >= 0L) graceMs
      else vacProps.get("graft.deletedFileRetentionDuration")
        .map(org.apache.spark.network.util.JavaUtils.timeStringAsMs)
        .getOrElse(3600000L)
    // opt-in log retention rides the same maintenance pass
    if (!dryRun) vacProps.get("graft.logRetentionDuration")
      .map(org.apache.spark.network.util.JavaUtils.timeStringAsMs)
      .foreach(ms => vacuumLog(spark, table, ms))
    // Staged dirs named by a pending `_txn` manifest are NOT orphans:
    // the transaction passed its commit point, so the batch is durable
    // for every table and recovery WILL claim these dirs — deleting one
    // would make all-or-none unrestorable. Quarantined (`.failed`)
    // manifests keep their dirs too, for manual repair; deleting the
    // quarantined manifest releases them to a later vacuum.
    val txnStagedDirs: Set[String] = {
      val fb = fs(spark, basePath)
      val d = new Path(txnDir)
      if (!fb.exists(d)) Set.empty
      else fb.listStatus(d).toSeq.filter(st => st.isFile &&
          (st.getPath.getName.endsWith(".json") ||
            st.getPath.getName.endsWith(".json.failed")))
        .flatMap { st =>
          VersionedParquetSink.Staged
            .parseTxn(readSmallFile(spark, st.getPath.toString))._2
            .filter(_.table == table).map(_.unique)
        }.toSet
    }
    val now = System.currentTimeMillis()
    // Clone holds: every registered clone (a `_clones/<name>` breadcrumb
    // written by [[cloneShallow]] BEFORE its markers) pins the local
    // dirs its manifest still references — a source vacuum must never
    // break a live clone (the Delta hazard this protocol closes). A
    // breadcrumb whose clone has no commit log is stale (dropped table
    // or crashed clone) and is garbage-collected here — but only past
    // the grace period, since a racing cloneShallow writes the
    // breadcrumb before its first marker.
    // A breadcrumb younger than the grace period whose clone has NOT
    // yet committed its first marker is a clone IN FLIGHT — its
    // manifest is unreadable, so the dirs it will reference (possibly
    // superseded ones, for a VERSION AS OF clone) are unknowable. Hold
    // ALL of the source's manifest dirs for this pass rather than none:
    // an includeSuperseded vacuum racing that window must not delete
    // history the pending clone is about to pin.
    var pendingClone = false
    val cloneHeld: Set[String] = {
      val cd = new Path(s"${tableDir(table)}/_clones")
      if (!f.exists(cd)) Set.empty
      else f.listStatus(cd).toSeq.filter(_.isFile).flatMap { st =>
        val cloneName = st.getPath.getName
        val cloneEntries = manifest(spark, cloneName)
        if (cloneEntries.isEmpty) {
          if (now - st.getModificationTime >= grace) {
            if (!dryRun) f.delete(st.getPath, false)
          } else pendingClone = true
          Seq.empty
        } else cloneEntries.map(_.dir)
          .filter(_.startsWith(s"../$table/"))
          .map(_.stripPrefix(s"../$table/").takeWhile(_ != '/'))
      }.toSet
    }
    val keep: Set[String] = txnStagedDirs ++ cloneHeld ++
      (if (!includeSuperseded || pendingClone) entries.map(_.dir).toSet
       else liveEntries(entries).map(_.dir).toSet) // = readAt(MaxValue) scan set
    // `_txn/.tmp-*` files are writers that died BEFORE the manifest
    // rename (= before the commit point): true orphans after the grace
    // period, same rule as uncommitted data dirs
    val fb = fs(spark, basePath)
    val txnD = new Path(txnDir)
    if (fb.exists(txnD)) fb.listStatus(txnD).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(".tmp-"))
      .filter(st => now - st.getModificationTime >= grace)
      .foreach(st => if (!dryRun) fb.delete(st.getPath, false))
    // clone-local bloom sidecars (`_bloom_ext/<digest>`) GC with the
    // inherited entries that reference them — same retention window
    // and superseded semantics as the data dirs they serve
    val extKeep: Set[String] =
      (if (!includeSuperseded || pendingClone) entries
       else liveEntries(entries))
        .filter(_.dir.startsWith("../"))
        .map(e => new Path(
          BloomIndex.extRoot(tableDir(table), e.dir)).getName).toSet
    val extD = new Path(s"${tableDir(table)}/_bloom_ext")
    if (f.exists(extD)) f.listStatus(extD).toSeq
      .filter(st => st.isDirectory && !extKeep.contains(st.getPath.getName))
      .filter(st => now - st.getModificationTime >= grace)
      .foreach(st => if (!dryRun) f.delete(st.getPath, true))
    // dryRun (Delta's VACUUM ... DRY RUN): report what WOULD be deleted,
    // touch nothing
    f.listStatus(td).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .filter(st => !keep.contains(st.getPath.getName))
      .filter(st => now - st.getModificationTime >= grace)
      .map { st => if (!dryRun) f.delete(st.getPath, true); 1 }.sum
  }

  override def appendPartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit =
    throw new UnsupportedOperationException(
      "VersionedParquetSink versions whole commits; use ParquetTableSink for hive partitioning")

  /** Overwrite as a LOGGED rewrite commit (Delta's
    * `mode("overwrite")` semantics): the new content lands in a unique
    * dir and commits with `compacts = <latest version>`, so the swap is
    * atomic (a concurrent reader sees the old table or the new one,
    * never a missing table), history stays time-travelable, and the
    * streaming tail sees it as a data-changing commit. The schema is
    * REPLACED by the frame's (Delta's `overwriteSchema`); surviving
    * mapped columns keep their frozen physical names, new ones mint
    * fresh physicals (dropped physicals are never reused). Write
    * governance rides the rewrite like any other write: generated
    * columns computed/validated, CHECK constraints guarded. */
  override def overwrite(df: DataFrame, table: String): Unit =
    overwrite(df, table, commitKey = None)

  /** Keyed overwrite — the exactly-once form streaming complete-mode
    * epochs ride: a marker already carrying `commitKey` makes the whole
    * rewrite a no-op (retryingRewrite's keyed short-circuit), so a
    * crash-replayed epoch truncates/rewrites exactly once. */
  def overwrite(df: DataFrame, table: String,
      commitKey: Option[String]): Unit = {
    val spark = df.sparkSession
    if (!exists(spark, table)) { doAppend(df, table, commitKey); return }
    retryingRewrite(spark, table, "overwrite", commitKey) { entries =>
      val baseV = entries.last.version
      val gensJson = entries.lastOption.flatMap(_.generated)
      val completed = completeGenerated(df, gensJson, None, table)
      val cons = entries.lastOption.flatMap(_.constraints)
      val guarded = constraintGuard(completed, cons, table)
      val mappingJson = entries.lastOption.flatMap(_.mapping)
      val mapping = VersionedParquetSink.ColumnMapping.parse(mappingJson)
      val kept = mapping.filter { case (n, _) =>
        completed.columns.contains(n) }
      val newCols = if (mappingJson.isDefined)
        completed.schema.fields.toSeq
          .filterNot(f => mapping.exists(_._1 == f.name))
      else Seq.empty
      val maxId = mapping.map(_._2.id).maxOption.getOrElse(0)
      val extended = kept ++ newCols.zipWithIndex.map { case (f, i) =>
        f.name -> VersionedParquetSink.ColumnMapping.Entry(
          s"col-${UUID.randomUUID()}", maxId + 1 + i)
      }
      val unique = s"d-${UUID.randomUUID()}"
      toPhysical(guarded, extended).write.mode(SaveMode.ErrorIfExists)
        .parquet(s"${tableDir(table)}/$unique")
      commitLoop(spark, table, unique, commitKey = commitKey,
        compacts = Some(baseV),
        schemaDdl = completed.schema.toDDL, cleanupOnKeyLoss = true,
        requireBase = Some(baseV), op = Some("overwrite"),
        statsJson = Some(FileStats.collect(spark,
          s"${tableDir(table)}/$unique",
          VersionedParquetSink.ColumnMapping
            .physicalSchema(completed.schema, extended))),
        enforcedConstraints = Some(cons),
        newMapping = if (mappingJson.isDefined)
          Some(VersionedParquetSink.ColumnMapping.render(extended))
        else None,
        enforcedGenerated = Some(gensJson))
        // a mid-claim key race (same-key writer won between snapshot and
        // claim) is a successful replay, not a failure — restore's recipe
        .orElse(commitKey.flatMap(k =>
          manifest(spark, table).find(_.key.contains(k)).map(_.version)))
        .getOrElse(throw new IllegalStateException(
          s"overwrite of $table lost the commit race with no keyed winner"))
    }
    ()
  }

  /** Snapshot = union of committed versions (orphan dirs are invisible). */
  override def read(spark: SparkSession, table: String): DataFrame =
    readAt(spark, table, Long.MaxValue)

  private def liveEntries(entries: Seq[Commit]): Seq[Commit] =
    VersionedParquetSink.liveEntries(entries)

  /** Time travel: the table as of version `v` (inclusive). A compaction
    * commit <= v replaces everything it folded in (its `compacts`
    * high-water mark); versions before a compaction stay readable because
    * neither their markers nor their data dirs are deleted.
    *
    * The read uses the schema COMMITTED at `v` (like Delta, whose reader
    * schema comes from the log, not file footers): after schema
    * evolution, files written before a column existed read it as null —
    * and time travel to a pre-evolution version projects the later
    * columns away entirely. */
  def readAt(spark: SparkSession, table: String, v: Long): DataFrame =
    readAtPos(spark, table, v, keepPos = false)

  /** [[readAt]] with the merge-on-read machinery exposed: scans the live
    * DATA dirs, anti-joins any live deletion-vector masks, and (for the
    * DV writer) can keep the `__dv_path`/`__dv_pos` position columns. */
  private def readAtPos(spark: SparkSession, table: String, v: Long,
      keepPos: Boolean): DataFrame = {
    val entries = manifest(spark, table).filter(_.version <= v)
    require(entries.nonEmpty, s"no committed versions <= $v for $table")
    val live = liveEntries(entries)
    // an update commit is BOTH: its dir scans as data, its _dv/ masks
    val dvs = live.filter(VersionedParquetSink.isMergeOnRead)
    val datas = live.filterNot(VersionedParquetSink.isDv)
    val dirs = datas.map(e =>
      VersionedParquetSink.resolveDir(tableDir(table), e.dir))
    // column mapping: files carry physical names — scan with the
    // PHYSICAL schema (as of v), alias back to logical at the end
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val logicalSchema = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
      StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
    val plain = logicalSchema match {
      case Some(logical) =>
        // nullable-ized: pre-evolution files lack the new columns
        spark.read.schema(VersionedParquetSink.ColumnMapping
          .physicalSchema(logical, mapping)).parquet(dirs: _*)
      case None => spark.read.parquet(dirs: _*) // pre-schema-field markers
    }
    def logicalize(d: DataFrame): DataFrame =
      if (mapping.isEmpty) d
      else {
        val keep = d.columns.toSeq
          .filter(c => c == "__dv_path" || c == "__dv_pos")
        d.select(logicalSchema.get.fields.toSeq.map(f =>
          col(VersionedParquetSink.ColumnMapping
            .physicalName(mapping, f.name)).as(f.name)) ++
          keep.map(col): _*)
      }
    if (dvs.isEmpty && !keepPos) logicalize(plain) // zero overhead sans DVs
    else {
      val withPos = withPosCols(spark, table, plain)
      val masked =
        if (dvs.isEmpty) withPos
        else applyDvMask(spark, table, withPos, dvs)
      logicalize(if (keepPos) masked else masked.drop("__dv_path", "__dv_pos"))
    }
  }

  /** Attach the (file-relative path, row position) identity of every
    * scanned row, from the parquet source's `_metadata` columns — exact
    * and stable for immutable files, which is what deletion vectors key
    * on. The relative form is the file's LAST TWO path segments
    * (`<commit-dir>/<file>.parquet`) — equal to "relative to the owning
    * table dir" for local data, and prefix-independent so a relocated
    * table keeps its masks (Delta stores relative paths for the same
    * reason) and a SHALLOW CLONE's masks key identically whether a row
    * was scanned through the source table or through the clone's
    * re-pointed dirs. Same convention as GraftParquetFileFormat's
    * executor-side mask. */
  private def withPosCols(spark: SparkSession, table: String,
      df: DataFrame): DataFrame =
    df.withColumn("__dv_path", org.apache.spark.sql.functions.expr(
        "array_join(slice(split(_metadata.file_path, '/'), -2, 2), '/')"))
      .withColumn("__dv_pos", col("_metadata.row_index"))

  /** Anti-join the union of live deletion vectors: each masked
    * (path, pos) row disappears from the scan. The mask is broadcast
    * while small (the overwhelmingly common shape — DVs hold row
    * POSITIONS, not rows), so the data side never shuffles; a
    * pathologically large mask degrades to a shuffled anti-join, still
    * never a rewrite. */
  private def applyDvMask(spark: SparkSession, table: String,
      dfWithPos: DataFrame, dvs: Seq[Commit]): DataFrame = {
    val f = fs(spark, tableDir(table))
    val dirs = dvs.map(e =>
      VersionedParquetSink.resolveDir(tableDir(table),
        VersionedParquetSink.maskDir(e)))
    // explicit schema: an all-rows-kept DV write may produce no part
    // files, and schema inference on an empty dir would throw
    val mask0 = spark.read.schema("path STRING, pos BIGINT")
      .parquet(dirs: _*)
      .withColumnRenamed("path", "__dv_path")
      .withColumnRenamed("pos", "__dv_pos")
    val maskBytes = dirs.map { d =>
      val p = new Path(d)
      if (f.exists(p)) f.listStatus(p).filter(_.isFile).map(_.getLen).sum
      else 0L
    }.sum
    val mask =
      if (maskBytes <= 64L * 1024 * 1024)
        org.apache.spark.sql.functions.broadcast(mask0)
      else mask0
    dfWithPos.join(mask, Seq("__dv_path", "__dv_pos"), "left_anti")
  }

  /** Data-skipping read (Delta's stats-based file pruning — its core
    * read-path win): scans ONLY the files whose per-file min/max stats
    * could satisfy `condition`, then applies the full filter. Pruning is
    * an optimization, never a correctness dependency — every unprunable
    * shape (unknown predicate, cast-wrapped column, commit written
    * before stats existed) degrades to scanning that commit's whole
    * directory. At 100 TB this is the difference between opening every
    * file of a z-ordered table and opening the handful whose ranges
    * overlap the predicate ([[ZOrder]] clusters; this skips). */
  def readWhere(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column): DataFrame =
    readAtWhere(spark, table, Long.MaxValue, condition)

  /** [[readWhere]] with time travel: the table as of version `v`,
    * stats-pruned for `condition`. */
  def readAtWhere(spark: SparkSession, table: String, v: Long,
      condition: org.apache.spark.sql.Column): DataFrame = {
    val entries = manifest(spark, table).filter(_.version <= v)
    require(entries.nonEmpty, s"no committed versions <= $v for $table")
    val schema = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
      StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
    // stats are keyed by PHYSICAL column names (stable across renames):
    // resolve the predicate against the user-facing logical schema, then
    // rewrite its attribute references into physical names
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val physSchema = schema.map(
      VersionedParquetSink.ColumnMapping.physicalSchema(_, mapping))
    val pred = schema.flatMap(FileStats.resolvePredicate(spark, _, condition))
      .map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if mapping.nonEmpty =>
          a.withName(
            VersionedParquetSink.ColumnMapping.physicalName(mapping, a.name))
      })
    val paths = scanPaths(table, entries, pred, physSchema)
    val base =
      if (paths.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        physSchema.getOrElse(readAt(spark, table, v).schema))
      else physSchema match {
        case Some(s) => spark.read.schema(s).parquet(paths: _*)
        case None => spark.read.parquet(paths: _*)
      }
    // deletion vectors compose with pruning: masks key on file-relative
    // paths, so a pruned-away file's mask rows simply never match
    val dvs = liveEntries(entries).filter(VersionedParquetSink.isMergeOnRead)
    val masked =
      if (dvs.isEmpty || paths.isEmpty) base
      else applyDvMask(spark, table, withPosCols(spark, table, base), dvs)
        .drop("__dv_path", "__dv_pos")
    val logical =
      if (mapping.isEmpty) masked
      else masked.select(schema.get.fields.toSeq.map(f =>
        col(VersionedParquetSink.ColumnMapping
          .physicalName(mapping, f.name)).as(f.name)): _*)
    logical.filter(condition)
  }

  /** The concrete paths a [[readAtWhere]] scan opens: pruned FILE paths
    * for commits carrying stats, whole directories otherwise. Exposed
    * for the scale tests ("a selective predicate touches few files"). */
  private[graft] def scanPaths(table: String, entries: Seq[Commit],
      pred: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      schema: Option[StructType]): Seq[String] =
    liveEntries(entries).filterNot(VersionedParquetSink.isDv).flatMap { e =>
      val dirPath = VersionedParquetSink.resolveDir(tableDir(table), e.dir)
      (e.stats, pred, schema) match {
        case (Some(json), Some(p), Some(sc)) =>
          FileStats.parse(json).collect {
            case (f, pf) if FileStats.mayMatch(p, sc, pf) => s"$dirPath/$f"
          }.toSeq.sorted
        case _ => Seq(dirPath)
      }
    }

  /** Test/observability hook: (files surviving pruning, total files) for
    * a predicate at the latest version. */
  private[graft] def pruningStats(spark: SparkSession, table: String,
      condition: org.apache.spark.sql.Column): (Int, Int) = {
    val entries = manifest(spark, table)
    val schema = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
      StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val physSchema = schema.map(
      VersionedParquetSink.ColumnMapping.physicalSchema(_, mapping))
    val live = liveEntries(entries).filterNot(VersionedParquetSink.isDv)
    val total = live.map(e =>
      e.stats.map(FileStats.parse(_).size).getOrElse(1)).sum
    val pred = schema.flatMap(FileStats.resolvePredicate(spark, _, condition))
      .map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if mapping.nonEmpty =>
          a.withName(
            VersionedParquetSink.ColumnMapping.physicalName(mapping, a.name))
      })
    val kept = scanPaths(table, entries, pred, physSchema).size
    (kept, total)
  }

  /** Timestamp time travel (Delta's `timestampAsOf`): the table as of the
    * LAST version committed at or before `ts` — commit wall-clocks come
    * from the marker `ts` field every commit writes. Throws if the first
    * commit is younger than `ts`. */
  def readAsOf(spark: SparkSession, table: String,
      ts: java.time.Instant): DataFrame =
    readAt(spark, table, versionAsOfTimestamp(spark, table, ts))

  /** The timestamp-resolution rule shared by every `timestampAsOf`
    * face (reads, RESTORE): the LAST version committed at or before
    * `ts`. Throws if the first timestamped commit is younger. */
  def versionAsOfTimestamp(spark: SparkSession, table: String,
      ts: java.time.Instant): Long = {
    val upTo = ts.toEpochMilli
    val entries = manifest(spark, table)
    require(entries.nonEmpty, s"no committed versions for $table")
    val noTs = entries.count(_.ts.isEmpty)
    entries.filter(_.ts.exists(_ <= upTo)).lastOption.getOrElse(
      throw new IllegalArgumentException {
        val earliest = entries.flatMap(_.ts).headOption
          .map(java.time.Instant.ofEpochMilli(_).toString)
          .getOrElse("<no timestamped commits>")
        s"no version of $table committed at or before $ts " +
          s"(earliest timestamped commit: $earliest" +
          (if (noTs > 0) s"; $noTs commit(s) carry no timestamp and are " +
            "not reachable by timestamp — use readAt(version)" else "") + ")"
      })
      .version
  }

  override def exists(spark: SparkSession, table: String): Boolean =
    versions(spark, table).nonEmpty

  /** The `spark.read.format("graft")` relation for `table` (see
    * [[GraftRelation]]): commit-log stats pruning inside Catalyst's own
    * scan planning, stock vectorized parquet below. `version` /
    * `timestamp` give the time-travel forms (at most one). */
  def baseRelation(spark: SparkSession, table: String,
      version: Option[Long] = None,
      timestamp: Option[java.time.Instant] = None):
      org.apache.spark.sql.sources.BaseRelation = {
    require(version.isEmpty || timestamp.isEmpty,
      "specify at most one of versionAsOf / timestampAsOf")
    val all = manifest(spark, table)
    require(all.nonEmpty, s"no committed versions for $table")
    val v = version.orElse(timestamp.map { ts =>
      val upTo = ts.toEpochMilli
      all.filter(_.ts.exists(_ <= upTo)).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no version of $table committed at or before $ts")).version
    }).getOrElse(Long.MaxValue)
    GraftRelation(spark, tableDir(table), all.filter(_.version <= v), table)
  }

  /** Per-commit admission sizes for streaming rate limits
    * (`maxFilesPerTrigger`/`maxBytesPerTrigger`): every commit with
    * version > `fromV`, ascending, with the data-file count and bytes a
    * stream batch over that single version would serve. For the plain
    * append stream (`cdf = false`) only pure-append commits cost
    * anything (compactions/rewrites/DVs are never served, metadata-only
    * commits are free); for the change feed (`cdf = true`) every commit
    * with a dir is costed by its dir, a conservative proxy for the size
    * of its change rows. LAZY: callers stop consuming at their cap, so
    * a deep backlog costs one dir listing per ADMITTED commit per
    * trigger, not per backlog commit — the property that makes catching
    * up on a months-old checkpoint O(admitted) driver work per batch. */
  private[graft] def admissionSizes(spark: SparkSession, table: String,
      fromV: Long, cdf: Boolean = false): Iterator[(Long, Int, Long)] = {
    val f = fs(spark, tableDir(table))
    manifest(spark, table).filter(_.version > fromV).sortBy(_.version)
      .iterator.map { e =>
        val serves =
          if (cdf) true
          else e.compacts.isEmpty && e.replaces.isEmpty &&
            !VersionedParquetSink.isMergeOnRead(e) &&
            !VersionedParquetSink.isDv(e)
        if (!serves) (e.version, 0, 0L)
        else {
          val p = new Path(
            VersionedParquetSink.resolveDir(tableDir(table), e.dir))
          val files =
            if (!f.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
            else f.listStatus(p).filter(st =>
              st.isFile && st.getPath.getName.endsWith(".parquet"))
          (e.version, files.length, files.map(_.getLen).sum)
        }
      }
  }

  /** The [[streamSince]] range as a planner-integrated relation (file
    * scan over the range's append dirs, schema/mapping from the
    * `untilVersion` snapshot) — what the `readStream.format("graft")`
    * source serves per micro-batch. Same data-changing-commit contract
    * as [[streamSince]]. */
  private[graft] def streamBatchRelation(spark: SparkSession, table: String,
      fromVersion: Long, untilVersion: Long, skipChangeCommits: Boolean):
      org.apache.spark.sql.sources.BaseRelation = {
    val entries = manifest(spark, table).filter(_.version <= untilVersion)
    require(entries.nonEmpty,
      s"no committed versions for $table at or before v$untilVersion")
    val range = entries.filter(_.version > fromVersion)
    val changing = range.filter(e =>
      (e.compacts.isDefined && !e.op.contains("compact")) ||
        VersionedParquetSink.isMergeOnRead(e))
    if (changing.nonEmpty && !skipChangeCommits)
      throw new IllegalStateException(
        s"stream over '$table': data-changing commit(s) " +
          s"${changing.map(e => s"v${e.version}").mkString(", ")} in " +
          "range — set skipChangeCommits=true for appends-only delivery")
    GraftRelation.forDirs(spark, tableDir(table), entries,
      range.filter(e =>
        e.compacts.isEmpty && e.replaces.isEmpty &&
          !VersionedParquetSink.isMergeOnRead(e)),
      table)
  }

  /** DESCRIBE HISTORY parity: one row per commit, newest first —
    * version, commit timestamp, operation (WRITE for plain appends),
    * whether it superseded earlier versions (rewrite high-water mark),
    * and the idempotency key if the writer supplied one. Driver-side
    * over the manifest (already one listing + one checkpoint read) —
    * never scans data. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    manifest(spark, table).sortBy(-_.version).map { e =>
      // operation metrics (Delta's operationMetrics): file/row counts
      // from the commit's OWN stats payload — no data scan
      val perFile = e.stats.map(FileStats.parse).getOrElse(Map.empty)
      (e.version,
        e.ts.map(m => new java.sql.Timestamp(m)).orNull,
        e.op.map(_.toUpperCase).getOrElse("WRITE"),
        e.compacts.map(java.lang.Long.valueOf).orNull,
        e.key.orNull,
        if (e.stats.isEmpty) null
        else java.lang.Long.valueOf(perFile.size.toLong),
        if (e.stats.isEmpty) null
        else java.lang.Long.valueOf(perFile.values.map(_.numRecords).sum),
        e.userMeta.orNull)
    }.toDF("version", "timestamp", "operation", "supersedes", "commitKey",
      "numFiles", "numRecords", "userMetadata")
  }

  /** DESCRIBE DETAIL (Delta parity): one row of table-level metadata —
    * format, name, location, created/last-modified commit times, live
    * file count and bytes, TBLPROPERTIES, current version, and the
    * number of live deletion-vector commits awaiting materialization.
    * Reads the commit log plus one listing per LIVE data dir (O(live
    * files), like Delta computing the same from its log — never a data
    * scan). Partition columns are always empty: graft tables version
    * whole commits and cluster via Z-ORDER instead. */
  def describeDetail(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val entries = manifest(spark, table)
    require(entries.nonEmpty, s"no committed versions for $table")
    val live = liveEntries(entries)
    val f = fs(spark, tableDir(table))
    val dataFiles = live.filterNot(VersionedParquetSink.isDv).flatMap { e =>
      val p = new Path(
        VersionedParquetSink.resolveDir(tableDir(table), e.dir))
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    Seq((
      "graft", table, tableDir(table),
      entries.headOption.flatMap(_.ts)
        .map(new java.sql.Timestamp(_)).orNull,
      entries.lastOption.flatMap(_.ts)
        .map(new java.sql.Timestamp(_)).orNull,
      Seq.empty[String],
      dataFiles.size.toLong,
      dataFiles.map(_.getLen).sum,
      propertiesOf(spark, table),
      entries.last.version,
      live.count(VersionedParquetSink.isDv).toLong))
      .toDF("format", "name", "location", "createdAt", "lastModified",
        "partitionColumns", "numFiles", "sizeInBytes", "properties",
        "version", "numDeletionVectors")
  }

  /** Streaming-source read (Delta streaming-source parity): the rows
    * appended in `(fromVersion, latest]`, plus the latest version to
    * feed back as the next cursor. Pure appends are served straight
    * from their commit dirs — O(new data), never O(table) — and
    * content-preserving compactions are skipped, so CDC tailing and
    * OPTIMIZE coexist. A DATA-CHANGING commit in the range
    * (delete/merge/restore/DV/update) throws, exactly like Delta's
    * streaming source on a changed file, unless `skipChangeCommits`
    * (Delta's option of the same name) is set — then those commits are
    * passed over and only appends are delivered. Metadata-only commits
    * (constraints, generated columns, renames/drops) are silently
    * fine; the batch is projected to the LATEST logical schema.
    *
    * Exactly-once recipe: process each batch with an idempotency key
    * derived from the version range (e.g. `"$table:$from-$to"`) via
    * [[appendOnce]]/applyChanges, persist the returned cursor with the
    * output, and replays dedup on the key. */
  def streamSince(spark: SparkSession, table: String, fromVersion: Long,
      skipChangeCommits: Boolean = false,
      untilVersion: Option[Long] = None): (Long, DataFrame) = {
    val entries = manifest(spark, table)
      .filter(e => untilVersion.forall(e.version <= _))
    require(entries.nonEmpty, s"no committed versions for $table" +
      untilVersion.fold("")(u => s" at or before v$u"))
    val latest = entries.last.version
    val range = entries.filter(_.version > fromVersion)
    val changing = range.filter(e =>
      (e.compacts.isDefined && !e.op.contains("compact")) ||
        VersionedParquetSink.isMergeOnRead(e))
    if (changing.nonEmpty && !skipChangeCommits)
      throw new IllegalStateException(
        s"streamSince($table, $fromVersion): data-changing commit(s) " +
          s"${changing.map(e => s"v${e.version}(${e.op.getOrElse("rewrite")})")
            .mkString(", ")} in range — streaming a table that rewrites " +
          "history needs skipChangeCommits=true (appends-only delivery) " +
          "or a CDF consumer (changesBetween)")
    val appendDirs = range
      .filter(e => e.compacts.isEmpty && e.replaces.isEmpty &&
        !VersionedParquetSink.isMergeOnRead(e))
      .map(e => VersionedParquetSink.resolveDir(tableDir(table), e.dir))
    val mapping = VersionedParquetSink.ColumnMapping.parse(
      entries.lastOption.flatMap(_.mapping))
    val logical = entries.lastOption.flatMap(_.schemaDdl).map(ddl =>
      StructType(StructType.fromDDL(ddl).fields.map(_.copy(nullable = true))))
      .getOrElse(readAt(spark, table, latest).schema)
    val df =
      if (appendDirs.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
      else {
        val scanned = spark.read.schema(VersionedParquetSink.ColumnMapping
          .physicalSchema(logical, mapping)).parquet(appendDirs: _*)
        if (mapping.isEmpty) scanned
        else scanned.select(logical.fields.toSeq.map(f =>
          col(VersionedParquetSink.ColumnMapping
            .physicalName(mapping, f.name)).as(f.name)): _*)
      }
    (latest, df)
  }
}

object VersionedParquetSink {

  /** The ONE parser for the `graft.identity.<col>` = "start:step:hw"
    * TBLPROPERTIES codec — shared by the sink's allocation path and the
    * `_delta_log` mirror so the two can never drift. */
  private[engine] def identityDecls(
      props: Map[String, String]): Map[String, (Long, Long, Long)] =
    props.collect {
      case (k, v) if k.startsWith("graft.identity.") =>
        val Array(s, i, h) = v.split(':')
        k.stripPrefix("graft.identity.") -> ((s.toLong, i.toLong, h.toLong))
    }
  /** Serializes marker claims within one JVM (see commitLoop). */
  private[engine] val localClaimLock = new Object

  /** Resolve a commit's data dir against its table dir. A plain dir is
    * the fast-path concatenation; a `../`-escaping dir (written by
    * SHALLOW CLONE markers, which re-point at the source table's data)
    * is resolved TEXTUALLY to a clean absolute path — `..` components
    * must never reach a FileSystem (HDFS rejects them; local FS would
    * resolve but list back unnormalized paths). */
  private[graft] def resolveDir(tableBase: String, dir: String): String =
    if (!dir.startsWith("../")) s"$tableBase/$dir"
    else (tableBase.split('/').toVector ++ dir.split('/'))
      .foldLeft(Vector.empty[String]) {
        case (acc, "..") if acc.nonEmpty && acc.last != ".." => acc.dropRight(1)
        case (acc, s) => acc :+ s
      }.mkString("/")

  /** One committed version: the raw marker body plus its parsed fields.
    * `compacts` marks a compaction commit that supersedes every version
    * <= its value; `schemaDdl` is the commit's schema; `ts` the commit
    * wall-clock (epoch millis) for timestamp time travel; `stats` the
    * per-file min/max JSON (Delta add-action shape) for data skipping. */
  private[engine] final case class Commit(version: Long, dir: String,
      key: Option[String], compacts: Option[Long], schemaDdl: Option[String],
      ts: Option[Long], op: Option[String], stats: Option[String],
      constraints: Option[String], mapping: Option[String],
      generated: Option[String], props: Option[String],
      replaces: Seq[String],
      // COPY INTO's file ledger: source-file identities (uri@mtime:len)
      // this commit loaded — the union across the manifest is the
      // already-loaded set a re-run skips
      copied: Seq[String],
      // free-form commit annotation (Delta's commitInfo.userMetadata)
      userMeta: Option[String], raw: String)

  /** A deletion-vector commit: its dir holds `(path, pos)` row positions
    * to MASK from the scan, not table data. */
  private[engine] def isDv(e: Commit): Boolean = e.op.contains("dv")

  /** A staged-but-unclaimed append: the written data dir plus everything
    * the commit claim needs (schema, stats, the governance state the
    * rows were validated against). Serializable into the `_txn` manifest
    * so a crashed multi-table transaction can be completed by any later
    * process. */
  private[engine] final case class Staged(table: String, unique: String,
      schemaDdl: String, statsJson: String, constraints: Option[String],
      mapping: Option[String], newMapping: Option[String],
      generated: Option[String])

  private[engine] object Staged {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def renderTxn(key: String, staged: Seq[Staged]): String = {
      val root = mapper.createObjectNode()
      root.put("key", key)
      val arr = root.putArray("tables")
      staged.foreach { s =>
        val n = arr.addObject()
        n.put("table", s.table)
        n.put("dir", s.unique)
        n.put("schemaDdl", s.schemaDdl)
        n.put("stats", s.statsJson)
        s.constraints.foreach(n.put("constraints", _))
        s.mapping.foreach(n.put("mapping", _))
        s.newMapping.foreach(n.put("newMapping", _))
        s.generated.foreach(n.put("generated", _))
      }
      mapper.writeValueAsString(root)
    }
    def parseTxn(json: String): (String, Seq[Staged]) = {
      import scala.jdk.CollectionConverters._
      val root = mapper.readTree(json)
      val staged = root.get("tables").elements().asScala.map { n =>
        def opt(f: String) = Option(n.get(f)).map(_.asText)
        Staged(n.get("table").asText, n.get("dir").asText,
          n.get("schemaDdl").asText, n.get("stats").asText,
          opt("constraints"), opt("mapping"), opt("newMapping"),
          opt("generated"))
      }.toSeq
      (root.get("key").asText, staged)
    }
  }

  /** CHECK-constraint set serialization: a JSON object of name -> SQL
    * expression, keys sorted so equal sets render byte-identically (the
    * commit loop compares renderings to detect concurrent changes). */
  private[engine] object Constraints {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(json: Option[String]): Seq[(String, String)] =
      json.toSeq.flatMap { j =>
        import scala.jdk.CollectionConverters._
        mapper.readTree(j).properties().asScala
          .map(p => p.getKey -> p.getValue.asText).toSeq
      }.sortBy(_._1)
    def render(cs: Seq[(String, String)]): Option[String] =
      if (cs.isEmpty) None
      else {
        val n = mapper.createObjectNode()
        cs.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
        Some(mapper.writeValueAsString(n))
      }
  }

  /** Column-mapping serialization (Delta column mapping, `name` mode):
    * a JSON object `{"<logical>": {"p": "<physical>", "id": N}}`, keys
    * sorted for byte-identical renderings of equal maps. Physical names
    * are what the parquet FILES carry and are immutable for a column's
    * lifetime; logical names live in the manifest schema and are what
    * users see. Absent mapping (every table until its first
    * rename/drop) means physical == logical. Field ids are stable and
    * never reused — a dropped-then-readded column gets a fresh id AND a
    * fresh physical name, so old file data can never resurrect under
    * the new column. */
  private[engine] object ColumnMapping {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    final case class Entry(physical: String, id: Int)
    def parse(json: Option[String]): Seq[(String, Entry)] =
      json.toSeq.flatMap { j =>
        import scala.jdk.CollectionConverters._
        mapper.readTree(j).properties().asScala.map { p =>
          p.getKey -> Entry(p.getValue.get("p").asText,
            p.getValue.get("id").asInt)
        }.toSeq
      }.sortBy(_._1)
    def render(m: Seq[(String, Entry)]): Option[String] =
      if (m.isEmpty) None
      else {
        val n = mapper.createObjectNode()
        m.sortBy(_._1).foreach { case (k, e) =>
          val o = n.putObject(k); o.put("p", e.physical); o.put("id", e.id)
        }
        Some(mapper.writeValueAsString(n))
      }
    /** First enablement: every current column keeps its name as its
      * physical name (matching every already-written file), ids in
      * schema order. */
    def identity(schema: org.apache.spark.sql.types.StructType):
        Seq[(String, Entry)] =
      schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        f.name -> Entry(f.name, i + 1)
      }
    def physicalName(m: Seq[(String, Entry)], logical: String): String =
      m.find(_._1 == logical).map(_._2.physical).getOrElse(logical)
    /** The schema as the parquet files spell it. */
    def physicalSchema(logical: org.apache.spark.sql.types.StructType,
        m: Seq[(String, Entry)]): org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(
        logical.fields.map(f => f.copy(name = physicalName(m, f.name))))
  }

  /** Any commit carrying a positional mask: a pure DV delete (whole dir
    * is the mask) or a merge-on-read UPDATE (data dir with the mask in
    * its `_dv/` subdir — hidden from parquet listings by the underscore
    * convention, so the same dir serves both payloads atomically). */
  private[engine] def isMergeOnRead(e: Commit): Boolean =
    isDv(e) || e.op.contains("update")

  /** Where commit `e`'s mask parquet lives, relative to the table dir. */
  private[engine] def maskDir(e: Commit): String =
    if (isDv(e)) e.dir else s"${e.dir}/_dv"

  /** The entries a reader actually scans: the NEWEST compaction commit
    * plus every non-compaction append past its high-water mark. Older
    * compaction commits are NEVER read — each holds only a redundant
    * full copy of data the chosen compaction + later appends already
    * cover, and including one duplicates every folded row (found by the
    * concurrent-compaction stress test). */
  private[engine] def liveEntries(entries: Seq[Commit]): Seq[Commit] = {
    val comp = entries.filter(_.compacts.isDefined)
      .sortBy(_.version).lastOption
    val base = comp match {
      case None => entries
      case Some(c) =>
        c +: entries.filter(e =>
          e.version > c.compacts.get && e.compacts.isEmpty)
    }
    // dir-granular selective rewrites (OPTIMIZE WHERE): a dir whose base
    // name appears in a commit's `replaces` list is superseded by that
    // commit's folded copy. Base-name matching so a clone's re-pointed
    // `../src/<dir>` spelling of the same UUID-unique dir still matches.
    val replaced = base.iterator.flatMap(_.replaces).toSet
    if (replaced.isEmpty) base
    else base.filter(e => !replaced.contains(e.dir.split('/').last))
  }

  /** A delete/merge found a commit newer than the snapshot it rewrote —
    * the write-write conflict Delta surfaces as
    * ConcurrentWriteException. Retried internally; escapes only after
    * repeated conflicts (sustained contention the caller should see). */
  final class ConcurrentRewriteException(table: String, base: Long,
      found: Long) extends RuntimeException(
    s"concurrent commit on '$table': rewrite based on v$base but latest is v$found")
}
