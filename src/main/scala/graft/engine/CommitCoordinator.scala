package graft.engine

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single coordination primitive the commit protocol rides on:
  * atomically publish a small file at an exact path IF AND ONLY IF
  * nothing exists there — a filesystem compare-and-swap on absence.
  * Every exactly-once property in [[VersionedParquetSink]] reduces to
  * this one operation: version-number claims (`<n>.commit` markers,
  * so two writers can never both own version n), keyed idempotency
  * (the marker CARRIES the key, so claim atomicity is dedup
  * atomicity), multi-table transaction manifests (`_txn/<key>.json` is
  * the commit point), and clone marker publication.
  *
  * Contract of [[publishIfAbsent]]:
  *  - returns true  — `body` is now durably at `target`; the caller
  *    won the claim. At most one concurrent caller per `target` may
  *    ever see true.
  *  - returns false — a COMPETITOR's file owns `target` (it existed
  *    before or won the race); the caller must re-read state and
  *    retry/complete the winner's work. The implementation owns
  *    cleanup of any temporary bytes it wrote.
  *  - throws        — the store failed in a way "lost the race" cannot
  *    explain (permissions, broken filesystem): failing loudly beats
  *    spinning on a store that will never accept a claim.
  *
  * Implementations for other stores (the protocol note, in the
  * DeltaLogMirror style): the primitive is exactly a CONDITIONAL PUT.
  *  - S3: `PutObject` with `If-None-Match: *` (supported since 2024) —
  *    returns 412 when the key exists; map 412 to false, success to
  *    true. No temp object needed: S3 PUTs are already all-or-nothing.
  *  - GCS: `insert` with `ifGenerationMatch=0` — 412 when the object
  *    exists.
  *  - Azure Blob / ADLS: `Put Blob` with `If-None-Match: *`, or rely on
  *    ABFS's atomic rename (hierarchical namespace) via the default
  *    implementation below.
  *  - DynamoDB/JDBC-style coordinators (what delta-rs / Delta's
  *    S3DynamoDBLogStore do for pre-conditional-PUT S3): a conditional
  *    `PutItem` on the marker path as primary key, then write the file
  *    body best-effort (readers resolve the winner from the table).
  * Whatever the store, the mapping is mechanical because the calling
  * protocol never needs read-after-list consistency of the CLAIM —
  * winners re-validate visibility against the manifest afterwards (the
  * phantom-claim guard in the commit loop).
  */
trait CommitCoordinator {
  def publishIfAbsent(f: FileSystem, target: Path, body: Array[Byte]): Boolean
}

/** Coordinator for stores whose ONLY atomic primitive is a conditional
  * PUT — the S3 (`If-None-Match: *`), GCS (`ifGenerationMatch=0`) and
  * Azure (`Put Blob` + `If-None-Match: *`) shape. An adapter supplies
  * the store's put-if-absent and the trait contract maps onto it 1:1:
  * the PUT is all-or-nothing and carries the full body, so there is no
  * temp file, no rename, and no exists-check anywhere in the claim —
  * the properties object stores cannot give. `putIfAbsent` must return
  * true iff the body now durably owns the (qualified) target, false iff
  * a competitor's object does, and throw on store failure (the trait's
  * fail-loudly clause). The offline emulation in the test tree
  * (`TestCoordinators.condPut`) drives the whole sink protocol —
  * including the cross-process races — through exactly this seam. */
final class ConditionalPutCommitCoordinator(
    putIfAbsent: (FileSystem, Path, Array[Byte]) => Boolean)
    extends CommitCoordinator {
  override def publishIfAbsent(f: FileSystem, target: Path,
      body: Array[Byte]): Boolean =
    putIfAbsent(f, f.makeQualified(target), body)
}

/** Default coordinator: temp-write in the target's directory, then an
  * atomic claim of the target path.
  *
  * On LOCAL filesystems the claim is a HARD LINK (`link(2)`): POSIX
  * `rename(2)` REPLACES an existing destination, so the historical
  * exists-check + rename is check-then-act with a (narrow) lost-claim
  * window across processes — two claimants could in principle both
  * "win" and the second body would replace the first. `link(2)` fails
  * with EEXIST atomically in the kernel, making the claim a true CAS
  * on absence, with the full body visible at the target in one step.
  * (The cross-process races in MultiJvmRaceSpec pin exactly this
  * implementation with the filesystem as the only channel.)
  *
  * On non-local stores (HDFS, ABFS — whose rename is atomic
  * no-replace) and on filesystems without hard links, the claim falls
  * back to exists-check + rename. The
  * rename-failed-but-nothing-there case throws: an unexplained rename
  * failure means a broken store, and treating it as a lost race would
  * spin forever. */
object RenameCommitCoordinator extends CommitCoordinator {
  override def publishIfAbsent(f: FileSystem, target: Path,
      body: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent, s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    val qTarget = f.makeQualified(target)
    if (qTarget.toUri.getScheme == "file") {
      val linkAt = java.nio.file.Paths.get(qTarget.toUri.getPath)
      val existing = java.nio.file.Paths.get(
        f.makeQualified(tmp).toUri.getPath)
      val linked: Option[Boolean] =
        try {
          java.nio.file.Files.createLink(linkAt, existing)
          Some(true)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => Some(false)
          case _: UnsupportedOperationException => None // no hard links
          // Only KNOWN no-hard-link-here errnos may downgrade to the
          // rename claim (EPERM on FAT/exFAT-style mounts, EOPNOTSUPP,
          // EMLINK, EXDEV) — any OTHER FileSystemException means a
          // broken store and must fail loudly per the trait contract;
          // routing it into renameClaim would silently reopen the
          // non-atomic exists-check window the hard link eliminates.
          // (Reason strings come from strerror: on a non-English-locale
          // JVM an eligible errno may rethrow instead of downgrading —
          // loud-over-silent is the right side of that trade.)
          case e: java.nio.file.FileSystemException =>
            val r = Option(e.getReason).getOrElse("").toLowerCase
            val noLinkSupport = r.contains("not permitted") ||
              r.contains("not supported") || r.contains("too many links") ||
              r.contains("cross-device")
            if (noLinkSupport) {
              // name WHICH strerror string routed us into the rename
              // claim (ADVICE r12): "not permitted" also covers
              // immutable-file/security-policy EPERMs, so a downgrade
              // on an unexpected mount should be traceable in the log
              System.err.println(
                s"[commit] hard-link claim downgraded to rename at " +
                  s"${target.getParent}: '${e.getReason}'")
              None
            } else throw e
        }
      linked match {
        case Some(won) => f.delete(tmp, false); won
        case None => renameClaim(f, tmp, target)
      }
    } else renameClaim(f, tmp, target)
  }

  private def renameClaim(f: FileSystem, tmp: Path,
      target: Path): Boolean =
    if (!f.exists(target) && f.rename(tmp, target)) true
    else {
      f.delete(tmp, false)
      if (!f.exists(target)) throw new java.io.IOException(
        s"failed to publish $target (rename failed, no competing file)")
      false
    }
}
