package graft

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.engine.{CommitCoordinator, ConditionalPutCommitCoordinator}

/** Offline emulation of an object store's CONDITIONAL PUT — the only
  * atomic primitive S3 (`If-None-Match: *`), GCS
  * (`ifGenerationMatch=0`) and Azure expose. The emulated service
  * stages the body in a hidden sidecar directory and hard-links it
  * into place; that is the SERVICE's internal mechanics (real S3
  * stages uploads too) — the caller-visible contract is a single
  * all-or-nothing PUT that either durably owns the target or fails
  * because a competitor's object does. Works across OS processes (the
  * multi-JVM race suite drives it from separate JVMs with the
  * filesystem as the only channel), so it is a faithful stand-in for
  * the store-side atomicity the real mapping relies on.
  *
  * What this proves when the whole sink protocol runs through it: the
  * protocol needs NOTHING beyond put-if-absent for its claims — no
  * atomic rename, no exists-then-act, no temp files in the claim path
  * (`ObjectStoreEmulationSpec` asserts the absence of the default
  * coordinator's `.tmp-*` artifacts and of any rename landing a
  * marker). Combined with [[LagListFileSystem]]'s injectable listing
  * lag, it emulates the two properties that make object stores hard:
  * conditional-PUT-only atomicity and LIST that trails PUTs.
  */
object TestCoordinators {
  /** Claims observed / won through the emulated store (per-JVM). */
  val puts = new AtomicLong
  val wins = new AtomicLong

  private def putIfAbsent(f: FileSystem, target: Path,
      body: Array[Byte]): Boolean = {
    puts.incrementAndGet()
    // the emulation backs onto the local filesystem regardless of the
    // Hadoop scheme in front of it (file: or lag:) — exactly like a
    // real store's service side, which the client's FileSystem facade
    // never sees
    val nioTarget = java.nio.file.Paths.get(target.toUri.getPath)
    val stage = nioTarget.getParent.resolve(".osstage")
    java.nio.file.Files.createDirectories(stage)
    val tmp = stage.resolve("up-" + UUID.randomUUID())
    java.nio.file.Files.write(tmp, body)
    try {
      java.nio.file.Files.createLink(nioTarget, tmp)
      wins.incrementAndGet()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
      ()
    }
  }

  /** The coordinator under test: every sink claim maps to one emulated
    * conditional PUT and nothing else. */
  val condPut: CommitCoordinator =
    new ConditionalPutCommitCoordinator(putIfAbsent)
}
