package graft.fs

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * The stock Hadoop local filesystem minus its per-file fork/exec.
 *
 * Without the native hadoop library (`libhadoop.so` — absent in this
 * environment, and in most plain-JVM deployments), EVERY file create
 * through the Hadoop local filesystem pays a fork/exec:
 * `RawLocalFileSystem.LocalFSFileOutputStream` applies the requested
 * permission via `setPermission`, whose non-native fallback is
 * `Shell.execCommand("chmod", ...)` — one forked process per data
 * file, per `.crc` sidecar, and per `mkdirs` level. jstack sampling of
 * the bench showed these forks as the single hottest activity of the
 * index-write and streaming-checkpoint paths (a bucketed index write
 * is tasks × buckets files; a stateful streaming query is partitions ×
 * operators × micro-batches checkpoint files).
 *
 * [[NoChmodRawLocalFileSystem]] no-ops `setPermission`, so created
 * files keep the JVM's umask-derived mode — indistinguishable in
 * effect from the 644 Hadoop would have chmod-ed onto them here.
 * [[NoChmodLocalFileSystem]] wraps it in the standard
 * `LocalFileSystem` checksum/buffering decorator, so read buffering,
 * `.crc` verification, and every other behavior of the default local
 * filesystem are UNCHANGED (a raw, checksum-less FS was measured first
 * and regressed reads — its input streams are unbuffered).
 *
 * Scale honesty: this is I/O plumbing for `file:` deployments only —
 * HDFS/S3A/ABFS schemes resolve their own FileSystem classes and are
 * unaffected; a cluster with the native library loaded never hits the
 * exec fallback in the first place.
 */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class NoChmodLocalFileSystem
  extends LocalFileSystem(new NoChmodRawLocalFileSystem)
