package graft

import graft.sources.SnapshotStore

/** Immutable directory view over a snapshot manifest, shared by the two
  * serving daemons ([[ApiServer]] HTTP+JSON, [[GrpcServer]] gRPC) — the
  * manifest is flat (path → block), so directories are implied by file
  * ancestry, resolved ONCE because published snapshots are content-
  * addressed and frozen (reference: the mount daemon serves a frozen
  * datastore, pufs/cmd/mount.go:354–381). */
final class SnapshotTree(val entries: Seq[SnapshotStore.ManifestEntry]) {

  val byPath: Map[String, SnapshotStore.ManifestEntry] =
    entries.map(e => e.path -> e).toMap

  /** "" (the root) + every ancestor directory of a file. */
  val dirs: Set[String] = entries.flatMap { e =>
    val parts = e.path.split("/").dropRight(1)
    parts.indices.map(i => parts.take(i + 1).mkString("/"))
  }.toSet + ""

  /** Direct children of `dir`, sorted by name:
    * (name, isDir, size, blockSha — "" for dirs). */
  def childrenOf(dir: String): Seq[(String, Boolean, Long, String)] = {
    val prefix = if (dir.isEmpty) "" else dir + "/"
    val subDirs = dirs.filter(d => d != dir && d.startsWith(prefix) &&
      !d.substring(prefix.length).contains("/"))
      .map(d => (d.substring(prefix.length), true, 0L, ""))
    val files = entries.filter(e => e.path.startsWith(prefix) &&
      !e.path.substring(prefix.length).contains("/"))
      .map(e => (e.path.substring(prefix.length), false, e.size, e.sha256))
    (subDirs.toSeq ++ files).sortBy(_._1)
  }
}
