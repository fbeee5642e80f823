package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Push/pull of published snapshots against a REMOTE block registry —
  * the reference's freeze-then-push-to-bucket cycle (core/freezer.go
  * Push → remote/gcs.go:179-197 DoesNotExist CAS put per block;
  * gcs.go:114-127 SetRoot label pointer) and its mount-from-bucket
  * inverse (GetRoot → manifest block → generation-pinned ranged readers,
  * gcs.go:129-151, 302-331).
  *
  * The local SnapshotStore stays the staging/publish authority (hashing,
  * manifests, labels); this layer moves a published manifest's closure to
  * a GcsRefRegistry and back. Everything is content-addressed, so:
  *
  *  - push is IDEMPOTENT: a block already in the remote CAS is skipped
  *    (putIfAbsent false), so re-pushing a label uploads only new blocks
  *    — the incremental-republish property, now across the wire;
  *  - pull is LAZY: mounting resolves the label and manifest eagerly
  *    (two small reads) but file bytes ride pinned `GcsStore` ranged
  *    readers through the pufs:// chunk cache on demand — a mount of a
  *    100 TB snapshot transfers the manifest, then exactly the chunks
  *    readers touch. */
object RemoteSnapshotRepo {

  /** Upload counts: (blocks uploaded, blocks already present). */
  case class PushStats(uploaded: Int, skipped: Int)

  /** Push `repo`@`ref` (label or manifest sha) to the registry under
    * `label`: every file block CAS-put-if-absent, then the manifest
    * block, then the replace-on-write label pointer — pointer LAST, so a
    * reader that resolves the label never sees a manifest whose closure
    * is not yet fully present (the same commit ordering as the local
    * publish protocol). */
  def push(repo: String, ref: String, reg: GcsRefRegistry,
      label: String): PushStats = {
    val sha = SnapshotStore.getRoot(repo, ref).getOrElse(ref)
    val entries = SnapshotStore.mountAt(repo, sha)
    var up = 0; var skip = 0
    entries.map(_.sha256).distinct.foreach { blockSha =>
      if (reg.pushBlock(blockSha, SnapshotStore.readBlock(repo, blockSha))) up += 1
      else skip += 1
    }
    if (reg.pushBlock(sha, SnapshotStore.readBlock(repo, sha))) up += 1
    else skip += 1
    reg.setRoot(label, sha.getBytes(UTF_8))
    PushStats(up, skip)
  }

  /** Resolve a remote label to its manifest entries — the eager half of a
    * mount (GetRoot + one manifest read; file bytes stay remote). */
  def mount(reg: GcsRefRegistry, label: String): (String, Seq[SnapshotStore.ManifestEntry]) = {
    val sha = new String(reg.getRoot(label).getOrElse(
      throw new java.io.FileNotFoundException(s"no remote root: $label")), UTF_8)
    val manifest = new String(
      reg.openBlock(sha).read(0, reg.blockSource(sha)._2.toInt), UTF_8)
    val entries = manifest.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(p, s, h) = line.split("\t")
      SnapshotStore.ManifestEntry(p, s.toLong, h)
    }
    (sha, entries)
  }

  /** A generation-pinned lazy reader over one mounted file, fed through
    * the pufs:// chunk cache: only the chunks the caller touches are
    * pulled, re-reads are local, and a block replaced remotely under the
    * open reader fails with TornReadException instead of mixing
    * generations. */
  def openFile(reg: GcsRefRegistry, entry: SnapshotStore.ManifestEntry,
      cacheDir: String, chunkSize: Long = PufsFileSystem.DefaultChunkSize): LazyPullInputStream = {
    val store = reg.openBlock(entry.sha256)
    val cache = PufsFileSystem.cacheEntry(cacheDir,
      s"remote-${entry.sha256}", entry.size)
    new LazyPullInputStream(cache, store, entry.size, chunkSize, 0)
  }
}
