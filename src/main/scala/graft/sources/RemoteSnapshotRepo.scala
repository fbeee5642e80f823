package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path => JPath, Paths}

import org.apache.spark.sql.SparkSession

/** Push/pull of published snapshots against a REMOTE block registry —
  * the reference's freeze-then-push-to-bucket cycle (core/freezer.go
  * Push → remote/gcs.go:179-197 DoesNotExist CAS put per block;
  * gcs.go:114-127 SetRoot label pointer) and its mount-from-bucket
  * inverse (GetRoot → manifest block → generation-pinned ranged readers,
  * gcs.go:129-151, 302-331).
  *
  * Two publish routes, both against the `BlockRegistry` seam (so GCS- and
  * S3-protocol registries are interchangeable):
  *
  *  - `push`: the local SnapshotStore stays the staging/publish authority
  *    (hashing, manifests, labels); push moves a published manifest's
  *    closure across the wire.
  *  - `publishDirect`: a working tree goes STRAIGHT to the remote
  *    registry — Spark tasks hash and CAS-upload file blocks
  *    executor-side, the driver commits manifest-then-pointer. No local
  *    staging copy: at 100 TB the data moves exactly once, fanned out
  *    over the cluster, and the driver handles only O(files) manifest
  *    metadata (the same commit-protocol shape as every table format).
  *
  * Everything is content-addressed, so:
  *
  *  - push is IDEMPOTENT: a block already in the remote CAS is skipped
  *    (putIfAbsent false), so re-pushing a label uploads only new blocks
  *    — the incremental-republish property, now across the wire;
  *  - pull is LAZY: mounting resolves the label and manifest eagerly
  *    (two small reads) but file bytes ride pinned ranged readers
  *    through the pufs:// chunk cache on demand — a mount of a
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
  def push(repo: String, ref: String, reg: BlockRegistry,
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

  /** Publish a working tree DIRECTLY to the remote registry under
    * `label` — no local staging repo. File blocks are hashed and
    * CAS-uploaded task-side (each partition opens its own registry
    * client from the serializable `conf`); the driver collects only
    * (path, size, sha, uploaded) manifest metadata, uploads the manifest
    * block, then flips the label pointer — pointer LAST. The manifest
    * bytes are identical to `SnapshotStore.publish`'s, so a direct
    * publish of the same tree yields the same manifest sha as
    * stage-then-push, and re-publishing an unchanged tree uploads
    * nothing (CAS skips every block AND the manifest). */
  def publishDirect(spark: SparkSession, srcDir: String,
      conf: RegistryConf, label: String): (String, PushStats) = {
    val root = Paths.get(srcDir)
    val files: Seq[(String, Long)] = {
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[JPath])
        .toSeq.map { f =>
          (root.relativize(f).toString.replace(File.separatorChar, '/'),
            Files.size(f))
        }
      finally s.close()
    }
    val srcRoot = srcDir
    val parts = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism))
    // the collect is manifest METADATA (path/size/sha per file), not data
    val hashed: Seq[(String, Long, String, Boolean)] =
      if (files.isEmpty) Seq.empty
      else spark.sparkContext.parallelize(files, parts).mapPartitions { it =>
        val reg = conf.open()
        it.map { case (p, sz) =>
          val f = new File(srcRoot, p)
          val sha = PufsFileSystem.sha256File(f)
          val up = reg.pushBlock(sha, Files.readAllBytes(f.toPath))
          (p, sz, sha, up)
        }
      }.collect().toSeq
    val entries = hashed
      .map { case (p, sz, sha, _) => SnapshotStore.ManifestEntry(p, sz, sha) }
      .sortBy(_.path)
    val manifestBytes = entries
      .map(e => s"${e.path}\t${e.size}\t${e.sha256}").mkString("\n")
      .getBytes(UTF_8)
    val manifestSha = PufsFileSystem.sha256Bytes(manifestBytes)
    val reg = conf.open()
    val manifestUp = reg.pushBlock(manifestSha, manifestBytes)
    reg.setRoot(label, manifestSha.getBytes(UTF_8))
    val up = hashed.count(_._4) + (if (manifestUp) 1 else 0)
    (manifestSha, PushStats(up, hashed.size + 1 - up))
  }

  /** Resolve a remote label to its manifest entries — the eager half of a
    * mount (GetRoot + one manifest read; file bytes stay remote). */
  def mount(reg: BlockRegistry, label: String): (String, Seq[SnapshotStore.ManifestEntry]) = {
    val sha = new String(reg.getRoot(label).getOrElse(
      throw new java.io.FileNotFoundException(s"no remote root: $label")), UTF_8)
    val manifest = new String(
      reg.openBlock(sha).read(0, reg.blockSize(sha).toInt), UTF_8)
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
  def openFile(reg: BlockRegistry, entry: SnapshotStore.ManifestEntry,
      cacheDir: String, chunkSize: Long = PufsFileSystem.DefaultChunkSize): LazyPullInputStream = {
    val store = reg.openBlock(entry.sha256)
    val cache = PufsFileSystem.cacheEntry(cacheDir,
      s"remote-${entry.sha256}", entry.size)
    new LazyPullInputStream(cache, store, entry.size, chunkSize, 0)
  }
}
