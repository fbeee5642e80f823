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
    val (hashed, reg) = hashAndUpload(spark, srcDir, conf)
    val entries = hashed
      .map { case (p, sz, sha, _) => SnapshotStore.ManifestEntry(p, sz, sha) }
      .sortBy(_.path)
    val manifestBytes = entries
      .map(e => s"${e.path}\t${e.size}\t${e.sha256}").mkString("\n")
      .getBytes(UTF_8)
    val manifestSha = PufsFileSystem.sha256Bytes(manifestBytes)
    val manifestUp = reg.pushBlock(manifestSha, manifestBytes)
    reg.setRoot(label, manifestSha.getBytes(UTF_8))
    val up = hashed.count(_._4) + (if (manifestUp) 1 else 0)
    (manifestSha, PushStats(up, hashed.size + 1 - up))
  }

  /** Shared fan-out half of the direct publishers: walk the tree, hash +
    * CAS-upload every file block task-side (one registry client per
    * partition), collect (path, size, sha, uploaded) manifest metadata. */
  private def hashAndUpload(spark: SparkSession, srcDir: String,
      conf: RegistryConf): (Seq[(String, Long, String, Boolean)], BlockRegistry) = {
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
    (hashed, conf.open())
  }

  /** Resolve a remote label to its manifest entries — the eager half of a
    * mount (GetRoot + one manifest read; file bytes stay remote). A
    * sharded root (see `pushSharded`) is handled transparently: every
    * shard is loaded, so flat and sharded labels serve the same callers. */
  def mount(reg: BlockRegistry, label: String): (String, Seq[SnapshotStore.ManifestEntry]) = {
    val sha = resolveRoot(reg, label)
    val text = readBlockText(reg, sha)
    if (text.startsWith(IndexHeader))
      (sha, parseIndex(text).flatMap(s => parseManifest(readBlockText(reg, s.sha))))
    else (sha, parseManifest(text))
  }

  private def resolveRoot(reg: BlockRegistry, label: String): String =
    new String(reg.getRoot(label).getOrElse(
      throw new java.io.FileNotFoundException(s"no remote root: $label")), UTF_8)

  private def readBlockText(reg: BlockRegistry, sha: String): String = {
    val (store, size) = reg.openBlockSized(sha) // one metadata probe
    new String(store.read(0, size.toInt), UTF_8)
  }

  private def parseManifest(text: String): Seq[SnapshotStore.ManifestEntry] =
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(p, s, h) = line.split("\t")
      SnapshotStore.ManifestEntry(p, s.toLong, h)
    }

  // ---- sharded manifests ------------------------------------------------
  //
  // A flat manifest is one block holding every (path, size, sha) line: at
  // 10M files that is a ~600 MB eager read+parse PER MOUNT, even when the
  // reader wants one table out of the lake. The sharded layout is the
  // reference's hierarchical inode-tree idea applied to the snapshot
  // root: the label points at a small INDEX block (one line per top-level
  // directory), each line naming a per-directory shard manifest block.
  // Mounting a prefix then costs O(index + that shard), not O(all files)
  // — and because shards are content-addressed CAS blocks, an
  // incremental republish re-uploads only the touched file's block, its
  // shard manifest, and the index.

  private val IndexHeader = "#graft-manifest-index v1"

  /** One index line: top-level-dir shard → its manifest block. */
  case class ShardInfo(prefix: String, sha: String, files: Int, bytes: Long)

  private def shardKey(path: String): String = {
    val i = path.indexOf('/')
    if (i < 0) "" else path.substring(0, i)
  }

  private def parseIndex(text: String): Seq[ShardInfo] =
    text.split("\n").toSeq.drop(1).filter(_.nonEmpty).map { line =>
      val Array(p, s, f, b) = line.split("\t", 4)
      ShardInfo(p, s, f.toInt, b.toLong)
    }

  /** Shared commit half of the sharded publishers: shard manifest block
    * per top-level directory, then the index block, then the pointer —
    * pointer LAST. The shard/index wire format lives HERE ONLY, so the
    * "direct publish yields the same root sha as stage-then-push"
    * invariant cannot rot by the two callers drifting apart. `cas`
    * counts an upload or a skip per block. */
  private def commitShardedRoot(entries: Seq[SnapshotStore.ManifestEntry],
      reg: BlockRegistry, label: String,
      cas: (String, Array[Byte]) => Unit): String = {
    val shards = entries.groupBy(e => shardKey(e.path)).toSeq.sortBy(_._1)
      .map { case (prefix, es) =>
        val bytes = es.sortBy(_.path)
          .map(e => s"${e.path}\t${e.size}\t${e.sha256}").mkString("\n")
          .getBytes(UTF_8)
        val shardSha = PufsFileSystem.sha256Bytes(bytes)
        cas(shardSha, bytes)
        ShardInfo(prefix, shardSha, es.size, es.map(_.size).sum)
      }
    val indexBytes =
      (IndexHeader +: shards.map(s => s"${s.prefix}\t${s.sha}\t${s.files}\t${s.bytes}"))
        .mkString("\n").getBytes(UTF_8)
    val indexSha = PufsFileSystem.sha256Bytes(indexBytes)
    cas(indexSha, indexBytes)
    reg.setRoot(label, indexSha.getBytes(UTF_8))
    indexSha
  }

  /** Push `repo`@`ref` under `label` with a SHARDED root: file blocks,
    * then one shard manifest block per top-level directory, then the
    * index block, then the pointer — still pointer-last. Re-pushing
    * after a one-file change uploads that block + its shard + the index;
    * every untouched shard is CAS-skipped. */
  def pushSharded(repo: String, ref: String, reg: BlockRegistry,
      label: String): PushStats = {
    val sha = SnapshotStore.getRoot(repo, ref).getOrElse(ref)
    val entries = SnapshotStore.mountAt(repo, sha)
    var up = 0; var skip = 0
    def cas(bidHex: String, body: Array[Byte]): Unit =
      if (reg.pushBlock(bidHex, body)) up += 1 else skip += 1
    entries.map(_.sha256).distinct.foreach { blockSha =>
      cas(blockSha, SnapshotStore.readBlock(repo, blockSha))
    }
    commitShardedRoot(entries, reg, label, cas)
    PushStats(up, skip)
  }

  /** `publishDirect` composed with the sharded layout: task-side hashing
    * and CAS upload straight from a working tree, sharded root commit.
    * The 100 TB publish shape — data moves once, fanned out; the driver
    * handles O(files) metadata and writes O(top-dirs) small blocks. */
  def publishDirectSharded(spark: SparkSession, srcDir: String,
      conf: RegistryConf, label: String): (String, PushStats) = {
    val (hashed, reg) = hashAndUpload(spark, srcDir, conf)
    var up = hashed.count(_._4); var skip = hashed.count(!_._4)
    def cas(bidHex: String, body: Array[Byte]): Unit =
      if (reg.pushBlock(bidHex, body)) up += 1 else skip += 1
    val entries = hashed
      .map { case (p, sz, sha, _) => SnapshotStore.ManifestEntry(p, sz, sha) }
    val indexSha = commitShardedRoot(entries, reg, label, cas)
    (indexSha, PushStats(up, skip))
  }

  /** The index of a sharded label — O(top-level dirs), no shard reads:
    * the cheap "what tables does this lake hold, how big" probe. */
  def mountIndex(reg: BlockRegistry, label: String): (String, Seq[ShardInfo]) = {
    val sha = resolveRoot(reg, label)
    val text = readBlockText(reg, sha)
    if (!text.startsWith(IndexHeader))
      throw new java.io.IOException(s"root of $label is not a sharded manifest")
    (sha, parseIndex(text))
  }

  /** Mount ONE top-level directory of a sharded label: reads the index
    * and exactly the matching shard manifest — other shards' blocks are
    * never touched, so mounting one table of a 10M-file lake moves
    * O(that table's manifest) bytes, not O(lake). */
  def mountShard(reg: BlockRegistry, label: String,
      topDir: String): Seq[SnapshotStore.ManifestEntry] = {
    val (_, shards) = mountIndex(reg, label)
    shards.find(_.prefix == topDir) match {
      case None => Seq.empty
      case Some(s) => parseManifest(readBlockText(reg, s.sha))
    }
  }

  /** Garbage-collect the remote registry: everything reachable from a
    * root pointer or an UNEXPIRED lease stays; every other CAS block is
    * deleted, and expired leases are removed — the reference's RunGC
    * reachability contract (datastore.go:48-51; leases renewLeases
    * 240-253), applied to the bucket. Reachability walks flat and
    * sharded roots alike (index → shard manifests → file blocks) and
    * reads only MANIFEST blocks, never file data. Returns (blocks
    * deleted, expired leases removed).
    *
    * Concurrent-publish safety is the lease contract: a publisher that
    * cannot finish before a GC horizon takes `setLease` on its manifest
    * first (the same discipline the local store's publish applies);
    * blocks of a half-pushed closure whose pointer never flipped and
    * that holds no lease are exactly the garbage this removes. */
  def gc(reg: BlockRegistry,
      now: Long = System.currentTimeMillis()): (Int, Int) = {
    val live = scala.collection.mutable.Set[String]()
    def addManifest(sha: String): Unit = {
      if (!live.add(sha)) return
      val text =
        try readBlockText(reg, sha)
        catch { case _: java.io.IOException => return } // dangling pointer
      // A pointer may target a block that is NOT a manifest we wrote (a
      // label set straight to a file block's sha, a half-written pointer,
      // a foreign object under root/). Unparseable content is treated as
      // a LEAF — the pointed-at block stays live, its (nonexistent)
      // children are skipped — so one bad pointer can never abort the GC
      // run with leases unexpired and garbage uncollected. Partial adds
      // before a parse throw only over-retain, which is the safe side.
      try {
        if (text.startsWith(IndexHeader)) parseIndex(text).foreach { s =>
          if (live.add(s.sha))
            try parseManifest(readBlockText(reg, s.sha))
              .foreach(e => live += e.sha256)
            catch { case scala.util.control.NonFatal(_) => }
        }
        else parseManifest(text).foreach(e => live += e.sha256)
      } catch { case scala.util.control.NonFatal(_) => }
    }
    reg.listRoots().foreach { name =>
      reg.getRoot(name).foreach(bid => addManifest(new String(bid, UTF_8)))
    }
    var leasesDropped = 0
    reg.listLeases().foreach { name =>
      reg.getLease(name) match {
        case Some((expiry, bid)) if expiry > now =>
          addManifest(new String(bid, UTF_8))
        case _ =>
          reg.deleteLease(name); leasesDropped += 1
      }
    }
    var deleted = 0
    reg.listBlocks().foreach { bid =>
      if (!live.contains(bid)) { reg.deleteBlock(bid); deleted += 1 }
    }
    (deleted, leasesDropped)
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
