package graft.sources

import java.io.{File, FileNotFoundException, RandomAccessFile}
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** `pufs://` — a lazily-populating, content-addressed, write-once overlay
  * FileSystem (the reference's core idea re-expressed for Spark: reads pull
  * only the byte ranges actually requested into a local cache arena;
  * writes stage locally and freeze into CAS on close).
  *
  * Reference mapping:
  *  - lazy range pull + chunk alignment: ensurePulled
  *    (reference core/freezer.go:125-183; 200 KiB chunk,
  *    core/datastore.go:106)
  *  - region mask bookkeeping: RegionMask (region/region.go:9-124)
  *  - concurrent-reader IO dedup: join-or-start on an in-flight chunk fetch
  *    (reference region/pending.go:267-360) — here a
  *    ConcurrentHashMap[chunk, CompletableFuture] (far simpler with JVM
  *    futures than the goroutine/cancel dance)
  *  - readahead: fetches extend to `readahead` bytes beyond the request
  *    (reference DefaultMaxBackgroundTransfer 5 MiB, core/freezer.go:226)
  *  - CAS freeze on close: sha256 → arena (reference core/freezer.go:672-711
  *    AddFile, hash 386-404)
  *
  * The "remote" is a plain local directory (`fs.pufs.backing`) standing in
  * for an object store — this container has zero egress; the seam where a
  * GCS/S3 range-GET would plug in is `RemoteStore.read`.
  *
  * Spark integration: set
  *   spark.hadoop.fs.pufs.impl = graft.sources.PufsFileSystem
  *   spark.hadoop.fs.pufs.backing = /path/to/backing/root
  *   spark.hadoop.fs.pufs.cache = /path/to/cache/arena
  * then `spark.read.parquet("pufs:///table.parquet")` reads through the
  * lazy cache — Spark's vectorized Parquet reader issues ranged reads
  * (footer + needed column chunks), so column pruning directly reduces
  * bytes pulled, which PufsFileSystem.stats makes observable.
  */
class PufsFileSystem extends FileSystem {

  private var uri: URI = _
  private var backingRoot: String = _
  private var cacheRoot: String = _
  private var chunkSize: Long = PufsFileSystem.DefaultChunkSize
  private var readahead: Long = PufsFileSystem.DefaultReadahead
  private var workDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}/")
    // The URI authority is the "bucket": pufs://<token>/path resolves the
    // backing store from the registry, so different backing dirs coexist
    // in one session as distinct (and correctly cached) FS instances —
    // mutating a shared fs.pufs.backing conf per table read would race
    // with lazy execution (ADVICE r2). Conf remains the no-authority
    // fallback.
    backingRoot = Option(name.getAuthority).filter(_.nonEmpty)
      .flatMap(a => Option(PufsFileSystem.backingRegistry.get(a)))
      .getOrElse(conf.get("fs.pufs.backing"))
    require(backingRoot != null,
      "fs.pufs.backing (or a registered pufs://<token>/ authority) is required")
    // conf.get's default argument is evaluated EAGERLY — the two-arg form
    // would create (and discard) a fresh pufs-cache* temp dir on every
    // instantiation even when fs.pufs.cache is configured
    cacheRoot = Option(conf.get("fs.pufs.cache")).getOrElse(
      Files.createTempDirectory("pufs-cache").toString)
    chunkSize = conf.getLong("fs.pufs.chunk.size", PufsFileSystem.DefaultChunkSize)
    readahead = conf.getLong("fs.pufs.readahead", PufsFileSystem.DefaultReadahead)
    new File(cacheRoot, "chunks").mkdirs()
    new File(cacheRoot, "staging").mkdirs()
    // live stats on the reference's 5 s cadence while pufs:// is in use
    // (pufs/cmd/mount.go:63-75); fs.pufs.heartbeat=false opts out
    if (conf.getBoolean("fs.pufs.heartbeat", true))
      StatsHeartbeat.ensureGlobal(conf.getLong(
        "fs.pufs.heartbeat.interval.ms", StatsHeartbeat.DefaultIntervalMs))
    // durable inode metadata (generations + mounts) for daemon-style use:
    // replayed here, journaled from then on (the boltdb INodeDB analog)
    Option(conf.get("fs.pufs.inodedb")).foreach(InodeDb.attach)
  }

  override def getScheme: String = "pufs"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  private def rel(p: Path): String = {
    val s = p.toUri.getPath
    if (s.startsWith("/")) s.drop(1) else s
  }
  private def backingFile(p: Path): File = new File(backingRoot, rel(p))

  // --- remote-URL links (M9/M10 AddRemote analog) ---------------------
  // A link is a sidecar entry in the backing store recording
  // (url, etag, size) — the node's RemoteSource (reference
  // core/nodedb.go:670-703 AddRemoteURL; attrs via HEAD,
  // remote/http.go:61-72). open() serves a linked path through the
  // HttpStore with the ETag pinned at link time, through the same lazy
  // chunk-pull cache as local-backed objects.
  private def linkFile(p: Path): File = new File(backingRoot, rel(p) + ".pufslink")

  private def readLink(p: Path): Option[(String, String, Long)] = {
    val lf = linkFile(p)
    if (!lf.isFile) None
    else {
      val Array(url, etag, size) =
        new String(Files.readAllBytes(lf.toPath), "UTF-8").split("\t")
      Some((url, etag, size.toLong))
    }
  }

  /** Link an HTTP(S) object at `f` with explicit attributes. Linking
    * REPLACES any local file at the path (the reference's AddRemote
    * replaces the node) — without this, a path could resolve to two
    * sources at once: stat/open would serve the backing file while the
    * listing ALSO showed the link, double-counting the path. */
  def addRemoteUrl(f: Path, url: String, etag: String, size: Long): Unit = {
    val lf = linkFile(f)
    lf.getParentFile.mkdirs()
    val bf = backingFile(f)
    if (bf.isFile) bf.delete()
    Files.write(lf.toPath, s"$url\t$etag\t$size".getBytes("UTF-8"))
    bumpGeneration(f)
  }

  /** Link an HTTP(S) or `gs://` object at `f`, probing its attributes —
    * the reference's attribute fetch on AddRemoteURL (HEAD for HTTP,
    * GetGCSAttr gcs.go:153-168 for GCS). For `gs://` the pin slot holds
    * the object GENERATION instead of an ETag — the native precondition
    * of that store (gcs.go:302-331). */
  def addRemoteUrl(f: Path, url: String): Unit =
    if (url.startsWith("gs://")) {
      val (endpoint, tokens) = PufsFileSystem.gcsAccessOrThrow()
      val (bucket, key) = PufsFileSystem.parseGsUrl(url)
      val a = GcsStore.attrs(endpoint, bucket, key, tokens)
      addRemoteUrl(f, url, a.generation.toString, a.size)
    } else {
      val (size, etag) = HttpStore.head(url)
      addRemoteUrl(f, url, etag.getOrElse(""), size)
    }

  /** (mount, path-inside-mount) when `p` falls under a snapshot mount. */
  private def resolveMount(p: Path): Option[(PufsFileSystem.SnapMount, String)] =
    PufsFileSystem.resolveMount(rel(p))

  override def getFileStatus(f: Path): FileStatus = resolveMount(f) match {
    case Some((m, sub)) =>
      m.entries.get(sub) match {
        case Some(e) =>
          new FileStatus(e.size, false, 1, chunkSize, 0L, makeQualified(f))
        case None if sub.isEmpty || m.dirs.contains(sub) =>
          new FileStatus(0, true, 1, chunkSize, 0L, makeQualified(f))
        case None => throw new FileNotFoundException(s"$f (not in snapshot manifest)")
      }
    case None =>
      val bf = backingFile(f)
      if (bf.exists())
        new FileStatus(bf.length(), bf.isDirectory, 1, chunkSize, bf.lastModified(),
          makeQualified(f))
      else readLink(f) match {
        case Some((_, _, size)) =>
          new FileStatus(size, false, 1, chunkSize, linkFile(f).lastModified(),
            makeQualified(f))
        case None => throw new FileNotFoundException(f.toString)
      }
  }

  override def listStatus(f: Path): Array[FileStatus] = resolveMount(f) match {
    case Some((m, sub)) =>
      if (m.entries.contains(sub)) Array(getFileStatus(f))
      else if (sub.isEmpty || m.dirs.contains(sub)) {
        m.childrenOf(sub).map { name =>
          getFileStatus(new Path(f, name))
        }.toArray
      } else throw new FileNotFoundException(s"$f (not in snapshot manifest)")
    case None =>
      val bf = backingFile(f)
      if (!bf.exists()) throw new FileNotFoundException(f.toString)
      if (bf.isFile) Array(getFileStatus(f))
      else bf.listFiles().flatMap { c =>
        if (c.getName.endsWith(".pufslink")) {
          // linked objects list under their target name with linked size;
          // if a backing file somehow coexists (created out-of-band), the
          // backing file wins and the plain branch lists it — emitting
          // both would duplicate the path in every directory scan
          val target = new File(bf, c.getName.stripSuffix(".pufslink"))
          if (target.exists()) None
          else Some(getFileStatus(new Path(f, c.getName.stripSuffix(".pufslink"))))
        } else
          Some(new FileStatus(c.length(), c.isDirectory, 1, chunkSize,
            c.lastModified(), makeQualified(new Path(f, c.getName))))
      }
  }

  private def bumpGeneration(f: Path): Unit =
    PufsFileSystem.bumpGeneration(backingRoot, rel(f))

  /** Relative paths of every FILE under `dir` (empty when not a dir) —
    * collected BEFORE a directory-level rename/delete so each descendant's
    * generation can be bumped. Bumping only the directory path would leave
    * the per-FILE synthetic block ids unchanged: replace /tbl wholesale
    * with same-size same-mtime files (rename preserves mtime, cp -p too)
    * and a reader would be served the OLD file's cached chunks. */
  private def descendantRels(dir: File): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
    if (!dir.isDirectory) Seq.empty
    else walk(dir).map(f =>
      dir.toPath.relativize(f.toPath).toString.replace(File.separatorChar, '/'))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = resolveMount(f) match {
    case Some((m, sub)) =>
      val e = m.entries.getOrElse(sub,
        throw new FileNotFoundException(s"$f (not in snapshot manifest)"))
      // the block id IS the content hash — a mounted block is shared across
      // mounts/labels in the cache arena by construction (CAS dedup), and a
      // republished object can never serve stale bytes because new content
      // means a new id (the Merkle property, reference core/types.go:10)
      val blockId = "cas-" + e.sha256
      val entry = PufsFileSystem.cacheEntry(cacheRoot, blockId, e.size)
      val remote = new LocalStore(new java.io.File(new java.io.File(m.repo, "CAS"), e.sha256))
      new FSDataInputStream(
        new LazyPullInputStream(entry, remote, e.size, chunkSize, readahead))
    case None if !backingFile(f).exists() && readLink(f).isDefined =>
      val (url, etag, size) = readLink(f).get
      // synthetic identity from (url, etag) — the reference's HTTP block id
      // (core/nodedb.go:693-703 sha256(url + etag)): a re-linked object
      // with a new ETag is a NEW block, never a stale cache hit
      val blockId = "url-" + PufsFileSystem.sha256Bytes((url + etag).getBytes("UTF-8"))
      val entry = PufsFileSystem.cacheEntry(cacheRoot, blockId, size)
      val remote: RemoteStore =
        if (url.startsWith("gs://")) {
          // the pin slot carries the generation captured at link time: a
          // regenerated object answers 412 → torn read, and a RE-linked
          // object is a new block id (new generation ⇒ new sha above)
          val (endpoint, tokens) = PufsFileSystem.gcsAccessOrThrow()
          val (bucket, key) = PufsFileSystem.parseGsUrl(url)
          new GcsStore(endpoint, bucket, key,
            if (etag.isEmpty) 0L else etag.toLong, tokens)
        } else new HttpStore(url, Some(etag).filter(_.nonEmpty))
      new FSDataInputStream(
        new LazyPullInputStream(entry, remote, size, chunkSize, readahead))
    case None =>
      val bf = backingFile(f)
      if (!bf.exists()) throw new FileNotFoundException(f.toString)
      val blockId = PufsFileSystem.syntheticBlockId(
        backingRoot, rel(f), bf.length(), bf.lastModified(),
        PufsFileSystem.generationOf(backingRoot, rel(f)))
      val entry = PufsFileSystem.cacheEntry(cacheRoot, blockId, bf.length())
      // pin the generation observed at open: an out-of-band replacement of
      // the backing object (same path, new content) fails subsequent pulls
      // with TornReadException instead of mixing two generations' bytes
      // (reference GCS GenerationMatch, remote/gcs.go:302-331)
      val pinned = new PinnedLocalStore(bf, bf.length(), bf.lastModified())
      new FSDataInputStream(
        new LazyPullInputStream(entry, pinned, bf.length(), chunkSize, readahead))
  }

  /** Write-once create: stage locally; on close, sha256-freeze into the CAS
    * arena and copy through to the backing store (M8 + M12/B1 analog). */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (resolveMount(f).isDefined)
      throw new java.io.IOException(
        s"$f is inside a read-only snapshot mount (reference NotWritableErr)")
    val bf = backingFile(f)
    if (bf.exists() && !overwrite)
      throw new FileAlreadyExistsException(f.toString)
    bf.getParentFile.mkdirs()
    val staging = File.createTempFile("stage", ".part", new File(cacheRoot, "staging"))
    val fileOut = new java.io.FileOutputStream(staging)
    new FSDataOutputStream(new java.io.FilterOutputStream(fileOut) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit = fileOut.write(b, off, len)
      override def close(): Unit = {
        super.close()
        val sha = PufsFileSystem.sha256File(staging)
        val cas = new File(new File(cacheRoot, "chunks"), sha)
        if (!cas.exists()) // idempotent CAS add (B12 DoesNotExist analog)
          Files.copy(staging.toPath, cas.toPath, StandardCopyOption.REPLACE_EXISTING)
        Files.move(staging.toPath, bf.toPath, StandardCopyOption.REPLACE_EXISTING)
        linkFile(f).delete() // creating a file over a link replaces the link
        bumpGeneration(f) // new object generation at this path
        // NOTE: the arena entry is NOT pre-marked populated — a later open()
        // lazily pulls from the backing file it can now see. Pre-marking the
        // mask without arena content would serve zeros.
      }
    }, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("pufs is write-once (reference NotWritableErr)")

  override def rename(src: Path, dst: Path): Boolean = {
    if (resolveMount(src).isDefined || resolveMount(dst).isDefined)
      throw new java.io.IOException("snapshot mounts are read-only")
    val s = backingFile(src); val d = backingFile(dst)
    d.getParentFile.mkdirs()
    val subs = descendantRels(s) // pre-rename snapshot of the subtree
    val ok = s.renameTo(d)
    if (ok) {
      bumpGeneration(src); bumpGeneration(dst)
      subs.foreach { r =>
        PufsFileSystem.bumpGeneration(backingRoot, s"${rel(src)}/$r")
        PufsFileSystem.bumpGeneration(backingRoot, s"${rel(dst)}/$r")
      }
    }
    ok
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    if (resolveMount(f).isDefined)
      throw new java.io.IOException("snapshot mounts are read-only")
    val bf = backingFile(f)
    if (!bf.exists()) {
      // unlink a remote-URL link (M6 over an M9/M10 node)
      val lf = linkFile(f)
      if (lf.isFile) { val ok = lf.delete(); if (ok) bumpGeneration(f); ok }
      else false
    }
    else if (bf.isFile) {
      val ok = bf.delete()
      // a leftover link sidecar must not resurrect the path after delete
      if (ok) { linkFile(f).delete(); bumpGeneration(f) }
      ok
    }
    else if (recursive) {
      val subs = descendantRels(bf)
      org.apache.commons.io.FileUtils.deleteDirectory(bf)
      bumpGeneration(f)
      subs.foreach(r => PufsFileSystem.bumpGeneration(backingRoot, s"${rel(f)}/$r"))
      true
    }
    else if (bf.list().isEmpty) { val ok = bf.delete(); if (ok) bumpGeneration(f); ok }
    else throw new java.io.IOException(s"dir not empty: $f (reference DirNotEmptyErr)")
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    if (resolveMount(f).isDefined)
      throw new java.io.IOException("snapshot mounts are read-only")
    backingFile(f).mkdirs() || backingFile(f).isDirectory
  }
}

object PufsFileSystem {
  /** Reference operating points: 200 KiB chunk (core/datastore.go:106),
    * 5 MiB readahead (core/freezer.go:226). */
  val DefaultChunkSize: Long = 200L * 1024
  val DefaultReadahead: Long = 5L * 1024 * 1024

  // --- observable cache state (per-JVM; local[*] == one executor) ---
  private val masks = new ConcurrentHashMap[String, RegionMask]()
  private val entries = new ConcurrentHashMap[String, CacheEntry]()
  val bytesPulled = new AtomicLong(0)
  val fetchCount = new AtomicInteger(0)

  /** Shared daemon pool for background readahead copies (the goroutine
    * fabric of reference region/pending.go:330-357, bounded). */
  private[sources] val readaheadPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(2, (r: Runnable) => {
      val t = new Thread(r, "pufs-readahead")
      t.setDaemon(true)
      t
    })

  /** Shared daemon pool for vectored-read range pulls (one task per
    * requested range; chunk-level inflight dedup keeps overlap safe). */
  private[sources] val vectoredPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(8, (r: Runnable) => {
      val t = new Thread(r, "pufs-vectored")
      t.setDaemon(true)
      t
    })

  /** Reservoir samples of fetch latency (µs) and size (bytes) — the
    * reference's Population reservoir + p50/p90/p99 report
    * (core/samples.go:109-170; PrintStats freezer.go:272-287). */
  val latencySamples = new Reservoir(1000)
  val sizeSamples = new Reservoir(1000)

  /** Ring buffer of recently completed fetches for live transfer-rate
    * reporting (reference OffsetHistory, region/pending.go:179-222). */
  final class RateRing(capacity: Int = 256) {
    private val times = new Array[Long](capacity)
    private val sizes = new Array[Long](capacity)
    private var idx = 0
    private var n = 0
    def record(atNanos: Long, bytes: Long): Unit = synchronized {
      times(idx) = atNanos; sizes(idx) = bytes
      idx = (idx + 1) % capacity; n = math.min(n + 1, capacity)
    }
    /** Bytes/sec over the trailing window ending at `nowNanos`. */
    def rate(windowNanos: Long, nowNanos: Long): Double = synchronized {
      val cutoff = nowNanos - windowNanos
      var sum = 0L
      var i = 0
      while (i < n) {
        val j = ((idx - 1 - i) % capacity + capacity) % capacity
        if (times(j) >= cutoff) sum += sizes(j)
        i += 1
      }
      sum.toDouble * 1e9 / windowNanos
    }
    def reset(): Unit = synchronized { idx = 0; n = 0 }
  }
  val transferRing = new RateRing()

  /** In-flight chunk fetches right now (reference GetActiveTransferStatus,
    * core/freezer.go:544-559). */
  val activeTransfers = new AtomicInteger(0)

  /** Ranges served through readVectored (scatter-gather) — observable so
    * integration tests can prove the Parquet reader drives this path. */
  val vectoredRanges = new AtomicInteger(0)

  def resetStats(): Unit = {
    bytesPulled.set(0); fetchCount.set(0); vectoredRanges.set(0)
    latencySamples.reset(); sizeSamples.reset(); transferRing.reset()
  }

  /** One-line transfer stats report (PrintStats analog): totals,
    * percentiles, live in-flight count and trailing-5s rate. */
  def statsReport: String = {
    val l = latencySamples.percentiles(Seq(0.5, 0.9, 0.99))
    val s = sizeSamples.percentiles(Seq(0.5, 0.9, 0.99))
    val mbps = transferRing.rate(5L * 1000 * 1000 * 1000, System.nanoTime()) / 1e6
    s"fetches=${fetchCount.get()} bytes=${bytesPulled.get()} " +
      s"latency_us(p50/p90/p99)=${l.mkString("/")} " +
      s"size_b(p50/p90/p99)=${s.mkString("/")} " +
      s"vectored_ranges=${vectoredRanges.get()} " +
      f"active=${activeTransfers.get()} rate_5s=$mbps%.2f MB/s"
  }

  def maskFor(blockId: String): RegionMask =
    masks.computeIfAbsent(blockId, _ => new RegionMask)

  /** Synthetic block identity for remote-backed objects — the reference
    * hashes (bucket/key:generation) rather than content
    * (reference core/nodedb.go:557-572). The backing root is the "bucket"
    * analog: without it, equal relative paths with equal size+mtime in two
    * different backing stores would collide and serve stale cached bytes
    * (ADVICE r2). */
  def syntheticBlockId(backingRoot: String, path: String, size: Long,
      mtime: Long, generation: Long = 0L): String =
    sha256Bytes(s"$backingRoot/$path:$size:$mtime:$generation".getBytes("UTF-8"))

  /** Per-(backing, path) generation counter, bumped by every mutation
    * through this JVM's FS (create/rename/delete) — the analog of the
    * reference's object generation in the synthetic block id
    * (core/nodedb.go:557-572). Closes the delete-then-recreate-same-
    * size-within-one-mtime-tick staleness window (ADVICE r2): the only
    * JVM that could have stale cache for the old bytes is the one that
    * performed the mutation, and its generation bump invalidates the id.
    */
  private val pathGens = new ConcurrentHashMap[String, AtomicLong]()

  def generationOf(backingRoot: String, path: String): Long = {
    val g = pathGens.get(s"$backingRoot/$path")
    if (g == null) 0L else g.get()
  }

  private[sources] def bumpGeneration(backingRoot: String, path: String): Unit = {
    val key = s"$backingRoot/$path"
    val v = pathGens.computeIfAbsent(key, _ => new AtomicLong(0L))
      .incrementAndGet()
    InodeDb.recordGen(key, v)
  }

  /** Journal replay: restore a persisted generation (max-merge — a live
    * counter never moves backwards). */
  private[sources] def restoreGeneration(key: String, v: Long): Unit =
    pathGens.computeIfAbsent(key, _ => new AtomicLong(0L))
      .accumulateAndGet(v, math.max)

  private[sources] def liveGenerations: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    pathGens.asScala.toSeq.map { case (k, v) => (k, v.get()) }
  }

  private[sources] def liveMounts: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    mounts.asScala.toSeq.map { case (p, m) => (p, m.repo, m.manifestSha) }
  }

  def sha256Bytes(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  def sha256File(f: File): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(f.toPath)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private[sources] def cacheEntry(cacheRoot: String, blockId: String, size: Long): CacheEntry =
    // keyed on (cacheRoot, blockId): two FS instances with different cache
    // arenas must not share an entry that pins the first arena (ADVICE r2)
    entries.computeIfAbsent(s"$cacheRoot|$blockId", _ => {
      val f = new File(new File(cacheRoot, "chunks"), blockId)
      f.getParentFile.mkdirs()
      val log = new File(new File(cacheRoot, "chunks"), blockId + ".regions")
      if (!f.exists()) {
        // the data file is gone (partial arena cleanup): a surviving
        // .regions log would replay "populated" over the freshly created
        // all-zeros sparse file and reads would serve zeros as content —
        // the log lives and dies with its data file
        log.delete()
        val raf = new RandomAccessFile(f, "rw")
        try raf.setLength(size) finally raf.close() // sparse local file (B2)
      }
      val mask = maskFor(s"$cacheRoot|$blockId")
      // replay the append-only region log so partial population survives a
      // process restart with ZERO re-fetches (reference core/freezer.go:
      // 420-469 load replay; persisted 481-509; asserted by the reference's
      // freezer restart test and our PufsFsSpec restart case). Loop on the
      // record count — available() is not a contractual EOF signal.
      if (log.exists() && mask.populatedBytes == 0) {
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(Files.newInputStream(log.toPath)))
        try {
          var remaining = log.length() / 16
          while (remaining > 0) { mask.add(in.readLong(), in.readLong()); remaining -= 1 }
        } finally in.close()
      }
      CacheEntry(f, mask, new ConcurrentHashMap[Long, CompletableFuture[Void]](), log)
    })

  /** Populated-bytes stats per cached block (reference GetBlockStats,
    * core/freezer.go:249-263 — the M2 extended-listing surface). */
  def blockStats: Seq[(String, Long, Int)] = {
    import scala.jdk.CollectionConverters._
    masks.asScala.toSeq.map { case (id, m) => (id, m.populatedBytes, m.regionCount) }
  }

  /** Cache-population stats for one block id, summed across cache arenas
    * (the per-file half of the reference's ExtendedDirEntry,
    * api/api.proto:18-19: populatedRegionCount + populatedSize). */
  def statsForBlock(blockId: String): (Long, Int) = {
    import scala.jdk.CollectionConverters._
    masks.asScala.iterator
      .collect { case (k, m) if k.endsWith("|" + blockId) =>
        (m.populatedBytes, m.regionCount) }
      .foldLeft((0L, 0)) { case ((b, r), (b2, r2)) => (b + b2, r + r2) }
  }

  /** Test hook: simulate a process restart — drop all in-memory cache
    * state (masks + entries + stats); on-disk arena and region logs stay. */
  def simulateRestart(): Unit = {
    masks.clear(); entries.clear(); pathGens.clear(); resetStats()
  }

  // --- snapshot mounts (reference Mount/MountByLabel,
  //     core/datastore.go:214-227: graft a published root as a lazy
  //     subtree; reads resolve manifest → CAS block → ranged pull) ---

  /** One mounted snapshot: manifest entries by path + the implied dir set. */
  private[sources] case class SnapMount(repo: String, manifestSha: String,
      entries: Map[String, SnapshotStore.ManifestEntry], dirs: Set[String]) {
    /** Immediate child names of `sub` ("" = mount root). */
    def childrenOf(sub: String): Seq[String] = {
      val prefix = if (sub.isEmpty) "" else sub + "/"
      (entries.keysIterator ++ dirs.iterator)
        .filter(p => p.nonEmpty && p.startsWith(prefix) && p != sub)
        .map(p => p.drop(prefix.length).takeWhile(_ != '/'))
        .toSeq.distinct.sorted
    }
  }

  private val mounts = new ConcurrentHashMap[String, SnapMount]()

  /** authority token → backing dir (the bucket registry). */
  private[sources] val backingRegistry = new ConcurrentHashMap[String, String]()

  /** GCS access for `gs://` remote links: (service endpoint, token
    * provider). Process-global like the cache arenas — links are
    * path-scoped, credentials are not. */
  @volatile private var gcsAccess: Option[(String, GcsAuth.TokenProvider)] = None

  /** Register GCS credentials so `addRemoteUrl(f, "gs://bucket/key")`
    * links resolve. `endpoint` is the service base
    * (`https://storage.googleapis.com` in production). */
  def registerGcs(endpoint: String, tokens: GcsAuth.TokenProvider): Unit =
    gcsAccess = Some((endpoint, tokens))

  private[sources] def gcsAccessOrThrow(): (String, GcsAuth.TokenProvider) =
    gcsAccess.getOrElse(throw new IllegalStateException(
      "gs:// link needs PufsFileSystem.registerGcs(endpoint, tokens) first"))

  /** `gs://bucket/key` → (bucket, key). */
  private[sources] def parseGsUrl(url: String): (String, String) = {
    val rest = url.stripPrefix("gs://")
    val slash = rest.indexOf('/')
    require(slash > 0 && slash < rest.length - 1, s"malformed gs url: $url")
    (rest.substring(0, slash), rest.substring(slash + 1))
  }

  /** Register a backing dir under an authority token and return the
    * `pufs://<token>` prefix to build paths with. Idempotent. */
  def registerBacking(token: String, dir: String): String = {
    backingRegistry.put(token, dir)
    s"pufs://$token"
  }

  private def cleanMountPath(p: String): String =
    p.stripPrefix("/").stripSuffix("/")

  /** Mount a published label at `mountPath` (a path under the pufs root):
    * after this, `pufs:///<mountPath>/...` resolves through the manifest to
    * CAS blocks served by the lazy-pull machinery — the reference's
    * create→push→mount→lazy-read round trip (core/functional_test.go:174-214).
    * The mount table is JVM-global, like the cache arena state. */
  def mountSnapshot(mountPath: String, repo: String, label: String): Unit =
    mountSnapshotAt(mountPath, repo,
      SnapshotStore.getRoot(repo, label).getOrElse(
        throw new IllegalArgumentException(s"no such label: $label")))

  /** Mount a snapshot by its manifest sha directly — the reference's
    * mount-by-BID (core/nodedb.go:522-555 AddBIDMount): any HISTORICAL
    * manifest still in the CAS mounts, label repoints notwithstanding —
    * time travel to a superseded snapshot. */
  def mountSnapshotAt(mountPath: String, repo: String, manifestSha: String): Unit = {
    val es = SnapshotStore.mountAt(repo, manifestSha)
    val byPath = es.map(e => e.path -> e).toMap
    val dirs = es.flatMap { e =>
      val parts = e.path.split('/').dropRight(1)
      parts.indices.map(i => parts.take(i + 1).mkString("/"))
    }.toSet
    // pin the mounted snapshot with a reader lease so a label repoint
    // can't let GC collect blocks under an active mount (reference: a
    // mount holds a lease, datastore.go:23-28, 240-253)
    SnapshotStore.renewLease(repo,
      "mount-" + cleanMountPath(mountPath).replace('/', '_'), manifestSha)
    mounts.put(cleanMountPath(mountPath), SnapMount(repo, manifestSha, byPath, dirs))
    InodeDb.recordMount(cleanMountPath(mountPath), repo, manifestSha)
  }

  def unmountSnapshot(mountPath: String): Unit = {
    if (mounts.remove(cleanMountPath(mountPath)) != null)
      InodeDb.recordUnmount(cleanMountPath(mountPath))
  }

  private[sources] def resolveMount(relPath: String): Option[(SnapMount, String)] = {
    import scala.jdk.CollectionConverters._
    mounts.asScala.collectFirst {
      case (prefix, m) if relPath == prefix =>
        (m, "")
      case (prefix, m) if relPath.startsWith(prefix + "/") =>
        (m, relPath.drop(prefix.length + 1))
    }
  }
}

/** One cached block: sparse local file + populated-region mask + in-flight
  * chunk fetches (for concurrent-reader dedup) + append-only region log. */
case class CacheEntry(file: File, mask: RegionMask,
    inflight: ConcurrentHashMap[Long, CompletableFuture[Void]],
    regionLog: File) {
  /** Append a committed region to the on-disk log (reference
    * core/freezer.go:481-509 appendToRegionFile). */
  def logRegion(start: Long, end: Long): Unit = synchronized {
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(regionLog, true))
    try { out.writeLong(start); out.writeLong(end) } finally out.close()
  }
}

/** Seekable stream that materializes chunk-aligned ranges on demand.
  * ensurePulled (reference core/freezer.go:125-183): align the request to
  * chunk boundaries, compute missing regions from the mask, fetch each —
  * joining an in-flight fetch when another reader already started it
  * (reference region/pending.go:281-299). */
final class LazyPullInputStream(entry: CacheEntry, remote: RemoteStore,
    size: Long, chunkSize: Long, readahead: Long)
    extends java.io.InputStream with Seekable with PositionedReadable {

  private var pos: Long = 0

  /** Set on close(): in-flight readahead scheduled by this stream observes
    * it and stops — the cancellation propagation the reference does for
    * FUSE Interrupt (fs/mount.go:834-844 → region/pending.go cancel paths).
    * A task kill closes its streams, so its readahead dies with it. */
  @volatile private var closed = false

  override def close(): Unit = { closed = true; super.close() }

  /** Per-read cancel check, tested between chunk pulls: a stream closed
    * from another thread (Spark task kill closes task streams) or an
    * interrupted reader thread stops MID-RANGE instead of finishing a
    * possibly-large multi-chunk pull — the per-request half of the
    * reference's Interrupt handling (fs/mount.go:834-844 hands the FUSE
    * interrupt to the pending fetch's cancel path; here the "request" is
    * one ensurePulled range). Chunks already pulled stay cached and
    * logged — cancellation never loses committed work. */
  private def checkCancelled(): Unit = {
    if (closed)
      throw new java.io.InterruptedIOException("pufs read cancelled: stream closed")
    if (Thread.currentThread().isInterrupted)
      throw new java.io.InterruptedIOException("pufs read cancelled: thread interrupted")
  }

  private def ensurePulled(start: Long, end: Long, withReadahead: Boolean = true): Unit = {
    val e = math.min(size, end)
    if (e <= start) return
    // chunk-align the synchronous part: only what the caller needs
    val aStart = (start / chunkSize) * chunkSize
    val aEnd = math.min(size, ((e + chunkSize - 1) / chunkSize) * chunkSize)
    entry.mask.missing(aStart, aEnd).foreach { case (ms, me) =>
      var c = (ms / chunkSize) * chunkSize
      while (c < me) {
        checkCancelled()
        pullChunk(c)
        c += chunkSize
      }
    }
    // background readahead (reference StartBackgroundCopy,
    // region/pending.go:267-360): schedule the window after the request on
    // the shared pool; self-cancels at the first already-populated chunk
    // (an overlapping reader got there — stop, don't leapfrog)
    if (withReadahead && readahead > 0 && aEnd < size) {
      val raEnd = math.min(size, aEnd + readahead)
      PufsFileSystem.readaheadPool.execute { () =>
        var c = aEnd
        var cancelled = false
        while (c < raEnd && !cancelled && !closed) {
          val ce = math.min(size, c + chunkSize)
          if (entry.mask.contains(c, ce)) cancelled = true // self-cancel
          else {
            try pullChunk(c)
            catch { case _: Throwable => cancelled = true }
          }
          c += chunkSize
        }
      }
    }
  }

  private def pullChunk(chunkStart: Long): Unit = {
    val end = math.min(size, chunkStart + chunkSize)
    if (entry.mask.contains(chunkStart, end)) return
    val fresh = new CompletableFuture[Void]()
    val existing = entry.inflight.putIfAbsent(chunkStart, fresh)
    if (existing != null) { existing.join(); return } // join-or-start (B7)
    // re-check after winning the slot: a concurrent fetcher may have
    // completed (mask.add + inflight.remove) between our mask check and
    // putIfAbsent — refetching would be harmless but double-counts stats
    // and breaks the exactly-N-fetches IO-dedup invariant (ADVICE r2)
    if (entry.mask.contains(chunkStart, end)) {
      fresh.complete(null); entry.inflight.remove(chunkStart); return
    }
    val t0 = System.nanoTime()
    PufsFileSystem.activeTransfers.incrementAndGet()
    try {
      val buf = remote.read(chunkStart, (end - chunkStart).toInt)
      val raf = new RandomAccessFile(entry.file, "rw")
      try { raf.seek(chunkStart); raf.write(buf) } finally raf.close()
      entry.mask.add(chunkStart, end)
      entry.logRegion(chunkStart, end)
      PufsFileSystem.bytesPulled.addAndGet(end - chunkStart)
      PufsFileSystem.fetchCount.incrementAndGet()
      val done = System.nanoTime()
      PufsFileSystem.latencySamples.record((done - t0) / 1000)
      PufsFileSystem.sizeSamples.record(end - chunkStart)
      PufsFileSystem.transferRing.record(done, end - chunkStart)
      fresh.complete(null)
    } catch {
      case t: Throwable => fresh.completeExceptionally(t); throw t
    } finally {
      PufsFileSystem.activeTransfers.decrementAndGet()
      entry.inflight.remove(chunkStart)
    }
  }

  // --- PositionedReadable (what Parquet's reader actually calls) ---
  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= size) return -1
    val n = math.min(length.toLong, size - position).toInt
    ensurePulled(position, position + n)
    val raf = new RandomAccessFile(entry.file, "r")
    try { raf.seek(position); raf.readFully(buffer, offset, n); n } finally raf.close()
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (read(position, buffer, offset, length) < length)
      throw new java.io.EOFException(s"read past end: $position+$length > $size")
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  // --- vectored IO (Hadoop 3.3+ scatter-gather; Parquet/ORC readers issue
  // all needed column-chunk ranges in ONE call). Each range becomes an
  // independent parallel pull on the shared pool — the concurrency the
  // reference gets from per-request goroutines (fs/mount.go:42-54) applied
  // to a batch of ranges. Chunk-level join-or-start dedups overlap between
  // ranges and with other readers. No readahead here: the caller has
  // enumerated exactly what it needs, speculation past it is pure waste. ---
  override def readVectored(ranges: java.util.List[_ <: FileRange],
      allocate: java.util.function.IntFunction[java.nio.ByteBuffer]): Unit =
    readVectored(ranges, allocate, (_: java.nio.ByteBuffer) => ())

  override def readVectored(ranges: java.util.List[_ <: FileRange],
      allocate: java.util.function.IntFunction[java.nio.ByteBuffer],
      release: java.util.function.Consumer[java.nio.ByteBuffer]): Unit = {
    import scala.jdk.CollectionConverters._
    val rs = ranges.asScala.toSeq
    rs.foreach { r =>
      if (r.getOffset < 0 || r.getLength < 0 || r.getOffset + r.getLength > size)
        throw new java.io.EOFException(
          s"vectored range past end: ${r.getOffset}+${r.getLength} > $size")
      r.setData(new CompletableFuture[java.nio.ByteBuffer]())
    }
    PufsFileSystem.vectoredRanges.addAndGet(rs.size)
    rs.foreach { r =>
      val fut = r.getData.asInstanceOf[CompletableFuture[java.nio.ByteBuffer]]
      PufsFileSystem.vectoredPool.execute { () =>
        try {
          // a range whose stream was closed before its turn on the pool
          // never starts pulling (ensurePulled re-checks between chunks)
          if (closed)
            throw new java.io.InterruptedIOException(
              "pufs vectored read cancelled: stream closed")
          val n = r.getLength
          ensurePulled(r.getOffset, r.getOffset + n, withReadahead = false)
          val arr = new Array[Byte](n)
          val raf = new RandomAccessFile(entry.file, "r")
          try { raf.seek(r.getOffset); raf.readFully(arr, 0, n) } finally raf.close()
          val buf = allocate.apply(n)
          buf.put(arr)
          buf.flip()
          fut.complete(buf)
        } catch {
          case t: Throwable => fut.completeExceptionally(t)
        }
      }
    }
  }

  // --- Seekable / InputStream ---
  override def seek(p: Long): Unit = { pos = p }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int = {
    if (pos >= size) return -1
    val b = new Array[Byte](1)
    val n = read(pos, b, 0, 1)
    if (n <= 0) -1 else { pos += 1; b(0) & 0xff }
  }
  override def read(buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (pos >= size) return -1
    val n = read(pos, buffer, offset, length)
    if (n > 0) pos += n
    n
  }
  override def available(): Int =
    math.min(Int.MaxValue.toLong, math.max(0L, size - pos)).toInt
}
