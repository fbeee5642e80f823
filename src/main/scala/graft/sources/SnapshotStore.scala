package graft.sources

import java.io.File
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption, StandardOpenOption}
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot commit / publish / mount protocol — the reference's
  * Freeze → Push → SetRoot → Mount cycle (reference
  * core/datastore.go:999-1217; remote/gcs.go:101-197) as a local-dir
  * "object store" (zero-egress stand-in; the same layout maps 1:1 onto a
  * bucket with conditional puts).
  *
  * Repo layout (mirrors the reference's bucket keys, core/remote.go:46-48,
  * remote/gcs.go:96-151):
  *   CAS/<sha256>      content-addressed blocks (files + manifests)
  *   root/<label>      label → manifest sha (atomic swap)
  *   lease/<label>     expiry heartbeat (48 h, reference datastore.go:48-51)
  *
  * A snapshot is one manifest block listing (path, size, sha) — the Merkle
  * root idea (a frozen tree is a single BID, reference
  * core/datastore.go:981-997). CAS writes are conditional-on-absence, so
  * re-publishing an unchanged tree uploads nothing (Freeze idempotence,
  * reference core/datastore.go:1123-1125) — at 100 TB this is what makes
  * incremental publishes O(changed bytes), not O(tree).
  */
object SnapshotStore {

  case class ManifestEntry(path: String, size: Long, sha256: String)

  val LeaseDuration: java.time.Duration = java.time.Duration.ofHours(48)

  private def casDir(repo: String) = Paths.get(repo, "CAS")
  private def rootDir(repo: String) = Paths.get(repo, "root")
  private def leaseDir(repo: String) = Paths.get(repo, "lease")

  /** Idempotent CAS put (reference B12: conditional DoesNotExist upload).
    * Returns true if the block was actually written. */
  private def casPut(repo: String, sha: String, src: JPath): Boolean = {
    val dst = casDir(repo).resolve(sha)
    if (Files.exists(dst)) false
    else {
      val tmp = Files.createTempFile(casDir(repo), ".up", ".part")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      try { Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE); true }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false }
    }
  }

  /** Stage → hash → CAS → manifest → label pointer. Returns (manifest sha,
    * number of blocks actually uploaded). */
  def publish(srcDir: String, repo: String, label: String): (String, Int) = {
    Files.createDirectories(casDir(repo))
    Files.createDirectories(rootDir(repo))
    Files.createDirectories(leaseDir(repo))
    val root = Paths.get(srcDir)
    val files = {
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[JPath]).toSeq
      finally s.close()
    }
    var uploaded = 0
    val entries = files.map { f =>
      val sha = PufsFileSystem.sha256File(f.toFile)
      if (casPut(repo, sha, f)) uploaded += 1
      ManifestEntry(root.relativize(f).toString.replace(File.separatorChar, '/'),
        Files.size(f), sha)
    }.sortBy(_.path)
    // the manifest is itself a CAS block — the snapshot's "root BID"
    val manifestBytes = entries
      .map(e => s"${e.path}\t${e.size}\t${e.sha256}").mkString("\n").getBytes("UTF-8")
    val manifestSha = PufsFileSystem.sha256Bytes(manifestBytes)
    val tmp = Files.createTempFile(casDir(repo), ".mf", ".part")
    Files.write(tmp, manifestBytes)
    if (casPut(repo, manifestSha, tmp)) uploaded += 1
    Files.deleteIfExists(tmp)
    setRoot(repo, label, manifestSha)
    renewLease(repo, label, manifestSha)
    (manifestSha, uploaded)
  }

  /** Atomic label pointer swap (reference SetRoot, remote/gcs.go:114-127). */
  def setRoot(repo: String, label: String, manifestSha: String): Unit = {
    val tmp = Files.createTempFile(rootDir(repo), ".root", ".part")
    Files.write(tmp, manifestSha.getBytes("UTF-8"))
    Files.move(tmp, rootDir(repo).resolve(label),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def getRoot(repo: String, label: String): Option[String] = {
    val p = rootDir(repo).resolve(label)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** Lease heartbeat (reference renewLeases, core/datastore.go:240-253):
    * GC-liveness hint — a snapshot whose lease expired may be collected. */
  def renewLease(repo: String, label: String, manifestSha: String): Unit = {
    val expiry = Instant.now().plus(LeaseDuration)
    val tmp = Files.createTempFile(leaseDir(repo), ".lease", ".part")
    Files.write(tmp, s"$manifestSha\t${expiry.toEpochMilli}".getBytes("UTF-8"))
    Files.move(tmp, leaseDir(repo).resolve(label),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a published snapshot's manifest (reference MountByLabel →
    * GetRoot → lazy subtree, core/datastore.go:214-227). */
  def mount(repo: String, label: String): Seq[ManifestEntry] = {
    val sha = getRoot(repo, label).getOrElse(
      throw new IllegalArgumentException(s"no such label: $label"))
    val bytes = Files.readAllBytes(casDir(repo).resolve(sha))
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(p, s, h) = line.split("\t")
      ManifestEntry(p, s.toLong, h)
    }
  }

  /** Open a mounted file's content from CAS. */
  def readBlock(repo: String, sha: String): Array[Byte] =
    Files.readAllBytes(casDir(repo).resolve(sha))

  /** The snapshot as a catalog DataFrame (manifest → rows). */
  def asDataFrame(spark: SparkSession, repo: String, label: String): DataFrame = {
    import spark.implicits._
    mount(repo, label).toDF()
  }
}
