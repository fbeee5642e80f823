package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** Durable inode-metadata journal — the role the reference fills with a
  * boltdb KV under the repo dir (boltdb.go:1-105 INodeDB buckets;
  * capacity sized to 10M inodes, core/datastore.go:148): path
  * GENERATIONS and the snapshot MOUNT table survive a process restart,
  * so a restarted daemon resumes with the same cache identities (a
  * pre-restart replacement keeps its bumped generation — no block-id
  * aliasing against stale cached chunks) and the same mounted tree,
  * without re-walking or re-mounting anything.
  *
  * Append-only line journal with startup replay and threshold
  * compaction — the same recovery shape as the region logs the chunk
  * cache already rides (crash-safe: a torn trailing line is dropped).
  * Attached via `fs.pufs.inodedb=<dir>`; without it the state stays
  * process-local, which is fine for job-scoped use — the journal is for
  * long-lived daemon-style processes (the boltdb use case). */
object InodeDb {

  private val CompactAt = 100000 // journal lines before a rewrite

  @volatile private var journal: Option[File] = None
  private var lines = 0 // appended since attach; guarded by `this`
  private var replaying = false

  /** Attach (or re-attach) a journal dir: replay its log into the live
    * generation/mount tables, then record subsequent mutations. */
  def attach(dir: String): Unit = synchronized {
    val f = Paths.get(dir, "inodes.log").toFile
    f.getParentFile.mkdirs()
    journal = Some(f)
    lines = 0
    if (f.isFile) {
      replaying = true
      try {
        val content = new String(Files.readAllBytes(f.toPath), UTF_8)
        // every append ends in \n, so a torn final write leaves the file
        // unterminated — drop the trailing fragment OUTRIGHT: a number cut
        // mid-digits ("123" of "1234") parses fine but restores a WRONG,
        // older generation, which is exactly the aliasing the journal
        // exists to prevent
        val whole =
          if (content.isEmpty || content.endsWith("\n")) content
          else content.substring(0, content.lastIndexOf('\n') + 1)
        val replayed = whole.split("\n").filter(_.nonEmpty)
        replayed.foreach(applyLine)
        // seed the compaction counter with the replayed length: a daemon
        // that appends under CompactAt lines per run would otherwise reset
        // to 0 every restart and the journal would grow without bound
        lines = replayed.length
      } finally replaying = false
      if (lines >= CompactAt) compact()
    }
  }

  def detach(): Unit = synchronized { journal = None }

  /** One journal line; malformed (torn) lines are ignored. A torn line
    * can have the right FIELD COUNT with a truncated value ("gen\tk\t12"
    * cut mid-number or at ""), so the numeric parse is guarded too —
    * crash-safety must hold for any prefix of a valid line. */
  private def applyLine(line: String): Unit = line.split("\t", -1) match {
    case Array("gen", key, v) =>
      v.toLongOption.foreach(PufsFileSystem.restoreGeneration(key, _))
    case Array("mount", path, repo, sha) =>
      try PufsFileSystem.mountSnapshotAt(path, repo, sha)
      catch { case _: Exception => } // repo gone since journaling — skip
    case Array("unmount", path) =>
      PufsFileSystem.unmountSnapshot(path)
    case _ => // torn trailing write — drop, like a torn region-log entry
  }

  private def append(line: String): Unit = synchronized {
    if (replaying) return // replay must not re-journal what it reads
    journal.foreach { f =>
      Files.write(f.toPath, (line + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      lines += 1
      if (lines >= CompactAt) compact()
    }
  }

  private[sources] def recordGen(key: String, v: Long): Unit =
    append(s"gen\t$key\t$v")

  private[sources] def recordMount(path: String, repo: String,
      sha: String): Unit = append(s"mount\t$path\t$repo\t$sha")

  private[sources] def recordUnmount(path: String): Unit =
    append(s"unmount\t$path")

  /** The replayed live state in journal-line form (one `gen` line per
    * pinned generation, one `mount` line per live mount) — the `dump`
    * CLI verb's surface (reference pufs/cmd/dump.go:72), and exactly
    * what compact() would write. */
  def dumpState(): Seq[String] = synchronized {
    PufsFileSystem.liveGenerations.map { case (k, v) => s"gen\t$k\t$v" } ++
      PufsFileSystem.liveMounts.map { case (p, r, s) => s"mount\t$p\t$r\t$s" }
  }

  /** Rewrite the journal as a snapshot of current state (one line per
    * live generation + mount), atomically — the boltdb B-tree's
    * compaction analog for a log. */
  def compact(): Unit = synchronized {
    journal.foreach { f =>
      val tmp = new File(f.getParent, "inodes.log.tmp")
      val sb = new StringBuilder
      PufsFileSystem.liveGenerations.foreach { case (k, v) =>
        sb.append(s"gen\t$k\t$v\n")
      }
      PufsFileSystem.liveMounts.foreach { case (p, repo, sha) =>
        sb.append(s"mount\t$p\t$repo\t$sha\n")
      }
      Files.write(tmp.toPath, sb.toString.getBytes(UTF_8))
      Files.move(tmp.toPath, f.toPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      lines = 0
    }
  }
}
