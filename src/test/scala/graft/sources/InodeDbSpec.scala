package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** The durable inode journal (boltdb INodeDB analog): generations and
  * mounts survive a simulated restart, torn trailing writes are dropped
  * like torn region-log entries, and compaction preserves state. */
class InodeDbSpec extends AnyFunSuite {

  test("path generations survive a restart when journaled") {
    val dbDir = Files.createTempDirectory("inodedb").toString
    InodeDb.attach(dbDir)
    try {
      val backing = Files.createTempDirectory("inodedb-backing").toString
      // three mutations of one path, one of another — via the real
      // journaled bump path
      PufsFileSystem.bumpGeneration(backing, "data/hot.bin")
      PufsFileSystem.bumpGeneration(backing, "data/hot.bin")
      PufsFileSystem.bumpGeneration(backing, "data/hot.bin")
      PufsFileSystem.bumpGeneration(backing, "cold.bin")
      assert(PufsFileSystem.generationOf(backing, "data/hot.bin") == 3)

      PufsFileSystem.simulateRestart() // wipes the in-memory table
      assert(PufsFileSystem.generationOf(backing, "data/hot.bin") == 0,
        "restart must clear volatile state for this test to mean anything")

      InodeDb.attach(dbDir) // the restarted daemon re-attaches
      assert(PufsFileSystem.generationOf(backing, "data/hot.bin") == 3,
        "journaled generation lost across restart")
      assert(PufsFileSystem.generationOf(backing, "cold.bin") == 1)
    } finally InodeDb.detach()
  }

  test("mount table replays: a journaled mount resolves without re-mounting") {
    val dbDir = Files.createTempDirectory("inodedb-m").toString
    // a real published snapshot to mount
    val src = Files.createTempDirectory("inodedb-src").toString
    Files.write(Paths.get(src, "t.txt"), "mounted".getBytes(UTF_8))
    val repo = Files.createTempDirectory("inodedb-repo").toString
    val (sha, _) = SnapshotStore.publish(src, repo, "main")
    // journal written by a previous process
    Files.write(Paths.get(dbDir, "inodes.log"),
      s"mount\tdb/snap\t$repo\t$sha\n".getBytes(UTF_8))
    InodeDb.attach(dbDir)
    try {
      val m = PufsFileSystem.resolveMount("db/snap/t.txt")
      assert(m.isDefined, "journaled mount did not replay")
      assert(m.get._1.manifestSha == sha && m.get._2 == "t.txt")
      // unmount journals too: after replaying an unmount the path is gone
      PufsFileSystem.unmountSnapshot("db/snap")
      InodeDb.attach(dbDir)
      assert(PufsFileSystem.resolveMount("db/snap/t.txt").isEmpty,
        "journaled unmount ignored on replay")
    } finally {
      PufsFileSystem.unmountSnapshot("db/snap")
      InodeDb.detach()
    }
  }

  test("torn tail with valid field count but truncated number is dropped") {
    // the dangerous torn write: "gen\tkey\t12" cut from "gen\tkey\t1234"
    // parses as a VALID line restoring an older generation — exactly the
    // block-id aliasing the journal exists to prevent. The unterminated
    // final line (no trailing \n) must be dropped outright.
    val dbDir = Files.createTempDirectory("inodedb-t").toString
    InodeDb.attach(dbDir)
    try {
      val backing = Files.createTempDirectory("inodedb-t-backing").toString
      (1 to 12).foreach(_ => PufsFileSystem.bumpGeneration(backing, "a.bin"))
      // crash mid-append: the digits of the new generation are cut short
      Files.write(Paths.get(dbDir, "inodes.log"),
        s"gen\t$backing/a.bin\t1".getBytes(UTF_8), StandardOpenOption.APPEND)
      PufsFileSystem.simulateRestart()
      InodeDb.attach(dbDir)
      assert(PufsFileSystem.generationOf(backing, "a.bin") == 12,
        "truncated-number torn tail rolled a generation BACKWARD")
      InodeDb.compact() // rewrite clean (drops the torn fragment)
      // a COMPLETE line with a non-numeric value (right field count,
      // terminated) must be skipped, not crash attach for every later
      // process — defense in depth under the newline-drop rule
      Files.write(Paths.get(dbDir, "inodes.log"),
        s"gen\t$backing/a.bin\tnotanum\n".getBytes(UTF_8),
        StandardOpenOption.APPEND)
      PufsFileSystem.simulateRestart()
      InodeDb.attach(dbDir) // NumberFormatException here = the bug
      assert(PufsFileSystem.generationOf(backing, "a.bin") == 12)
    } finally InodeDb.detach()
  }

  test("torn trailing line is dropped; compaction preserves state") {
    val dbDir = Files.createTempDirectory("inodedb-c").toString
    InodeDb.attach(dbDir)
    try {
      val backing = Files.createTempDirectory("inodedb-c-backing").toString
      (1 to 5).foreach(_ => PufsFileSystem.bumpGeneration(backing, "a.bin"))
      // simulate a crash mid-append: a torn half-line at the tail
      Files.write(Paths.get(dbDir, "inodes.log"),
        "gen\t/somepath".getBytes(UTF_8),
        StandardOpenOption.APPEND)
      PufsFileSystem.simulateRestart()
      InodeDb.attach(dbDir)
      assert(PufsFileSystem.generationOf(backing, "a.bin") == 5,
        "torn line must not poison replay")
      InodeDb.compact()
      PufsFileSystem.simulateRestart()
      InodeDb.attach(dbDir)
      assert(PufsFileSystem.generationOf(backing, "a.bin") == 5,
        "compaction lost state")
      // compacted journal is a state snapshot: one line per key, no torn tail
      val log = new String(Files.readAllBytes(
        Paths.get(dbDir, "inodes.log")), UTF_8)
      assert(log.split("\n").count(_.contains(backing)) == 1)
    } finally InodeDb.detach()
  }
}
