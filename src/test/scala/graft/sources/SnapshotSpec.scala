package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Commit/publish/mount round trip — the reference's TestFreezePush
  * (core/functional_test.go:174-214): create → publish(label) → mount from
  * a fresh view → content equality; plus idempotence and label repoint. */
class SnapshotSpec extends SparkSpec {

  private def mkTree(): String = {
    val src = Files.createTempDirectory("snap-src").toString
    Files.createDirectories(Paths.get(src, "sub"))
    Files.write(Paths.get(src, "a.txt"), "alpha".getBytes)
    Files.write(Paths.get(src, "sub/b.txt"), "beta".getBytes)
    Files.write(Paths.get(src, "sub/c.bin"), Array.tabulate(5000)(i => (i % 251).toByte))
    src
  }

  test("publish → mount round trip preserves every byte") {
    val src = mkTree()
    val repo = Files.createTempDirectory("snap-repo").toString
    val (sha, uploaded) = SnapshotStore.publish(src, repo, "main")
    assert(uploaded == 4) // 3 files + 1 manifest
    val entries = SnapshotStore.mount(repo, "main")
    assert(entries.map(_.path) == Seq("a.txt", "sub/b.txt", "sub/c.bin"))
    entries.foreach { e =>
      val orig = Files.readAllBytes(Paths.get(src, e.path))
      assert(java.util.Arrays.equals(SnapshotStore.readBlock(repo, e.sha256), orig),
        s"content mismatch for ${e.path}")
      assert(e.size == orig.length)
    }
    assert(SnapshotStore.getRoot(repo, "main").contains(sha))
  }

  test("re-publish of unchanged tree uploads nothing (CAS idempotence)") {
    val src = mkTree()
    val repo = Files.createTempDirectory("snap-repo2").toString
    val (sha1, up1) = SnapshotStore.publish(src, repo, "main")
    val (sha2, up2) = SnapshotStore.publish(src, repo, "main")
    assert(sha1 == sha2, "identical tree must freeze to the same root")
    assert(up1 == 4 && up2 == 0, s"expected 0 re-uploads, got $up2")
  }

  test("label repoints atomically; old snapshot stays readable by sha") {
    val src = mkTree()
    val repo = Files.createTempDirectory("snap-repo3").toString
    val (sha1, _) = SnapshotStore.publish(src, repo, "main")
    Files.write(Paths.get(src, "a.txt"), "alpha-v2".getBytes)
    val (sha2, up2) = SnapshotStore.publish(src, repo, "main")
    assert(sha1 != sha2)
    assert(up2 == 2, s"only changed file + new manifest should upload, got $up2")
    assert(SnapshotStore.getRoot(repo, "main").contains(sha2))
    // old manifest still dereferenceable — snapshot isolation
    val oldManifest = new String(SnapshotStore.readBlock(repo, sha1), "UTF-8")
    assert(oldManifest.contains("a.txt"))
  }

  test("snapshot as catalog DataFrame") {
    val src = mkTree()
    val repo = Files.createTempDirectory("snap-repo4").toString
    SnapshotStore.publish(src, repo, "main")
    val df = SnapshotStore.asDataFrame(spark, repo, "main")
    assert(df.columns.sorted.toSeq == Seq("path", "sha256", "size"))
    assert(df.count() == 3)
  }
}
