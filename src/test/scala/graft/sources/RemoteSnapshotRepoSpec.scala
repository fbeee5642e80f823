package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The freeze-push-to-bucket / mount-from-bucket cycle against the wire-
  * verifying fake GCS: push is CAS-idempotent across the wire, mount is
  * lazy (manifest eagerly, bytes on demand through the chunk cache), and
  * a remotely replaced block under an open reader is a torn read. The
  * same cycle runs unchanged over the S3-protocol registry (the
  * BlockRegistry seam), and `publishDirect` sends a working tree straight
  * to a registry with task-side hashing and no local staging. */
class RemoteSnapshotRepoSpec extends SparkSpec {

  private val keyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private def newSrc(): String = {
    val src = Files.createTempDirectory("rsr-src").toString
    Files.createDirectories(Paths.get(src, "sub"))
    Files.write(Paths.get(src, "a.txt"), "alpha".getBytes(UTF_8))
    Files.write(Paths.get(src, "sub/b.bin"),
      Array.tabulate(200 * 1024)(i => (i % 249).toByte))
    src
  }

  test("push → mount → lazy read round trip, re-push uploads nothing") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("rsr-repo").toString
      val (localSha, _) = SnapshotStore.publish(src, repo, "main")

      val stats = RemoteSnapshotRepo.push(repo, "main", reg, "main")
      assert(stats.uploaded == 3 && stats.skipped == 0) // 2 blocks + manifest
      // CAS idempotence ACROSS THE WIRE: pushing the same label again
      // must not re-upload a single object
      val again = RemoteSnapshotRepo.push(repo, "main", reg, "main")
      assert(again.uploaded == 0 && again.skipped == 3, again.toString)

      val (sha, entries) = RemoteSnapshotRepo.mount(reg, "main")
      assert(sha == localSha)
      assert(entries.map(e => e.path -> e.size).toMap ==
        Map("a.txt" -> 5L, "sub/b.bin" -> (200L * 1024)))

      // lazy read through the chunk cache: a 5000-byte slice of the big
      // file pulls only the covering chunks, and a re-read goes local
      PufsFileSystem.simulateRestart()
      val cacheDir = Files.createTempDirectory("rsr-cache").toString
      val big = entries.find(_.path == "sub/b.bin").get
      val in = RemoteSnapshotRepo.openFile(reg, big, cacheDir, chunkSize = 8192)
      val buf = new Array[Byte](5000)
      in.readFully(100000L, buf, 0, 5000)
      assert(buf.sameElements(
        Array.tabulate(5000)(i => ((100000 + i) % 249).toByte)))
      assert(PufsFileSystem.bytesPulled.get() <= 2 * 8192,
        s"pulled ${PufsFileSystem.bytesPulled.get()} for a 5000-byte read")
      val before = srv.requests.get()
      in.readFully(100000L, buf, 0, 5000)
      assert(srv.requests.get() == before, "re-read hit the remote")
      in.close()
    } finally srv.stop()
  }

  test("incremental push: one changed file uploads one block + manifest") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("rsr-repo2").toString
      SnapshotStore.publish(src, repo, "v1")
      RemoteSnapshotRepo.push(repo, "v1", reg, "main")
      // change ONE file, publish v2 locally, push the same remote label
      Files.write(Paths.get(src, "a.txt"), "alpha-v2".getBytes(UTF_8))
      SnapshotStore.publish(src, repo, "v2")
      val stats = RemoteSnapshotRepo.push(repo, "v2", reg, "main")
      assert(stats.uploaded == 2, // changed block + new manifest
        s"expected 2 uploads, got $stats")
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "main")
      val a = entries.find(_.path == "a.txt").get
      val in = RemoteSnapshotRepo.openFile(reg, a,
        Files.createTempDirectory("rsr-cache2").toString)
      val got = new Array[Byte](a.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "alpha-v2")
      // the old root is still mountable by sha — content-addressed history
      val v1sha = SnapshotStore.getRoot(repo, "v1").get
      reg.setRoot("rollback", v1sha.getBytes(UTF_8))
      val (_, oldEntries) = RemoteSnapshotRepo.mount(reg, "rollback")
      assert(oldEntries.find(_.path == "a.txt").get.size == 5)
    } finally srv.stop()
  }

  test("gs:// remote links resolve through the pufs filesystem (M9/M10)") {
    val srv = new FakeGcs(keyPair)
    try {
      PufsFileSystem.registerGcs(srv.endpoint,
        new GcsAuth.TokenProvider(srv.account))
      val data = new Array[Byte](200 * 1024)
      new scala.util.Random(67).nextBytes(data)
      srv.putUnversioned("corpus/shard-00.bin", data)
      val backing = Files.createTempDirectory("gs-link").toString
      val conf = new org.apache.hadoop.conf.Configuration()
      conf.set("fs.pufs.impl", classOf[PufsFileSystem].getName)
      conf.set("fs.pufs.backing", backing)
      conf.set("fs.pufs.cache", Files.createTempDirectory("gs-link-cache").toString)
      conf.setLong("fs.pufs.chunk.size", 8192)
      conf.setLong("fs.pufs.readahead", 0)
      conf.setBoolean("fs.pufs.impl.disable.cache", true)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create("pufs:///"), conf).asInstanceOf[PufsFileSystem]
      PufsFileSystem.simulateRestart()
      // link by URL alone: attrs (size + generation pin) probed remotely
      fs.addRemoteUrl(new org.apache.hadoop.fs.Path("/ext/shard.bin"),
        "gs://bkt/corpus/shard-00.bin")
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path("/ext/shard.bin"))
      assert(st.getLen == data.length)
      val in = fs.open(new org.apache.hadoop.fs.Path("/ext/shard.bin"))
      val buf = new Array[Byte](5000)
      in.readFully(100000L, buf, 0, 5000)
      in.close()
      assert(buf.sameElements(
        java.util.Arrays.copyOfRange(data, 100000, 105000)))
      assert(PufsFileSystem.bytesPulled.get() <= 2 * 8192,
        s"pulled ${PufsFileSystem.bytesPulled.get()} — gs link read not lazy")
      // the generation pin holds: replace the object remotely, uncached
      // regions of the still-linked path are torn, not mixed
      srv.putUnversioned("corpus/shard-00.bin", new Array[Byte](data.length))
      val in2 = fs.open(new org.apache.hadoop.fs.Path("/ext/shard.bin"))
      intercept[TornReadException] {
        in2.readFully(150000L, buf, 0, 100)
      }
      in2.close()
      fs.close()
    } finally srv.stop()
  }

  test("S3-protocol registry runs the same cycle — BlockRegistry seam parity") {
    val creds = SigV4.Credentials("AKIDTEST", "testsecretkey")
    val srv = new FakeS3(creds)
    try {
      val reg = new S3RefRegistry(srv.endpoint, "bkt", "depot/", "test-1", creds)
      val src = newSrc()
      val repo = Files.createTempDirectory("rsr-s3-repo").toString
      val (localSha, _) = SnapshotStore.publish(src, repo, "main")

      val stats = RemoteSnapshotRepo.push(repo, "main", reg, "main")
      assert(stats.uploaded == 3 && stats.skipped == 0)
      val again = RemoteSnapshotRepo.push(repo, "main", reg, "main")
      assert(again.uploaded == 0 && again.skipped == 3, again.toString)

      val (sha, entries) = RemoteSnapshotRepo.mount(reg, "main")
      assert(sha == localSha) // content addressing is wire-independent
      PufsFileSystem.simulateRestart()
      val big = entries.find(_.path == "sub/b.bin").get
      val in = RemoteSnapshotRepo.openFile(reg, big,
        Files.createTempDirectory("rsr-s3-cache").toString, chunkSize = 8192)
      val buf = new Array[Byte](5000)
      in.readFully(100000L, buf, 0, 5000)
      assert(buf.sameElements(
        Array.tabulate(5000)(i => ((100000 + i) % 249).toByte)))
      assert(PufsFileSystem.bytesPulled.get() <= 2 * 8192)
      // ETag pin: replace the CAS object, uncached regions are torn
      srv.objects.put(s"depot/CAS/${big.sha256}",
        srv.Obj(new Array[Byte](big.size.toInt), "\"v2\""))
      intercept[TornReadException] { in.readFully(150000L, buf, 0, 100) }
      in.close()

      // publishDirect over the S3 conf (the serializable-recipe path):
      // same tree → same manifest sha, everything already present
      val conf = RegistryConf.S3(srv.endpoint, "bkt", "depot/", "test-1",
        creds.accessKey, creds.secretKey)
      val (directSha, dstats) =
        RemoteSnapshotRepo.publishDirect(spark, src, conf, "direct")
      assert(directSha == localSha)
      assert(dstats.uploaded == 0 && dstats.skipped == 3, dstats.toString)
    } finally srv.stop()
  }

  test("publishDirect: working tree straight to the registry, no staging") {
    val srv = new FakeGcs(keyPair)
    try {
      val conf = RegistryConf.gcs(srv.endpoint, "bkt", "depot/", srv.account)
      val src = newSrc()

      val (sha1, s1) = RemoteSnapshotRepo.publishDirect(spark, src, conf, "main")
      assert(s1.uploaded == 3 && s1.skipped == 0, s1.toString) // 2 blocks + manifest
      // the direct route and the stage-then-push route are the SAME
      // snapshot: byte-identical manifest, same content address
      val repo = Files.createTempDirectory("pd-repo").toString
      val (stagedSha, _) = SnapshotStore.publish(src, repo, "main")
      assert(sha1 == stagedSha)

      // idempotent: unchanged tree re-publishes nothing
      val (sha2, s2) = RemoteSnapshotRepo.publishDirect(spark, src, conf, "main")
      assert(sha2 == sha1 && s2.uploaded == 0 && s2.skipped == 3, s2.toString)

      // one changed file → exactly the new block + new manifest cross
      Files.write(Paths.get(src, "a.txt"), "alpha-v2".getBytes(UTF_8))
      val (sha3, s3) = RemoteSnapshotRepo.publishDirect(spark, src, conf, "main")
      assert(sha3 != sha1)
      assert(s3.uploaded == 2 && s3.skipped == 1, s3.toString)

      val reg = conf.open()
      val (mSha, entries) = RemoteSnapshotRepo.mount(reg, "main")
      assert(mSha == sha3)
      val a = entries.find(_.path == "a.txt").get
      val in = RemoteSnapshotRepo.openFile(reg, a,
        Files.createTempDirectory("pd-cache").toString)
      val got = new Array[Byte](a.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "alpha-v2")
    } finally srv.stop()
  }

  test("sharded root: mount one table without touching the others' shards") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      // a little "lake": three top-level tables + a root-level file
      val src = Files.createTempDirectory("shard-src").toString
      Seq("orders", "lineitem", "events").foreach { t =>
        Files.createDirectories(Paths.get(src, t))
        (0 until 3).foreach { i =>
          Files.write(Paths.get(src, s"$t/part-$i.dat"),
            s"$t-$i-payload".getBytes(UTF_8))
        }
      }
      Files.write(Paths.get(src, "README"), "lake".getBytes(UTF_8))
      val repo = Files.createTempDirectory("shard-repo").toString
      SnapshotStore.publish(src, repo, "v1")
      val s1 = RemoteSnapshotRepo.pushSharded(repo, "v1", reg, "lake")
      // 10 file blocks + 4 shard manifests ("", events, lineitem, orders)
      // + 1 index
      assert(s1.uploaded == 15 && s1.skipped == 0, s1.toString)

      // the index probe is O(top-level dirs) and carries sizes
      val (_, shards) = RemoteSnapshotRepo.mountIndex(reg, "lake")
      assert(shards.map(_.prefix).sorted == Seq("", "events", "lineitem", "orders"))
      assert(shards.find(_.prefix == "orders").get.files == 3)

      // the direct distributed route lands on the SAME sharded root:
      // identical index sha, nothing re-uploaded
      val conf = RegistryConf.gcs(srv.endpoint, "bkt", "depot/", srv.account)
      val (directSha, ds) =
        RemoteSnapshotRepo.publishDirectSharded(spark, src, conf, "lake2")
      assert(directSha == new String(reg.getRoot("lake").get, UTF_8))
      assert(ds.uploaded == 0 && ds.skipped == 15, ds.toString)

      // DELETE every other shard's manifest block from the bucket: if
      // mounting one table touched them, this would fail loudly
      shards.filter(s => s.prefix != "orders").foreach { s =>
        srv.objects.remove(s"depot/CAS/${s.sha}")
      }
      val orders = RemoteSnapshotRepo.mountShard(reg, "lake", "orders")
      assert(orders.map(_.path).sorted ==
        Seq("orders/part-0.dat", "orders/part-1.dat", "orders/part-2.dat"))
      // file bytes of the mounted shard still read fine
      val e0 = orders.find(_.path == "orders/part-0.dat").get
      val in = RemoteSnapshotRepo.openFile(reg, e0,
        Files.createTempDirectory("shard-cache").toString)
      val got = new Array[Byte](e0.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "orders-0-payload")
      assert(RemoteSnapshotRepo.mountShard(reg, "lake", "nope").isEmpty)
    } finally srv.stop()
  }

  test("sharded incremental republish touches one shard + the index") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = Files.createTempDirectory("shard2-src").toString
      Seq("a", "b").foreach { t =>
        Files.createDirectories(Paths.get(src, t))
        Files.write(Paths.get(src, s"$t/data.txt"), s"$t-v1".getBytes(UTF_8))
      }
      val repo = Files.createTempDirectory("shard2-repo").toString
      SnapshotStore.publish(src, repo, "v1")
      RemoteSnapshotRepo.pushSharded(repo, "v1", reg, "lake")
      // change ONE file under a/ → exactly: its block, a's shard, index
      Files.write(Paths.get(src, "a/data.txt"), "a-v2".getBytes(UTF_8))
      SnapshotStore.publish(src, repo, "v2")
      val s2 = RemoteSnapshotRepo.pushSharded(repo, "v2", reg, "lake")
      assert(s2.uploaded == 3, s2.toString)
      // a flat mount of the sharded label sees the whole updated tree —
      // flat and sharded roots are interchangeable to readers
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "lake")
      assert(entries.map(_.path).sorted == Seq("a/data.txt", "b/data.txt"))
      val a = entries.find(_.path == "a/data.txt").get
      val in = RemoteSnapshotRepo.openFile(reg, a,
        Files.createTempDirectory("shard2-cache").toString)
      val got = new Array[Byte](a.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "a-v2")
    } finally srv.stop()
  }

  test("remote gc: reachability from roots + leases, expired leases dropped") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("gc-repo").toString
      SnapshotStore.publish(src, repo, "v1")
      val v1sha = SnapshotStore.getRoot(repo, "v1").get
      RemoteSnapshotRepo.push(repo, "v1", reg, "main")
      // supersede v1: the old a.txt block + old manifest become garbage
      Files.write(Paths.get(src, "a.txt"), "alpha-v2".getBytes(UTF_8))
      SnapshotStore.publish(src, repo, "v2")
      RemoteSnapshotRepo.push(repo, "v2", reg, "main")

      // an unexpired lease pins the superseded snapshot: nothing moves
      val hour = 60L * 60 * 1000
      reg.setLease("pin-v1", System.currentTimeMillis() + hour,
        v1sha.getBytes(UTF_8))
      assert(RemoteSnapshotRepo.gc(reg) == ((0, 0)))
      assert(reg.blockSize(v1sha) > 0) // v1 manifest still present

      // lease expired → v1's closure is garbage, the lease is dropped
      reg.setLease("pin-v1", System.currentTimeMillis() - 1,
        v1sha.getBytes(UTF_8))
      val (deleted, dropped) = RemoteSnapshotRepo.gc(reg)
      assert(deleted == 2 && dropped == 1, s"($deleted, $dropped)")
      intercept[java.io.IOException] { reg.blockSize(v1sha) }

      // the live label is untouched and still fully readable
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "main")
      val a = entries.find(_.path == "a.txt").get
      val in = RemoteSnapshotRepo.openFile(reg, a,
        Files.createTempDirectory("gc-cache").toString)
      val got = new Array[Byte](a.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "alpha-v2")
      // idempotent: a second pass finds a clean registry
      assert(RemoteSnapshotRepo.gc(reg) == ((0, 0)))
    } finally srv.stop()
  }

  test("gc keeps labels whose NAMES contain '/' (flat registry listing)") {
    // regression: listRoots/listLeases once used a delimiter listing, so a
    // root named "datasets/v1" was reported as the dir "datasets" and
    // filtered out — gc then saw its closure as unreachable and deleted
    // the live blocks
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("nested-repo").toString
      SnapshotStore.publish(src, repo, "main")
      RemoteSnapshotRepo.push(repo, "main", reg, "datasets/v1")
      assert(RemoteSnapshotRepo.gc(reg) == ((0, 0)),
        "gc deleted blocks reachable only from a nested label name")
      // the nested label still mounts and reads after gc
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "datasets/v1")
      assert(entries.map(_.path).sorted == Seq("a.txt", "sub/b.bin"))
      // nested LEASE names must survive the same way
      val sha = new String(reg.getRoot("datasets/v1").get, UTF_8)
      reg.setLease("team/pin", System.currentTimeMillis() + 3600000,
        sha.getBytes(UTF_8))
      assert(RemoteSnapshotRepo.gc(reg)._2 == 0, "nested lease dropped as unlisted")
    } finally srv.stop()
  }

  test("gc survives a root that points at a non-manifest block") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("badptr-repo").toString
      SnapshotStore.publish(src, repo, "main")
      RemoteSnapshotRepo.push(repo, "main", reg, "main")
      // a label set DIRECTLY at a file block (not a manifest): its text is
      // binary garbage for the manifest parser — gc must treat it as a
      // leaf, not abort the whole run
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "main")
      val fileSha = entries.find(_.path == "sub/b.bin").get.sha256
      reg.setRoot("raw-block", fileSha.getBytes(UTF_8))
      // real garbage to collect: an orphaned CAS block with no referrer
      val orphan = "ff" * 32
      reg.pushBlock(orphan, "orphan-bytes".getBytes(UTF_8))
      val (deleted, _) = RemoteSnapshotRepo.gc(reg)
      assert(deleted == 1, s"expected only the orphan deleted, got $deleted")
      assert(reg.blockSize(fileSha) > 0, "leaf-rooted block was collected")
      intercept[java.io.IOException] { reg.blockSize(orphan) }
    } finally srv.stop()
  }

  test("remote gc over S3 with sharded roots and paginated listing") {
    val creds = SigV4.Credentials("AKIDTEST", "testsecretkey")
    val srv = new FakeS3(creds, listPageSize = 3) // forces continuation tokens
    try {
      val reg = new S3RefRegistry(srv.endpoint, "bkt", "depot/", "test-1", creds)
      val src = Files.createTempDirectory("gcs3-src").toString
      Seq("a", "b").foreach { t =>
        Files.createDirectories(Paths.get(src, t))
        Files.write(Paths.get(src, s"$t/data.txt"), s"$t-v1".getBytes(UTF_8))
      }
      val repo = Files.createTempDirectory("gcs3-repo").toString
      SnapshotStore.publish(src, repo, "v1")
      RemoteSnapshotRepo.pushSharded(repo, "v1", reg, "lake")
      Files.write(Paths.get(src, "a/data.txt"), "a-v2".getBytes(UTF_8))
      SnapshotStore.publish(src, repo, "v2")
      RemoteSnapshotRepo.pushSharded(repo, "v2", reg, "lake")
      // garbage = v1's a-block + v1's a-shard manifest + v1's index
      val (deleted, dropped) = RemoteSnapshotRepo.gc(reg)
      assert(deleted == 3 && dropped == 0, s"($deleted, $dropped)")
      // the sharded mount still serves post-gc
      val orders = RemoteSnapshotRepo.mountShard(reg, "lake", "a")
      assert(orders.map(_.path) == Seq("a/data.txt"))
      val e = orders.head
      val in = RemoteSnapshotRepo.openFile(reg, e,
        Files.createTempDirectory("gcs3-cache").toString)
      val got = new Array[Byte](e.size.toInt)
      in.readFully(0L, got, 0, got.length)
      in.close()
      assert(new String(got, UTF_8) == "a-v2")
      assert(RemoteSnapshotRepo.gc(reg) == ((0, 0)))
    } finally srv.stop()
  }

  test("remotely replaced block under an open reader is a torn read") {
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/",
        new GcsAuth.TokenProvider(srv.account))
      val src = newSrc()
      val repo = Files.createTempDirectory("rsr-repo3").toString
      SnapshotStore.publish(src, repo, "main")
      RemoteSnapshotRepo.push(repo, "main", reg, "main")
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "main")
      val big = entries.find(_.path == "sub/b.bin").get
      PufsFileSystem.simulateRestart()
      val in = RemoteSnapshotRepo.openFile(reg, big,
        Files.createTempDirectory("rsr-cache3").toString, chunkSize = 8192)
      val buf = new Array[Byte](100)
      in.readFully(0L, buf, 0, 100) // pin established, first chunk cached
      // a (buggy or malicious) writer replaces the CAS object in place:
      // the generation changes, so uncached regions MUST fail, not mix
      srv.putUnversioned(s"depot/CAS/${big.sha256}",
        new Array[Byte](big.size.toInt))
      intercept[TornReadException] { in.readFully(150000L, buf, 0, 100) }
      in.close()
    } finally srv.stop()
  }
}
