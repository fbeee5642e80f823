package graft

import java.nio.file.{Files, Paths}

import graft.sources.SnapshotStore

/** The CLI front-end drives the snapshot store end-to-end: push → labels →
  * ls → cat → diff → sql → gc, each verb through Cli.run (the same
  * dispatch `main` uses, minus the sys.exit). */
class CliSpec extends SparkSpec {

  private def captureOut(body: => Int): (Int, String) = {
    val bos = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      // System.out is used directly by cat; swap it too
      val saved = System.out
      System.setOut(new java.io.PrintStream(bos, true, "UTF-8"))
      try body finally System.setOut(saved)
    }
    (code, bos.toString("UTF-8"))
  }

  test("push / labels / ls / cat / diff / gc round trip") {
    val src = Files.createTempDirectory("cli-src").toString
    Files.createDirectories(Paths.get(src, "t"))
    Files.write(Paths.get(src, "t/a.txt"), "alpha".getBytes)
    Files.write(Paths.get(src, "readme.md"), "hello".getBytes)
    val repo = Files.createTempDirectory("cli-repo").toString

    val (c1, o1) = captureOut(Cli.run(List("push", src, repo, "main")))
    assert(c1 == 0 && o1.contains("published main root="), o1)
    val sha = SnapshotStore.getRoot(repo, "main").get

    val (c2, o2) = captureOut(Cli.run(List("labels", repo)))
    assert(c2 == 0 && o2.contains(s"main\t$sha"), o2)

    val (c3, o3) = captureOut(Cli.run(List("ls", repo, "main")))
    assert(c3 == 0 && o3.contains("t/a.txt") && o3.contains("2 files"), o3)
    val (c3b, o3b) = captureOut(Cli.run(List("ls", repo, "main", "t/")))
    assert(c3b == 0 && o3b.contains("1 files") && !o3b.contains("readme"), o3b)

    val (c4, o4) = captureOut(Cli.run(List("cat", repo, "main", "t/a.txt")))
    assert(c4 == 0 && o4 == "alpha", s"cat gave '$o4'")
    val (c4b, _) = captureOut(Cli.run(List("cat", repo, "main", "nope")))
    assert(c4b == 1)

    // second publish with a changed file; diff reports exactly it
    Files.write(Paths.get(src, "t/a.txt"), "alpha2".getBytes)
    assert(captureOut(Cli.run(List("push", src, repo, "v2")))._1 == 0)
    val (c5, o5) = captureOut(Cli.run(List("diff", repo, "main", "v2")))
    assert(c5 == 0 && o5.contains("t/a.txt") && o5.contains("1 changes"), o5)

    // gc: nothing is collectable while labels still pin both snapshots
    val (c6, o6) = captureOut(Cli.run(List("gc", repo)))
    assert(c6 == 0 && o6.contains("collected 0 blocks"), o6)

    // bad verb → usage + nonzero
    assert(Cli.run(List("frobnicate")) == 1)
  }

  test("init creates a usable repo skeleton; re-init refuses") {
    val repo = Files.createTempDirectory("cli-init").resolve("repo").toString
    val (c1, o1) = captureOut(Cli.run(List("init", repo, "mybucket", "lake/a")))
    assert(c1 == 0 && o1.contains("initialized"))
    assert(Files.isDirectory(Paths.get(repo, "CAS")))
    assert(Files.isDirectory(Paths.get(repo, "root")))
    val info = new String(
      Files.readAllBytes(Paths.get(repo, ".pufs", "info")), "UTF-8")
    assert(info.contains("type=repo") && info.contains("bucketName=mybucket")
      && info.contains("keyPrefix=lake/a"), info)
    // an initialized repo takes a push without further ceremony
    val src = Files.createTempDirectory("cli-init-src").toString
    Files.write(Paths.get(src, "a.txt"), "hello".getBytes("UTF-8"))
    assert(captureOut(Cli.run(List("push", src, repo, "main")))._1 == 0)
    assert(captureOut(Cli.run(List("cat", repo, "main", "a.txt")))._2
      .contains("hello"))
    // second init refuses instead of clobbering
    assert(Cli.run(List("init", repo)) == 1)
  }

  test("dump prints the replayed inode journal: generations and mounts") {
    import graft.sources.{InodeDb, PufsFileSystem}
    val dbDir = Files.createTempDirectory("cli-dump").toString
    val src = Files.createTempDirectory("cli-dump-src").toString
    Files.write(Paths.get(src, "t.txt"), "x".getBytes("UTF-8"))
    val repo = Files.createTempDirectory("cli-dump-repo").toString
    val (sha, _) = SnapshotStore.publish(src, repo, "main")
    val backing = Files.createTempDirectory("cli-dump-backing").toString
    // the journal a prior process left behind: one generation pin, one
    // mount (same line format InodeDb itself writes)
    Files.write(Paths.get(dbDir, "inodes.log"),
      (s"gen\t$backing/data/hot.bin\t3\n" +
        s"mount\tcli/snap\t$repo\t$sha\n").getBytes("UTF-8"))
    PufsFileSystem.simulateRestart() // clear generation pins of other suites
    val (code, out) = captureOut(Cli.run(List("dump", dbDir)))
    assert(code == 0, out)
    assert(out.contains(s"gen\t$backing/data/hot.bin\t3"), out)
    assert(out.contains(s"mount\tcli/snap\t$repo\t$sha"), out)
    // summary counts cover at least the two journaled records (mounts are
    // process-global, other suites may hold more)
    assert(out.linesIterator.exists(
      _.matches("\\d+ generations, \\d+ mounts")), out)
    PufsFileSystem.unmountSnapshot("cli/snap") // dump's replay re-mounted it
    assert(Cli.run(List("dump", "/no/such/dir")) == 1)
  }

  test("add-url is the reference-named alias of link") {
    val data = "added-bytes".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/o", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        ex.getResponseHeaders.set("ETag", "\"au-v1\"")
        if (ex.getRequestMethod == "HEAD") {
          ex.getResponseHeaders.set("Content-Length", data.length.toString)
          ex.sendResponseHeaders(200, -1)
        } else {
          ex.sendResponseHeaders(200, data.length)
          ex.getResponseBody.write(data)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val backing = Files.createTempDirectory("cli-addurl").toString
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/o"
      val (code, out) =
        captureOut(Cli.run(List("add-url", backing, "/ext/o.bin", url)))
      assert(code == 0 && out.contains(s"${data.length} bytes"), out)
      assert(Files.exists(Paths.get(backing, "ext/o.bin.pufslink")),
        "add-url must write the same link sidecar as link")
    } finally server.stop(0)
  }

  test("link verb attaches an HTTP object to a backing tree") {
    val data = "linked-bytes-via-cli".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/obj", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        ex.getResponseHeaders.set("ETag", "\"cli-v1\"")
        if (ex.getRequestMethod == "HEAD") {
          ex.getResponseHeaders.set("Content-Length", data.length.toString)
          ex.sendResponseHeaders(200, -1)
        } else {
          ex.sendResponseHeaders(200, data.length)
          ex.getResponseBody.write(data)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val backing = Files.createTempDirectory("cli-link").toString
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/obj"
      val (code, out) = captureOut(Cli.run(List("link", backing, "/ext/obj.txt", url)))
      assert(code == 0 && out.contains(s"${data.length} bytes"), out)
      // the link sidecar exists in the backing tree with the probed attrs
      val side = new String(Files.readAllBytes(
        Paths.get(backing, "ext/obj.txt.pufslink")), "UTF-8")
      assert(side == s"$url\t\"cli-v1\"\t${data.length}", side)
    } finally server.stop(0)
  }

  test("rollback repoints a label at a historical manifest") {
    val src = Files.createTempDirectory("cli-rb-src").toString
    Files.write(Paths.get(src, "f.txt"), "one".getBytes)
    val repo = Files.createTempDirectory("cli-rb-repo").toString
    assert(captureOut(Cli.run(List("push", src, repo, "main")))._1 == 0)
    val sha1 = SnapshotStore.getRoot(repo, "main").get
    Files.write(Paths.get(src, "f.txt"), "two".getBytes)
    assert(captureOut(Cli.run(List("push", src, repo, "main")))._1 == 0)
    assert(SnapshotStore.getRoot(repo, "main").get != sha1)
    val (c, o) = captureOut(Cli.run(List("rollback", repo, "main", sha1)))
    assert(c == 0 && o.contains(s"-> $sha1"), o)
    assert(SnapshotStore.getRoot(repo, "main").contains(sha1))
    // the restored snapshot serves the original bytes
    val (cc, oc) = captureOut(Cli.run(List("cat", repo, "main", "f.txt")))
    assert(cc == 0 && oc == "one")
    // unknown sha refuses
    assert(captureOut(Cli.run(List("rollback", repo, "main", "deadbeef")))._1 == 1)
  }

  test("stats and prune verbs expose the zone map") {
    val src = Files.createTempDirectory("cli-zm-src").toString
    spark.range(0, 4000).selectExpr("id AS key", "id * 2 AS v")
      .orderBy("key").write.option("maxRecordsPerFile", 1000)
      .parquet(s"$src/t")
    val repo = Files.createTempDirectory("cli-zm-repo").toString
    val (c1, o1) = captureOut(Cli.run(List("push", src, repo, "main", "key")))
    assert(c1 == 0 && o1.contains("zone-map entries="), o1)
    val (c2, o2) = captureOut(Cli.run(List("stats", repo, "main", "key")))
    assert(c2 == 0 && o2.contains("zone entries") && o2.contains("key\t["), o2)
    val (c3, o3) = captureOut(Cli.run(
      List("prune", repo, "main", "key", "100", "900")))
    assert(c3 == 0, o3)
    // non-parquet sidecars (_SUCCESS etc.) have no zone entries and are
    // kept conservatively — the strict-subset claim is about DATA files
    val survivedParquet = o3.linesIterator.count(_.endsWith(".parquet"))
    assert(survivedParquet >= 1 && survivedParquet < 4,
      s"expected a strict subset of the 4 data files:\n$o3")
  }

  test("push-remote / gc-remote drive a bucket registry through the verb " +
      "dispatch") {
    val keyPair = {
      val g = java.security.KeyPairGenerator.getInstance("RSA")
      g.initialize(2048); g.generateKeyPair()
    }
    val srv = new graft.sources.FakeGcs(keyPair)
    try {
      val reg = new graft.sources.GcsRefRegistry(srv.endpoint, "bkt", "d/",
        new graft.sources.GcsAuth.TokenProvider(srv.account))
      Cli.registryOverride = Some(reg) // env credentials are unreachable in-test
      val src = Files.createTempDirectory("cli-pr-src").toString
      Files.createDirectories(Paths.get(src, "t"))
      Files.write(Paths.get(src, "t/a.txt"), "alpha".getBytes)
      val repo = Files.createTempDirectory("cli-pr-repo").toString
      assert(captureOut(Cli.run(List("push", src, repo, "main")))._1 == 0)

      val (c1, o1) = captureOut(Cli.run(List("push-remote", "gs", "e", "b",
        "p/", repo, "main", "lake")))
      assert(c1 == 0 && o1.contains("2 uploaded"), o1) // file block + manifest
      // idempotent re-push uploads nothing
      val (c2, o2) = captureOut(Cli.run(List("push-remote", "gs", "e", "b",
        "p/", repo, "main", "lake")))
      assert(c2 == 0 && o2.contains("0 uploaded"), o2)
      // the pushed label mounts from the registry
      val (_, entries) = graft.sources.RemoteSnapshotRepo.mount(reg, "lake")
      assert(entries.map(_.path) == Seq("t/a.txt"))
      // sharded layout through the same verb
      val (c3, o3) = captureOut(Cli.run(List("push-remote", "gs", "e", "b",
        "p/", repo, "main", "lake-sharded", "--sharded")))
      assert(c3 == 0, o3)
      assert(graft.sources.RemoteSnapshotRepo.mountShard(reg, "lake-sharded", "t")
        .map(_.path) == Seq("t/a.txt"))
      // gc through the verb: everything is label-reachable
      val (c4, o4) = captureOut(Cli.run(List("gc-remote", "gs", "e", "b", "p/")))
      assert(c4 == 0 && o4.contains("collected 0 blocks"), o4)
    } finally {
      Cli.registryOverride = None
      srv.stop()
    }
  }

  test("sql verb queries a pushed parquet snapshot through pufs://") {
    val src = Files.createTempDirectory("cli-sql-src").toString
    spark.range(0, 100).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.parquet(s"$src/nums")
    val repo = Files.createTempDirectory("cli-sql-repo").toString
    assert(captureOut(Cli.run(List("push", src, repo, "main")))._1 == 0)
    val (code, out) = captureOut(Cli.run(List("sql", repo, "main",
      "SELECT count(*) AS n, sum(v) AS s FROM nums")))
    assert(code == 0, out)
    assert(out.contains("100") && out.contains("9900"), out)
    // the CLI must not have stopped the suite's shared session
    assert(!spark.sparkContext.isStopped)
  }
}
