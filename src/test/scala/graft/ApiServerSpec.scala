package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** The read-only control API driven over the wire (raw HTTP), against a
  * published label — the reference's gRPC GetDirContents surface
  * (api/api.proto:26-28) re-expressed as HTTP+JSON. */
class ApiServerSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private lazy val (repo, handle) = {
    val src = Files.createTempDirectory("api-src").toString
    Files.createDirectories(Paths.get(src, "sub/deep"))
    Files.write(Paths.get(src, "a.txt"), "alpha".getBytes(UTF_8))
    Files.write(Paths.get(src, "sub/b.txt"), "beta-bytes".getBytes(UTF_8))
    Files.write(Paths.get(src, "sub/deep/c.bin"),
      Array.tabulate(5000)(i => (i % 251).toByte))
    val repo = Files.createTempDirectory("api-repo").toString
    SnapshotStore.publish(src, repo, "main")
    (repo, ApiServer.start(repo, "main"))
  }

  private def get(path: String,
      headers: Map[String, String] = Map.empty): (Int, Array[Byte]) = {
    val conn = URI.create(s"http://127.0.0.1:${handle.port}$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      val in = if (code < 400) conn.getInputStream else conn.getErrorStream
      (code, if (in == null) Array.emptyByteArray
             else try in.readAllBytes() finally in.close())
    } finally conn.disconnect()
  }

  private def json(bytes: Array[Byte]) = mapper.readTree(bytes)

  test("GetDirContents: root and nested listings with proto-shaped entries") {
    val (code, body) = get("/v1/dir?path=")
    assert(code == 200)
    val entries = json(body).path("entries")
    val byName = (0 until entries.size).map(entries.get)
      .map(e => e.path("name").asText -> e).toMap
    assert(byName.keySet == Set("a.txt", "sub"))
    assert(byName("sub").path("isDir").asBoolean)
    assert(!byName("a.txt").path("isDir").asBoolean)
    assert(byName("a.txt").path("size").asLong == 5)
    assert(byName("a.txt").path("blockId").asText.length == 64) // sha256 hex
    assert(byName("a.txt").has("populatedSize") &&
      byName("a.txt").has("populatedRegionCount")) // api.proto:18-19 fields
    val (c2, b2) = get("/v1/dir?path=sub")
    assert(c2 == 200)
    val sub = json(b2).path("entries")
    assert((0 until sub.size).map(sub.get(_).path("name").asText).toSet ==
      Set("b.txt", "deep"))
  }

  test("dir on a file is an errorMsg, dir on a missing path is 404") {
    val (c1, b1) = get("/v1/dir?path=a.txt")
    assert(c1 == 400 && json(b1).path("errorMsg").asText.contains("not a directory"))
    val (c2, b2) = get("/v1/dir?path=nope")
    assert(c2 == 404 && json(b2).has("errorMsg"))
  }

  test("stat resolves files and directories; 404 otherwise") {
    val (c1, b1) = get("/v1/stat?path=sub/deep/c.bin")
    assert(c1 == 200)
    val e = json(b1)
    assert(e.path("name").asText == "c.bin" && e.path("size").asLong == 5000)
    val (c2, b2) = get("/v1/stat?path=sub/deep")
    assert(c2 == 200 && json(b2).path("isDir").asBoolean)
    assert(get("/v1/stat?path=sub/ghost")._1 == 404)
  }

  test("read serves full bytes and honors Range with a 206") {
    val expected = Array.tabulate(5000)(i => (i % 251).toByte)
    val (c1, b1) = get("/v1/read?path=sub/deep/c.bin")
    assert(c1 == 200 && java.util.Arrays.equals(b1, expected))
    val (c2, b2) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=1000-1999"))
    assert(c2 == 206 && java.util.Arrays.equals(b2,
      java.util.Arrays.copyOfRange(expected, 1000, 2000)))
    val (c3, b3) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=4500-")) // open-ended tail
    assert(c3 == 206 && java.util.Arrays.equals(b3,
      java.util.Arrays.copyOfRange(expected, 4500, 5000)))
    assert(get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=9000-9100"))._1 == 416)
    assert(get("/v1/read?path=ghost")._1 == 404)
  }

  test("read: suffix ranges, malformed ranges, and empty files are HTTP " +
      "responses, never dropped connections") {
    val expected = Array.tabulate(5000)(i => (i % 251).toByte)
    // RFC 7233 suffix range: last n bytes
    val (c1, b1) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=-500"))
    assert(c1 == 206 && java.util.Arrays.equals(b1,
      java.util.Arrays.copyOfRange(expected, 4500, 5000)))
    // a suffix longer than the file clamps to the whole file
    val (c2, b2) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=-99999"))
    assert(c2 == 206 && java.util.Arrays.equals(b2, expected))
    // multi-range and garbage specs: 416 with an errorMsg body — the old
    // handler threw NumberFormatException out of the exchange and the
    // client saw a closed socket with no status line at all
    val (c3, b3) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=0-4,10-20"))
    assert(c3 == 416 && json(b3).has("errorMsg"))
    val (c4, b4) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "bytes=abc-def"))
    assert(c4 == 416 && json(b4).has("errorMsg"))
    // RFC 7233 §3.1: an unknown range UNIT is ignored, not an error — the
    // server must act as if no Range header were present (200, full body)
    val (c5, b5) = get("/v1/read?path=sub/deep/c.bin",
      Map("Range" -> "lines=1-2"))
    assert(c5 == 200 && java.util.Arrays.equals(b5, expected))
  }

  test("read of a zero-byte file is 200 with an empty body") {
    val src = Files.createTempDirectory("api-empty-src").toString
    Files.write(Paths.get(src, "empty.txt"), Array.emptyByteArray)
    Files.write(Paths.get(src, "full.txt"), "x".getBytes(UTF_8))
    val repo2 = Files.createTempDirectory("api-empty-repo").toString
    SnapshotStore.publish(src, repo2, "main")
    val h = ApiServer.start(repo2, "main")
    try {
      def g(path: String, hdrs: Map[String, String] = Map.empty) = {
        val conn = URI.create(s"http://127.0.0.1:${h.port}$path").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        try {
          hdrs.foreach { case (k, v) => conn.setRequestProperty(k, v) }
          val code = conn.getResponseCode
          val in = if (code < 400) conn.getInputStream else conn.getErrorStream
          (code, if (in == null) Array.emptyByteArray
                 else try in.readAllBytes() finally in.close())
        } finally conn.disconnect()
      }
      val (c, b) = g("/v1/read?path=empty.txt")
      assert(c == 200, s"plain GET of an empty file returned $c")
      assert(b.isEmpty)
      // any byte range against a zero-byte file is unsatisfiable
      assert(g("/v1/read?path=empty.txt", Map("Range" -> "bytes=0-"))._1 == 416)
    } finally h.stop()
  }

  test("startRemote fronts a bucket label: pinned lazy reads, live cache fill") {
    val keyPair = {
      val g = java.security.KeyPairGenerator.getInstance("RSA")
      g.initialize(2048); g.generateKeyPair()
    }
    val srv = new graft.sources.FakeGcs(keyPair)
    try {
      val reg = new graft.sources.GcsRefRegistry(srv.endpoint, "bkt", "d/",
        new graft.sources.GcsAuth.TokenProvider(srv.account))
      val src = Files.createTempDirectory("api-r-src").toString
      val expected = Array.tabulate(1024 * 1024)(i => (i % 247).toByte)
      Files.write(Paths.get(src, "big.bin"), expected)
      Files.write(Paths.get(src, "small.txt"), "tiny".getBytes(UTF_8))
      val repo = Files.createTempDirectory("api-r-repo").toString
      SnapshotStore.publish(src, repo, "m")
      graft.sources.RemoteSnapshotRepo.push(repo, "m", reg, "m")

      graft.sources.PufsFileSystem.simulateRestart()
      val h = ApiServer.startRemote(reg, "m",
        Files.createTempDirectory("api-r-cache").toString)
      def rget(path: String, hdrs: Map[String, String] = Map.empty) = {
        val conn = URI.create(s"http://127.0.0.1:${h.port}$path").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        try {
          hdrs.foreach { case (k, v) => conn.setRequestProperty(k, v) }
          val code = conn.getResponseCode
          val in = if (code < 400) conn.getInputStream else conn.getErrorStream
          (code, if (in == null) Array.emptyByteArray
                 else try in.readAllBytes() finally in.close())
        } finally conn.disconnect()
      }
      try {
        // listing is served from the eagerly-resolved manifest
        val (lc, lb) = rget("/v1/dir?path=")
        assert(lc == 200)
        val names = { val e = json(lb).path("entries")
          (0 until e.size).map(e.get(_).path("name").asText).toSet }
        assert(names == Set("big.bin", "small.txt"))
        // a ranged read pulls only the covering chunks from the bucket
        val (rc, rb) = rget("/v1/read?path=big.bin",
          Map("Range" -> "bytes=300000-304999"))
        assert(rc == 206 && java.util.Arrays.equals(rb,
          java.util.Arrays.copyOfRange(expected, 300000, 305000)))
        val pulled = graft.sources.PufsFileSystem.bytesPulled.get()
        assert(pulled <= 2 * 200 * 1024, s"pulled $pulled for a 5000-byte read")
        // the proto's populated-cache fields watch the lazy mount fill
        val (sc, sb) = rget("/v1/stat?path=big.bin")
        assert(sc == 200)
        assert(json(sb).path("populatedSize").asLong == pulled)
        assert(json(sb).path("populatedRegionCount").asInt >= 1)
        // a re-read of the same range is served from the local cache
        val before = srv.requests.get()
        val (rc2, rb2) = rget("/v1/read?path=big.bin",
          Map("Range" -> "bytes=300000-304999"))
        assert(rc2 == 206 && java.util.Arrays.equals(rb2, rb))
        assert(srv.requests.get() == before, "re-read hit the bucket")
      } finally h.stop()
    } finally srv.stop()
  }

  test("the serve verb is wired into the CLI usage surface") {
    // dispatch validation only — the verb itself blocks by design
    val err = new java.io.ByteArrayOutputStream()
    val orig = System.err
    System.setErr(new java.io.PrintStream(err))
    try assert(Cli.run(List("serve")) == 1)
    finally System.setErr(orig)
    assert(new String(err.toByteArray, UTF_8).contains("serve <repo> <ref> [port]"))
  }

  test("shutdown releases the port") {
    // tested last: handle.stop() tears down the suite's server
    handle.stop()
    intercept[java.io.IOException] { get("/v1/dir?path=") }
  }
}
