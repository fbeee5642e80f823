package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** S3-protocol store: SigV4 signing verified the way the real service
  * verifies it — the in-process fake S3 reconstructs the canonical
  * request FROM THE RAW WIRE REQUEST (method, path, the headers named in
  * SignedHeaders, the payload hash header), re-derives the signature with
  * the shared secret, and 403s any mismatch. Then the RemoteStore
  * semantics on top: lazy ranged reads, ETag pinning (412 → torn read),
  * conditional create (CAS put-if-absent), and composition with the
  * pufs:// chunk cache. */
class S3StoreSpec extends SparkSpec {

  private val creds = SigV4.Credentials("AKIDTEST", "testsecretkey")
  private val region = "test-1"

  /** Minimal S3-compatible single-bucket server with real SigV4
    * verification from the wire. */
  private class FakeS3(verifySig: Boolean = true,
      ignoreRange: Boolean = false) {
    case class Obj(bytes: Array[Byte], etag: String)
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)

    private def md5hex(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString

    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)

    private def sigOk(ex: com.sun.net.httpserver.HttpExchange,
        payloadSha: String): Boolean = {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      if (auth == null) return false
      // AWS4-HMAC-SHA256 Credential=ak/date/region/s3/aws4_request,
      //   SignedHeaders=a;b;c, Signature=hex
      val credPat = ".*Credential=([^,]+),.*".r
      val shPat = ".*SignedHeaders=([^,]+),.*".r
      val sigPat = ".*Signature=([0-9a-f]+).*".r
      (auth, auth, auth) match {
        case (credPat(scope), shPat(sh), sigPat(sig)) =>
          val parts = scope.split("/") // ak, date, region, service, aws4_request
          val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
          if (amzDate == null || !amzDate.startsWith(parts(1))) return false
          // rebuild the signed headers from the WIRE
          val hdrs = sh.split(";").toSeq.map { name =>
            val v = ex.getRequestHeaders.getFirst(name)
            name -> (if (v == null) "" else v)
          }
          val expected = SigV4.authorization(ex.getRequestMethod,
            ex.getRequestURI.getPath, Nil, hdrs, payloadSha,
            parts(2), parts(3), creds, amzDate)
          val expSig = expected match { case sigPat(s) => s; case _ => "" }
          expSig == sig
        case _ => false
      }
    }

    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        requests.incrementAndGet()
        val key = ex.getRequestURI.getPath.stripPrefix("/bkt/")
        val body = ex.getRequestBody.readAllBytes()
        val payloadSha = Option(
          ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
          .getOrElse(SigV4.EmptySha)
        if (verifySig &&
            (!sigOk(ex, payloadSha) ||
              (body.nonEmpty && SigV4.sha256Hex(body) != payloadSha))) {
          ex.sendResponseHeaders(403, -1)
        } else ex.getRequestMethod match {
          case "PUT" =>
            val ifNone = ex.getRequestHeaders.getFirst("If-None-Match")
            if (ifNone == "*" && objects.containsKey(key))
              ex.sendResponseHeaders(412, -1)
            else {
              objects.put(key, Obj(body, "\"" + md5hex(body) + "\""))
              ex.sendResponseHeaders(200, -1)
            }
          case "HEAD" =>
            val o = objects.get(key)
            if (o == null) ex.sendResponseHeaders(404, -1)
            else {
              ex.getResponseHeaders.set("ETag", o.etag)
              ex.getResponseHeaders.set("Content-Length", o.bytes.length.toString)
              ex.sendResponseHeaders(200, -1)
            }
          case "GET" =>
            val o = objects.get(key)
            if (o == null) ex.sendResponseHeaders(404, -1)
            else {
              val ifMatch = ex.getRequestHeaders.getFirst("If-Match")
              if (ifMatch != null && ifMatch != o.etag)
                ex.sendResponseHeaders(412, -1)
              else {
                val range =
                  if (ignoreRange) None
                  else Option(ex.getRequestHeaders.getFirst("Range"))
                val (s, e) = range match {
                  case Some(r) =>
                    val Array(a, b) = r.stripPrefix("bytes=").split("-")
                    (a.toLong, math.min(b.toLong, o.bytes.length - 1L))
                  case None => (0L, o.bytes.length - 1L)
                }
                val slice = java.util.Arrays.copyOfRange(
                  o.bytes, s.toInt, e.toInt + 1)
                ex.getResponseHeaders.set("ETag", o.etag)
                ex.sendResponseHeaders(if (range.isDefined) 206 else 200,
                  slice.length)
                ex.getResponseBody.write(slice)
              }
            }
          case _ => ex.sendResponseHeaders(405, -1)
        }
      } finally ex.close()
    })
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("SigV4 differential vs an independent implementation (python)") {
    // the same algorithm implemented twice from the public spec in two
    // languages — catches transcription bugs in either. Skipped if no
    // python3 (the signer is still covered end-to-end by the wire tests).
    val py =
      """import hashlib, hmac, sys
        |def h(k, d): return hmac.new(k, d.encode(), hashlib.sha256).digest()
        |method, path, ak, sk, region, svc, amzdate, payload = sys.argv[1:9]
        |hdrs = sorted((x.split('=',1) for x in sys.argv[9].split(',')), key=lambda p: p[0])
        |canon = '\n'.join([method, path, '', ''.join(f'{k}:{v}\n' for k,v in hdrs),
        |                   ';'.join(k for k,_ in hdrs), payload])
        |date = amzdate[:8]
        |scope = f'{date}/{region}/{svc}/aws4_request'
        |sts = '\n'.join(['AWS4-HMAC-SHA256', amzdate, scope,
        |                 hashlib.sha256(canon.encode()).hexdigest()])
        |key = h(h(h(h(('AWS4'+sk).encode(), date), region), svc), 'aws4_request')
        |print(hmac.new(key, sts.encode(), hashlib.sha256).hexdigest())
        |""".stripMargin
    val pyFile = java.nio.file.Files.createTempFile("sigv4", ".py")
    java.nio.file.Files.write(pyFile, py.getBytes(UTF_8))
    val have = try {
      new ProcessBuilder("python3", "--version").start().waitFor() == 0
    } catch { case _: Throwable => false }
    assume(have, "python3 not available")
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { i =>
      val amzDate = f"2026021${i}T10203${i}Z"
      val hdrs = Seq("host" -> s"h$i.example:90$i",
        "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> SigV4.EmptySha,
        "range" -> s"bytes=${rnd.nextInt(100)}-${100 + rnd.nextInt(100)}")
      val path = s"/bkt/obj-$i.bin"
      val auth = SigV4.authorization("GET", path, Nil, hdrs, SigV4.EmptySha,
        "us-test-1", "s3", creds, amzDate)
      val sigPat = ".*Signature=([0-9a-f]+).*".r
      val scalaSig = auth match { case sigPat(s) => s; case _ => "" }
      val pb = new ProcessBuilder("python3", pyFile.toString, "GET", path,
        creds.accessKey, creds.secretKey, "us-test-1", "s3", amzDate,
        SigV4.EmptySha, hdrs.map { case (k, v) => s"$k=$v" }.mkString(","))
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), UTF_8).trim
      proc.waitFor()
      assert(out == scalaSig, s"request $i: python=$out scala=$scalaSig")
    }
  }

  test("put-if-absent / head / ranged get round trip, signature-verified") {
    val srv = new FakeS3()
    try {
      val data = new Array[Byte](100 * 1024)
      new scala.util.Random(23).nextBytes(data)
      assert(S3Store.putIfAbsent(srv.endpoint, "bkt", "cas/x", region, creds, data))
      // CAS idempotence: second conditional put is a no-op 'false'
      assert(!S3Store.putIfAbsent(srv.endpoint, "bkt", "cas/x", region, creds, data))
      val (size, etag) = S3Store.head(srv.endpoint, "bkt", "cas/x", region, creds)
      assert(size == data.length && etag.isDefined)
      val store = new S3Store(srv.endpoint, "bkt", "cas/x", region, creds,
        etag, maxRetries = 2)
      val rnd = new scala.util.Random(99)
      (1 to 40).foreach { i =>
        val off = rnd.nextInt(data.length)
        val n = math.min(1 + rnd.nextInt(16 * 1024), data.length - off)
        assert(java.util.Arrays.equals(store.read(off, n),
          java.util.Arrays.copyOfRange(data, off, off + n)),
          s"differential mismatch at read $i off=$off len=$n")
      }
    } finally srv.stop()
  }

  test("an endpoint that ignores Range is an error, not silent wrong bytes") {
    // a 200 body always starts at offset 0; reading it as if it were the
    // requested range would hand back the wrong region of the object
    val srv = new FakeS3(ignoreRange = true)
    try {
      val data = (0 until 4096).map(_.toByte).toArray
      S3Store.putIfAbsent(srv.endpoint, "bkt", "obj", region, creds, data)
      val (_, etag) = S3Store.head(srv.endpoint, "bkt", "obj", region, creds)
      val store = new S3Store(srv.endpoint, "bkt", "obj", region, creds, etag)
      val ex = intercept[java.net.ProtocolException] { store.read(100, 64) }
      assert(ex.getMessage.contains("did not honor Range"))
      // start == 0 with a full-object 200 is still a correct read
      assert(store.read(0, 64).sameElements(data.take(64)))
    } finally srv.stop()
  }

  test("keys needing URI encoding sign and round-trip") {
    val srv = new FakeS3()
    try {
      val data = "spaced out".getBytes(UTF_8)
      val key = "dir with space/obj+plus (1).bin"
      assert(S3Store.putIfAbsent(srv.endpoint, "bkt", key, region, creds, data))
      val (size, etag) = S3Store.head(srv.endpoint, "bkt", key, region, creds)
      assert(size == data.length)
      val store = new S3Store(srv.endpoint, "bkt", key, region, creds, etag)
      assert(store.read(0, data.length).sameElements(data))
    } finally srv.stop()
  }

  test("ETag flip under an open reader is a torn read; bad creds are 403") {
    val srv = new FakeS3()
    try {
      val data = "stable bytes".getBytes(UTF_8)
      S3Store.putIfAbsent(srv.endpoint, "bkt", "obj", region, creds, data)
      val (_, etag) = S3Store.head(srv.endpoint, "bkt", "obj", region, creds)
      val pinned = new S3Store(srv.endpoint, "bkt", "obj", region, creds,
        etag, maxRetries = 1)
      assert(pinned.read(0, data.length).sameElements(data))
      // replace the object (unconditional put) — the pin must now fail
      srv.objects.put("obj", srv.Obj("different!!".getBytes(UTF_8), "\"v2\""))
      intercept[TornReadException] { pinned.read(0, 5) }
      // wrong secret → server-side 403, surfaces as IOException (and NOT
      // a torn read), after the bounded retry budget
      val bad = new S3Store(srv.endpoint, "bkt", "obj", region,
        SigV4.Credentials("AKIDTEST", "wrongsecret"), None, maxRetries = 1)
      val ex = intercept[java.io.IOException] { bad.read(0, 5) }
      assert(!ex.isInstanceOf[TornReadException])
    } finally srv.stop()
  }

  test("S3 store composes with the pufs:// lazy chunk cache") {
    val srv = new FakeS3()
    try {
      val data = new Array[Byte](256 * 1024)
      new scala.util.Random(41).nextBytes(data)
      S3Store.putIfAbsent(srv.endpoint, "bkt", "blk", region, creds, data)
      val (_, etag) = S3Store.head(srv.endpoint, "bkt", "blk", region, creds)
      val store = new S3Store(srv.endpoint, "bkt", "blk", region, creds, etag)
      PufsFileSystem.simulateRestart()
      val entry = PufsFileSystem.cacheEntry(
        java.nio.file.Files.createTempDirectory("s3-cache").toString,
        "s3-block", data.length)
      val in = new LazyPullInputStream(entry, store, data.length, 8192, 0)
      val buf = new Array[Byte](5000)
      in.readFully(100000L, buf, 0, 5000)
      assert(java.util.Arrays.equals(buf,
        java.util.Arrays.copyOfRange(data, 100000, 105000)))
      // laziness: only the chunks covering the request were pulled
      assert(PufsFileSystem.bytesPulled.get() <= 2 * 8192,
        s"pulled ${PufsFileSystem.bytesPulled.get()} for a 5000-byte read")
      // cache hit: a re-read issues no further S3 requests
      val before = srv.requests.get()
      in.readFully(100000L, buf, 0, 5000)
      assert(srv.requests.get() == before, "re-read hit the remote")
      in.close()
    } finally srv.stop()
  }
}
