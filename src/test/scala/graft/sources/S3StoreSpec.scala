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
    val srv = new FakeS3(creds)
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
    val srv = new FakeS3(creds, ignoreRange = true)
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
    val srv = new FakeS3(creds)
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
    val srv = new FakeS3(creds)
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
    val srv = new FakeS3(creds)
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
