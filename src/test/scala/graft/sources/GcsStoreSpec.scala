package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.SparkSpec

/** GCS-protocol store: the OAuth2 service-account flow verified the way
  * the real token endpoint verifies it — the in-process fake parses the
  * JWT assertion FROM THE RAW WIRE REQUEST, checks the RS256 signature
  * with the account's registered public key, checks aud/exp/scope, and
  * only then issues a bearer token; every storage request requires a
  * live issued token. On top of that, the RemoteStore semantics:
  * generation-match ranged reads (412 → torn read), DoesNotExist CAS
  * put, root/lease registry, delimiter listing, and composition with
  * the pufs:// chunk cache. */
class GcsStoreSpec extends SparkSpec {

  // one RSA keypair for the suite: the "service account key file"
  private val keyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }


  test("token exchange verifies the RS256 assertion from the wire") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      srv.putUnversioned("obj", "hello".getBytes(UTF_8))
      val a = GcsStore.attrs(srv.endpoint, "bkt", "obj", tokens)
      assert(a.size == 5 && a.generation > 0)
      assert(srv.tokensIssued.get() == 1)
      // cached token: a second call does not re-exchange
      GcsStore.attrs(srv.endpoint, "bkt", "obj", tokens)
      assert(srv.tokensIssued.get() == 1)
      // an assertion signed with the WRONG key is rejected at the endpoint
      val wrongKey = {
        val g = java.security.KeyPairGenerator.getInstance("RSA")
        g.initialize(2048); g.generateKeyPair()
      }
      val badTokens = new GcsAuth.TokenProvider(GcsAuth.ServiceAccount(
        "svc@test.iam.gserviceaccount.com", wrongKey.getPrivate,
        s"${srv.endpoint}/token"))
      val ex = intercept[java.io.IOException] {
        GcsStore.attrs(srv.endpoint, "bkt", "obj", badTokens)
      }
      assert(ex.getMessage.contains("401"))
    } finally srv.stop()
  }

  test("CAS put / attrs / ranged-get differential, auth-verified") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val data = new Array[Byte](100 * 1024)
      new scala.util.Random(23).nextBytes(data)
      assert(GcsStore.putIfAbsent(srv.endpoint, "bkt", "cas/x", tokens, data))
      // CAS idempotence: the DoesNotExist precondition fails quietly
      assert(!GcsStore.putIfAbsent(srv.endpoint, "bkt", "cas/x", tokens, data))
      val a = GcsStore.attrs(srv.endpoint, "bkt", "cas/x", tokens)
      assert(a.size == data.length)
      val store = new GcsStore(srv.endpoint, "bkt", "cas/x", a.generation,
        tokens, maxRetries = 2)
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

  test("generation flip under an open reader is a torn read, never retried") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val data = "stable bytes".getBytes(UTF_8)
      GcsStore.putIfAbsent(srv.endpoint, "bkt", "obj", tokens, data)
      val gen = GcsStore.attrs(srv.endpoint, "bkt", "obj", tokens).generation
      val pinned = new GcsStore(srv.endpoint, "bkt", "obj", gen, tokens,
        maxRetries = 5)
      assert(pinned.read(0, data.length).sameElements(data))
      srv.putUnversioned("obj", "different!!".getBytes(UTF_8)) // new generation
      val before = srv.requests.get()
      intercept[TornReadException] { pinned.read(0, 5) }
      assert(srv.requests.get() == before + 1, "412 must not be retried")
      // an UNPINNED reader (generation 0 — reference gcs.go:305 guard)
      // follows the replacement instead
      val unpinned = new GcsStore(srv.endpoint, "bkt", "obj", 0, tokens)
      assert(unpinned.read(0, 9).sameElements("different".getBytes(UTF_8)))
    } finally srv.stop()
  }

  test("an endpoint that ignores Range is an error, not silent wrong bytes") {
    val srv = new FakeGcs(keyPair, ignoreRange = true)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val data = (0 until 4096).map(_.toByte).toArray
      GcsStore.putIfAbsent(srv.endpoint, "bkt", "obj", tokens, data)
      val gen = GcsStore.attrs(srv.endpoint, "bkt", "obj", tokens).generation
      val store = new GcsStore(srv.endpoint, "bkt", "obj", gen, tokens)
      val ex = intercept[java.net.ProtocolException] { store.read(100, 64) }
      assert(ex.getMessage.contains("did not honor Range"))
      assert(store.read(0, 64).sameElements(data.take(64)))
    } finally srv.stop()
  }

  test("expired bearer token is re-exchanged, not a user-visible failure") {
    val srv = new FakeGcs(keyPair, tokenMaxUses = 2)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val data = new Array[Byte](64 * 1024)
      new scala.util.Random(7).nextBytes(data)
      GcsStore.putIfAbsent(srv.endpoint, "bkt", "blk", tokens, data)
      val gen = GcsStore.attrs(srv.endpoint, "bkt", "blk", tokens).generation
      val store = new GcsStore(srv.endpoint, "bkt", "blk", gen, tokens)
      (0 until 8).foreach { i => // each read burns a token use → periodic 401s
        assert(store.read(i * 1024L, 512)
          .sameElements(java.util.Arrays.copyOfRange(data, i * 1024, i * 1024 + 512)))
      }
      assert(srv.tokensIssued.get() > 1, "the 401 path must re-exchange")
    } finally srv.stop()
  }

  test("object names with slashes and spaces ride the JSON-API path encoded") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val key = "dir with space/obj+plus (1).bin"
      val data = "spaced out".getBytes(UTF_8)
      assert(GcsStore.putIfAbsent(srv.endpoint, "bkt", key, tokens, data))
      val a = GcsStore.attrs(srv.endpoint, "bkt", key, tokens)
      assert(a.size == data.length)
      val store = new GcsStore(srv.endpoint, "bkt", key, a.generation, tokens)
      assert(store.read(0, data.length).sameElements(data))
    } finally srv.stop()
  }

  test("delimiter listing yields relative child names, dirs first-class, paginated") {
    val srv = new FakeGcs(keyPair, listPageSize = 2)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      Seq("tree/a.bin", "tree/b.bin", "tree/c.bin", "tree/d.bin",
        "tree/sub/x.bin", "tree/sub2/y.bin", "other/z.bin")
        .foreach(k => srv.putUnversioned(k, k.getBytes(UTF_8)))
      val kids = GcsStore.listChildren(srv.endpoint, "bkt", "tree/", tokens)
      assert(kids.filter(_.isDir).map(_.name).sorted == Seq("sub", "sub2"))
      val files = kids.filterNot(_.isDir)
      assert(files.map(_.name).sorted == Seq("a.bin", "b.bin", "c.bin", "d.bin"),
        "pagination must not drop entries")
      assert(files.forall(f => f.size == s"tree/${f.name}".length && f.generation > 0))
    } finally srv.stop()
  }

  test("root/lease registry and CAS block push round-trip") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "depot/", tokens)
      assert(reg.getRoot("main").isEmpty)
      val bid = (0 until 32).map(_.toByte).toArray
      reg.setRoot("main", bid)
      assert(reg.getRoot("main").exists(_.sameElements(bid)))
      val bid2 = (32 until 64).map(_.toByte).toArray
      reg.setRoot("main", bid2) // roots are replace-on-write (gcs.go:114-127)
      assert(reg.getRoot("main").exists(_.sameElements(bid2)))
      reg.setLease("reader-1", 1234567890123L, bid)
      assert(reg.getLease("reader-1").exists { case (e, b) =>
        e == 1234567890123L && b.sameElements(bid) })
      // CAS block: stored once, content-addressed, pinned open
      val block = new Array[Byte](48 * 1024)
      new scala.util.Random(5).nextBytes(block)
      val hex = SigV4.sha256Hex(block)
      assert(reg.pushBlock(hex, block))
      assert(!reg.pushBlock(hex, block))
      val (key, size, gen) = reg.blockSource(hex)
      assert(key == s"depot/CAS/$hex" && size == block.length && gen > 0)
      val rd = reg.openBlock(hex)
      assert(rd.read(1000, 2000).sameElements(
        java.util.Arrays.copyOfRange(block, 1000, 3000)))
    } finally srv.stop()
  }

  test("GCS store composes with the pufs:// lazy chunk cache") {
    val srv = new FakeGcs(keyPair)
    try {
      val tokens = new GcsAuth.TokenProvider(srv.account)
      val data = new Array[Byte](256 * 1024)
      new scala.util.Random(41).nextBytes(data)
      GcsStore.putIfAbsent(srv.endpoint, "bkt", "blk", tokens, data)
      val gen = GcsStore.attrs(srv.endpoint, "bkt", "blk", tokens).generation
      val store = new GcsStore(srv.endpoint, "bkt", "blk", gen, tokens)
      PufsFileSystem.simulateRestart()
      val entry = PufsFileSystem.cacheEntry(
        java.nio.file.Files.createTempDirectory("gcs-cache").toString,
        "gcs-block", data.length)
      val in = new LazyPullInputStream(entry, store, data.length, 8192, 0)
      val buf = new Array[Byte](5000)
      in.readFully(100000L, buf, 0, 5000)
      assert(java.util.Arrays.equals(buf,
        java.util.Arrays.copyOfRange(data, 100000, 105000)))
      assert(PufsFileSystem.bytesPulled.get() <= 2 * 8192,
        s"pulled ${PufsFileSystem.bytesPulled.get()} for a 5000-byte read")
      val before = srv.requests.get()
      in.readFully(100000L, buf, 0, 5000)
      assert(srv.requests.get() == before, "re-read hit the remote")
      in.close()
    } finally srv.stop()
  }
}
