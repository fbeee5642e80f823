package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** In-process single-bucket GCS JSON-API test double with real OAuth2
  * verification from the wire: the /token endpoint parses the JWT
  * assertion from the RAW request, checks its RS256 signature against the
  * supplied keypair's public key plus aud/exp/scope, and issues bearer
  * tokens; every storage request requires a live issued token. Objects
  * carry monotonically increasing generations, media GETs honor
  * `ifGenerationMatch` (412 on mismatch) and Range, uploads honor the
  * `ifGenerationMatch=0` DoesNotExist precondition, and listing supports
  * prefix+delimiter with pagination. Shared by GcsStoreSpec (protocol
  * conformance) and RemoteSnapshotRepoSpec (push/pull integration).
  *
  * `tokenMaxUses` bounds storage requests per token before it "expires"
  * (401) — the refresh test. `listPageSize` forces listing pagination.
  * `ignoreRange` simulates a non-conforming endpoint. */
class FakeGcs(keyPair: java.security.KeyPair, verifyAuth: Boolean = true,
    ignoreRange: Boolean = false, tokenMaxUses: Int = Int.MaxValue,
    listPageSize: Int = 1000) {
  case class Obj(bytes: Array[Byte], generation: Long)
  val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()
  private val genCounter = new java.util.concurrent.atomic.AtomicLong(0)
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)
  val uploads = new java.util.concurrent.atomic.AtomicInteger(0)
  val tokensIssued = new java.util.concurrent.atomic.AtomicInteger(0)
  private val liveTokens =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def putUnversioned(key: String, bytes: Array[Byte]): Unit =
    objects.put(key, Obj(bytes, genCounter.incrementAndGet()))

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  private def query(ex: com.sun.net.httpserver.HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> decode(v)
      }.toMap

  /** Verify the RS256 assertion exactly like the real endpoint: split the
    * compact JWT, check the signature over `header.claims` with the
    * registered public key, then the claims. */
  private def verifyAssertion(assertion: String, tokenUri: String): Boolean = {
    val parts = assertion.split("\\.")
    if (parts.length != 3) return false
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initVerify(keyPair.getPublic)
    sig.update(s"${parts(0)}.${parts(1)}".getBytes(UTF_8))
    if (!sig.verify(Base64.getUrlDecoder.decode(parts(2)))) return false
    val claims = GcsStore.mapper.readTree(Base64.getUrlDecoder.decode(parts(1)))
    claims.path("aud").asText("") == tokenUri &&
      claims.path("exp").asLong(0) > System.currentTimeMillis() / 1000 &&
      claims.path("scope").asText("").contains("devstorage")
  }

  private def bearerOk(ex: com.sun.net.httpserver.HttpExchange): Boolean = {
    if (!verifyAuth) return true
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    if (auth == null || !auth.startsWith("Bearer ")) return false
    val uses = liveTokens.get(auth.stripPrefix("Bearer "))
    uses != null && uses.incrementAndGet() <= tokenMaxUses
  }

  server.createContext("/token", { (ex: com.sun.net.httpserver.HttpExchange) =>
    try {
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> decode(v)
        }.toMap
      val ok = form.get("grant_type")
        .contains("urn:ietf:params:oauth:grant-type:jwt-bearer") &&
        form.get("assertion").exists(verifyAssertion(_, s"$endpoint/token"))
      if (!ok) ex.sendResponseHeaders(401, -1)
      else {
        val tok = java.util.UUID.randomUUID().toString
        liveTokens.put(tok, new java.util.concurrent.atomic.AtomicInteger(0))
        tokensIssued.incrementAndGet()
        val body =
          s"""{"access_token":"$tok","expires_in":3600,"token_type":"Bearer"}"""
            .getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      }
    } finally ex.close()
  })

  server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
    try {
      requests.incrementAndGet()
      val raw = ex.getRequestURI.getRawPath
      val q = query(ex)
      val body = ex.getRequestBody.readAllBytes()
      if (!bearerOk(ex)) ex.sendResponseHeaders(401, -1)
      else if (raw.startsWith("/upload/storage/v1/b/bkt/o")) {
        val key = q("name")
        if (q.get("ifGenerationMatch").contains("0") && objects.containsKey(key))
          ex.sendResponseHeaders(412, -1)
        else {
          putUnversioned(key, body)
          uploads.incrementAndGet()
          val resp = metaJson(key, objects.get(key))
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
        }
      } else if (raw == "/storage/v1/b/bkt/o") { // list
        val prefix = q.getOrElse("prefix", "")
        val all = {
          import scala.jdk.CollectionConverters._
          objects.keySet.asScala.toSeq.sorted.filter(_.startsWith(prefix))
        }
        val (dirs, files) = q.get("delimiter") match {
          case Some(d) =>
            val rel = all.map(k => (k, k.substring(prefix.length)))
            val ds = rel.filter(_._2.contains(d))
              .map { case (_, r) => prefix + r.takeWhile(_.toString != d) + d }
              .distinct
            (ds, rel.filterNot(_._2.contains(d)).map(_._1))
          case None => (Nil, all)
        }
        val start = q.get("pageToken").map(_.toInt).getOrElse(0)
        val page = files.slice(start, start + listPageSize)
        val next = if (start + listPageSize < files.length)
          s""","nextPageToken":"${start + listPageSize}"""" else ""
        val items = page.map(k => new String(metaJson(k, objects.get(k)), UTF_8))
          .mkString(",")
        val prefixesJson = dirs.map(d => s""""$d"""").mkString(",")
        val resp =
          (s"""{"kind":"storage#objects","prefixes":[$prefixesJson],""" +
            s""""items":[$items]$next}""").getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
      } else if (raw.startsWith("/storage/v1/b/bkt/o/")) {
        val key = decode(raw.stripPrefix("/storage/v1/b/bkt/o/"))
        val o = objects.get(key)
        if (ex.getRequestMethod == "DELETE") {
          if (o == null) ex.sendResponseHeaders(404, -1)
          else { objects.remove(key); ex.sendResponseHeaders(204, -1) }
        }
        else if (o == null) ex.sendResponseHeaders(404, -1)
        else if (q.get("alt").contains("media")) {
          if (q.get("ifGenerationMatch").exists(_.toLong != o.generation))
            ex.sendResponseHeaders(412, -1)
          else {
            val range = if (ignoreRange) None
              else Option(ex.getRequestHeaders.getFirst("Range"))
            val (s, e) = range match {
              case Some(r) =>
                val Array(a, b) = r.stripPrefix("bytes=").split("-")
                (a.toLong, math.min(b.toLong, o.bytes.length - 1L))
              case None => (0L, o.bytes.length - 1L)
            }
            val slice = java.util.Arrays.copyOfRange(o.bytes, s.toInt, e.toInt + 1)
            ex.sendResponseHeaders(if (range.isDefined) 206 else 200, slice.length)
            ex.getResponseBody.write(slice)
          }
        } else { // metadata
          val resp = metaJson(key, o)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
        }
      } else ex.sendResponseHeaders(404, -1)
    } finally ex.close()
  })

  private def metaJson(key: String, o: Obj): Array[Byte] =
    GcsStore.mapper.writeValueAsBytes(
      GcsStore.mapper.createObjectNode()
        .put("name", key).put("bucket", "bkt")
        .put("size", o.bytes.length.toString) // int64s are JSON strings
        .put("generation", o.generation.toString)
        .put("updated", "2026-01-01T00:00:00.000Z"))

  server.start()
  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def account: GcsAuth.ServiceAccount = GcsAuth.ServiceAccount(
    "svc@test.iam.gserviceaccount.com", keyPair.getPrivate, s"$endpoint/token")
  def stop(): Unit = server.stop(0)
}
