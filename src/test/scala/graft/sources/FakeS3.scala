package graft.sources

/** Minimal S3-compatible single-bucket ("bkt") server with real SigV4
  * verification FROM THE WIRE: it reconstructs the canonical request
  * (method, path, the headers named in SignedHeaders, the payload hash
  * header), re-derives the signature with the shared secret, and 403s any
  * mismatch — the way the real service verifies. Shared by S3StoreSpec,
  * RemoteSnapshotRepoSpec and ApiServerSpec (the S3 analog of FakeGcs). */
class FakeS3(creds: SigV4.Credentials, verifySig: Boolean = true,
    ignoreRange: Boolean = false, listPageSize: Int = 1000) {
  case class Obj(bytes: Array[Byte], etag: String)
  val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)

  private def md5hex(b: Array[Byte]) =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  /** Query params reconstructed from the raw wire query string — part of
    * the canonical request, so list-style requests are signature-checked
    * too. */
  private def wireQuery(ex: com.sun.net.httpserver.HttpExchange): Seq[(String, String)] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.nonEmpty).map { kv =>
        val Array(k, v) = (kv.split("=", 2) ++ Array("")).take(2)
        (java.net.URLDecoder.decode(k, "UTF-8"),
          java.net.URLDecoder.decode(v, "UTF-8"))
      }

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
          ex.getRequestURI.getPath, wireQuery(ex), hdrs, payloadSha,
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
        case "GET" if key.isEmpty &&
            wireQuery(ex).exists(_._1 == "list-type") =>
          // minimal ListObjectsV2: flat keys under prefix, paginated
          val q = wireQuery(ex).toMap
          val prefix = q.getOrElse("prefix", "")
          val all = {
            import scala.jdk.CollectionConverters._
            objects.keySet.asScala.toSeq.sorted.filter(_.startsWith(prefix))
          }
          val start = q.get("continuation-token").map(_.toInt).getOrElse(0)
          val page = all.slice(start, start + listPageSize)
          val truncated = start + listPageSize < all.length
          val xml = ("<?xml version=\"1.0\"?><ListBucketResult>" +
            s"<IsTruncated>$truncated</IsTruncated>" +
            (if (truncated)
              s"<NextContinuationToken>${start + listPageSize}</NextContinuationToken>"
            else "") +
            page.map(k =>
              s"<Contents><Key>$k</Key><Size>${objects.get(k).bytes.length}</Size></Contents>")
              .mkString + "</ListBucketResult>").getBytes("UTF-8")
          ex.getResponseHeaders.set("Content-Type", "application/xml")
          ex.sendResponseHeaders(200, xml.length)
          ex.getResponseBody.write(xml)
        case "DELETE" =>
          if (objects.remove(key) == null) ex.sendResponseHeaders(404, -1)
          else ex.sendResponseHeaders(204, -1)
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
