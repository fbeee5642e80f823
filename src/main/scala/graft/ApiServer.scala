package graft

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.{BlockRegistry, LazyPullInputStream, PufsFileSystem,
  RemoteSnapshotRepo, SnapshotStore}

/** Read-only control API over a published snapshot — the serving role the
  * reference fills with its gRPC `Pufs` service (api/api.proto:26-28
  * `GetDirContents`, served from the mount daemon) so programs that are
  * not Spark jobs can browse and read a mount. gRPC needs a protobuf
  * toolchain this build intentionally does not carry; the daemon speaks
  * the same operations as plain HTTP + JSON:
  *
  *   GET /v1/dir?path=<dir>  → DirContentsResponse-shaped JSON
  *                             (api.proto:9-23: entries with name /
  *                             isDir / size / blockID / populatedSize /
  *                             populatedRegionCount, or errorMsg)
  *   GET /v1/stat?path=<p>   → one entry (404 + errorMsg if absent)
  *   GET /v1/read?path=<p>   → file bytes; honors `Range: bytes=s-e`
  *                             with a 206, like any HTTP object store
  *
  * The snapshot is content-addressed and immutable, so the manifest is
  * resolved ONCE at start and directory structure is served from memory.
  * Two backings behind the same wire surface:
  *
  *  - `start`: a local repo — bytes ride SnapshotStore.readBlockRange
  *    (never a whole-block materialization);
  *  - `startRemote`: a `BlockRegistry` label (GCS- or S3-protocol bucket)
  *    — bytes ride generation-pinned lazy readers through the pufs://
  *    chunk cache, so the daemon fronts a remote snapshot the way the
  *    reference's mount daemon fronts a bucket: first read of a region
  *    pulls its chunks, re-reads are local.
  *
  * The populated-cache fields are fed live from the pufs:// block cache
  * (api.proto:18-19), so a reader can watch a lazy mount fill. */
object ApiServer {

  private val mapper = new ObjectMapper()

  final class Handle private[ApiServer] (
      server: com.sun.net.httpserver.HttpServer,
      onStop: () => Unit = () => ()) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = { server.stop(0); onStop() }
  }

  /** Start serving `repo`@`ref` (label or manifest sha) on `port`
    * (0 = ephemeral). */
  def start(repo: String, ref: String, port: Int = 0): Handle = {
    val sha = SnapshotStore.getRoot(repo, ref).getOrElse(ref)
    val entries = SnapshotStore.mountAt(repo, sha)
    serve(entries,
      (e, start, len) => SnapshotStore.readBlockRange(repo, e.sha256, start, len),
      identity, port)
  }

  /** Start serving a REMOTE label on `port`: the manifest is resolved
    * once from the registry; file bytes are pulled chunk-on-demand into
    * `cacheDir` by pinned readers (one long-lived reader per touched
    * block, closed on stop). */
  def startRemote(reg: BlockRegistry, label: String, cacheDir: String,
      port: Int = 0): Handle = {
    val (_, entries) = RemoteSnapshotRepo.mount(reg, label)
    val readers =
      new java.util.concurrent.ConcurrentHashMap[String, LazyPullInputStream]()
    serve(entries,
      (e, start, len) => {
        val in = readers.computeIfAbsent(e.sha256,
          _ => RemoteSnapshotRepo.openFile(reg, e, cacheDir))
        val buf = new Array[Byte](len)
        in.readFully(start, buf, 0, len)
        buf
      },
      // the chunk cache registers remote blocks under "remote-<sha>"
      sha => if (sha.isEmpty) sha else s"remote-$sha",
      port,
      onStop = () => readers.values.forEach(_.close()))
  }

  private def serve(entries: Seq[SnapshotStore.ManifestEntry],
      readRange: (SnapshotStore.ManifestEntry, Long, Int) => Array[Byte],
      cacheId: String => String, port: Int,
      onStop: () => Unit = () => ()): Handle = {
    // directory view shared with GrpcServer — same manifest, two wires
    val tree = new SnapshotTree(entries)
    val bySuffix = tree.byPath
    val dirs = tree.dirs
    def childrenOf(dir: String) = tree.childrenOf(dir)

    def entryNode(name: String, isDir: Boolean, size: Long, blockId: String) = {
      val (pop, regions) =
        if (isDir) (0L, 0) else PufsFileSystem.statsForBlock(cacheId(blockId))
      mapper.createObjectNode()
        .put("name", name).put("isDir", isDir).put("size", size)
        .put("blockId", blockId)
        .put("populatedSize", pop).put("populatedRegionCount", regions)
    }

    def respondJson(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        node: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val body = mapper.writeValueAsBytes(node)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, body.length)
      ex.getResponseBody.write(body)
    }

    def error(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        msg: String): Unit =
      respondJson(ex, code, mapper.createObjectNode().put("errorMsg", msg))

    def queryPath(ex: com.sun.net.httpserver.HttpExchange): String =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
        .collectFirst { case kv if kv.startsWith("path=") =>
          java.net.URLDecoder.decode(kv.stripPrefix("path="), UTF_8) }
        .getOrElse("").stripPrefix("/").stripSuffix("/")

    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)

    server.createContext("/v1/dir", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        val p = queryPath(ex)
        if (!dirs.contains(p))
          error(ex, if (bySuffix.contains(p)) 400 else 404,
            if (bySuffix.contains(p)) s"not a directory: $p"
            else s"no such directory: $p")
        else {
          val resp = mapper.createObjectNode()
          val arr = resp.putArray("entries")
          childrenOf(p).foreach { case (n, d, s, b) => arr.add(entryNode(n, d, s, b)) }
          respondJson(ex, 200, resp)
        }
      } finally ex.close()
    })

    server.createContext("/v1/stat", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        val p = queryPath(ex)
        if (dirs.contains(p)) respondJson(ex, 200,
          entryNode(if (p.isEmpty) "." else p.split("/").last, isDir = true, 0L, ""))
        else bySuffix.get(p) match {
          case Some(e) =>
            respondJson(ex, 200, entryNode(e.path.split("/").last,
              isDir = false, e.size, e.sha256))
          case None => error(ex, 404, s"no such path: $p")
        }
      } finally ex.close()
    })

    server.createContext("/v1/read", { (ex: com.sun.net.httpserver.HttpExchange) =>
      // every outcome is an HTTP response — a malformed Range or a backend
      // read failure must surface as 416/500 JSON, never as a dropped
      // connection (the catch covers a.toLong parse throws and
      // TornReadException from a pinned remote reader alike)
      def sendBytes(e: SnapshotStore.ManifestEntry, start: Long, len: Long,
          status: Int): Unit = {
        ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
        if (len == 0) ex.sendResponseHeaders(status, -1)
        else {
          val bytes = readRange(e, start, len.toInt)
          ex.sendResponseHeaders(status, len)
          ex.getResponseBody.write(bytes)
        }
      }
      try {
        val p = queryPath(ex)
        val hdr = Option(ex.getRequestHeaders.getFirst("Range"))
        try {
          bySuffix.get(p) match {
            case None => error(ex, 404, s"no such file: $p")
            case Some(e) =>
              hdr match {
                case None =>
                  sendBytes(e, 0L, e.size, status = 200) // empty file => empty 200
                case Some(r) if !r.startsWith("bytes=") =>
                  // RFC 7233 §3.1: a range unit the server does not
                  // understand is IGNORED, not an error — serve 200 full
                  sendBytes(e, 0L, e.size, status = 200)
                case Some(r) if r.contains(',') =>
                  // multi-range unsupported (pragmatic 416: the unit IS
                  // understood, the request is just not satisfiable here)
                  error(ex, 416, s"unsupported range: $r")
                case Some(r) =>
                  // RFC 7233 single ranges: bytes=a-b, bytes=a-, bytes=-n
                  val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
                  val (start, end) =
                    if (a.isEmpty) { // suffix range: last n bytes
                      val n = b.toLong
                      (math.max(0L, e.size - n), e.size - 1)
                    } else
                      (a.toLong,
                        if (b.isEmpty) e.size - 1
                        else math.min(b.toLong, e.size - 1))
                  if (start < 0 || start > end || end >= e.size)
                    error(ex, 416, s"range $start-$end outside 0-${e.size - 1}")
                  else sendBytes(e, start, end - start + 1, status = 206)
              }
          }
        } catch {
          case _: NumberFormatException | _: MatchError =>
            error(ex, 416, s"malformed range: ${hdr.getOrElse("")}")
          case t: Exception =>
            error(ex, 500, s"read failed: ${t.getMessage}")
        }
      } finally ex.close()
    })

    server.start()
    new Handle(server, onStop)
  }
}
