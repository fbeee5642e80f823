package graft

import java.io.ByteArrayOutputStream

import scala.collection.mutable

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter,
  ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.epoll.{Epoll, EpollIoHandler, EpollServerDomainSocketChannel}
import io.netty.channel.unix.DomainSocketAddress
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers,
  DefaultHttp2HeadersFrame, DefaultHttp2ResetFrame, Http2DataFrame, Http2Error,
  Http2FrameCodecBuilder, Http2FrameStream, Http2HeadersFrame, Http2ResetFrame}
import io.netty.util.ReferenceCountUtil

import graft.sources.{PufsFileSystem, SnapshotStore}

/** The reference's actual wire: `Pufs.GetDirContents` served as REAL
  * gRPC — HTTP/2 over a unix domain socket — matching
  * pufs/cmd/mount.go:354–381 (gRPC server on a unix socket next to the
  * mount) and api/api.proto:26–28 (the unary `Pufs` service).
  *
  * Rounds 1–10 called this environment-blocked ("no grpc/protobuf under
  * /opt/spark/jars"). The blocked part was only the *generated-stub
  * toolchain*: the wire itself is public spec, and Spark's own classpath
  * carries Netty's complete HTTP/2 codec (netty-codec-http2: framing,
  * HPACK, flow control, settings/ping handling) plus the epoll native
  * transport for unix domain sockets. This server composes exactly the
  * layers grpc-netty composes in production:
  *
  *   unix socket (EpollServerDomainSocketChannel)
  *     → Http2FrameCodec (h2c server preface/SETTINGS/HPACK — Netty's)
  *       → this handler: the gRPC protocol
  *           request  DATA  = 1-byte compressed flag (0) | u32-BE length
  *                            | DirContentsRequest protobuf
  *           response HEADERS(:status 200, content-type application/grpc)
  *                    DATA(framed DirContentsResponse)
  *                    trailers HEADERS(grpc-status, END_STREAM)
  *           unknown method → trailers-only grpc-status 12 UNIMPLEMENTED
  *           malformed frame/body → grpc-status 3 INVALID_ARGUMENT
  *         and [[PufsProto]]: the api.proto messages, hand-encoded.
  *
  * Any stock gRPC client (grpc-go with a unix-socket dialer, like the
  * reference's own tooling) can call this; GrpcServerSpec drives it with
  * Netty's *client* h2 stack — an independent HTTP/2 implementation end
  * (different codepath: client preface, stream bootstrap, its own HPACK
  * encoder) — plus raw-frame assertions on the gRPC message framing.
  *
  * Semantics match [[ApiServer]]'s `/v1/dir` (one [[SnapshotTree]]
  * serves both wires): entries carry name/isDir/size/blockID plus live
  * populated-cache stats (api.proto:18–19); `ID` is a stable 63-bit
  * xxh-style hash of the child path (the Go server exposes runtime inode
  * numbers — a content-derived id is the honest equivalent for a frozen
  * snapshot, and stable across restarts); `isDirty` is always false
  * (published snapshots are immutable) and `modTimeSeconds` 0 (the
  * manifest carries no mtimes). Missing dir → in-message `errorMsg`
  * with grpc-status 0, the reference's own app-level error contract
  * (api.proto:23). */
object GrpcServer {

  val MethodPath = "/api.Pufs/GetDirContents"
  private val DefaultMaxBody = 4 << 20

  /** Live StreamState count across all connections — a test hook that
    * lets GrpcServerSpec pin the no-leak property (RST_STREAM and
    * connection teardown must return this to its baseline). */
  private[graft] val openStreamStates = new java.util.concurrent.atomic.AtomicInteger

  /** Late frames ignored on finished/reset streams — a test hook for the
    * no-double-response property (a client's in-flight trailers crossing
    * the server's RST must be dropped, not re-tracked and re-answered). */
  private[graft] val lateFramesIgnored = new java.util.concurrent.atomic.AtomicInteger

  def available: Boolean = Epoll.isAvailable

  final class Handle private[GrpcServer] (val socketPath: String,
      ch: Channel, group: MultiThreadIoEventLoopGroup) {
    def stop(): Unit = {
      ch.close().syncUninterruptibly()
      group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
        .syncUninterruptibly()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(socketPath))
    }
  }

  /** Serve `repo`@`ref` (label or manifest sha) on a fresh unix socket. */
  def start(repo: String, ref: String, socketPath: String): Handle = {
    val sha = SnapshotStore.getRoot(repo, ref).getOrElse(ref)
    serve(new SnapshotTree(SnapshotStore.mountAt(repo, sha)), socketPath)
  }

  /** The raw per-connection handler, for EmbeddedChannel-level tests of
    * frame-ordering corners (late frames on closed streams) that a
    * conformant codec end would filter before they reach the wire. */
  private[graft] def handlerForTest(tree: SnapshotTree,
      maxBody: Int = DefaultMaxBody): ChannelInboundHandlerAdapter =
    new RpcHandler(tree, maxBody)

  private[graft] def serve(tree: SnapshotTree, socketPath: String,
      maxBody: Int = DefaultMaxBody): Handle = {
    require(Epoll.isAvailable, "epoll native transport unavailable: " +
      (if (Epoll.unavailabilityCause == null) "?" else Epoll.unavailabilityCause.toString))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(socketPath))
    val group = new MultiThreadIoEventLoopGroup(1, EpollIoHandler.newFactory())
    try {
      val ch = new ServerBootstrap()
        .group(group)
        .channel(classOf[EpollServerDomainSocketChannel])
        .childHandler(new ChannelInitializer[Channel] {
          override def initChannel(c: Channel): Unit =
            c.pipeline().addLast(
              Http2FrameCodecBuilder.forServer().build(),
              new RpcHandler(tree, maxBody))
        })
        .bind(new DomainSocketAddress(socketPath)).sync().channel()
      new Handle(socketPath, ch, group)
    } catch {
      case t: Throwable =>
        group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
        throw t
    }
  }

  /** Stable 63-bit FNV-1a of the child path — the Entry.ID field. */
  private[graft] def entryId(path: String): Long = {
    var h = 0xcbf29ce484222325L
    path.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    h & Long.MaxValue
  }

  private[graft] def dirContents(tree: SnapshotTree,
      rawPath: String): PufsProto.DirContentsResponse = {
    val p = rawPath.stripPrefix("/").stripSuffix("/")
    if (!tree.dirs.contains(p))
      PufsProto.DirContentsResponse(errorMsg =
        if (tree.byPath.contains(p)) s"not a directory: $p"
        else s"no such directory: $p")
    else PufsProto.DirContentsResponse(entries =
      tree.childrenOf(p).map { case (name, isDir, size, blockSha) =>
        val (pop, regions) =
          if (isDir) (0L, 0) else PufsFileSystem.statsForBlock(blockSha)
        PufsProto.Entry(
          id = entryId(if (p.isEmpty) name else s"$p/$name"),
          name = name, isDirty = false, isDir = isDir, size = size,
          modTimeSeconds = 0L,
          blockId = if (blockSha.isEmpty) Array.emptyByteArray
            else blockSha.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
          populatedRegionCount = regions, populatedSize = pop)
      })
  }

  /** gRPC length-prefixed message framing (flag | u32-BE | payload). */
  private[graft] def frameMessage(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(1) = (msg.length >>> 24).toByte; out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte; out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  private[graft] def unframeMessage(body: Array[Byte]): Array[Byte] = {
    require(body.length >= 5, s"gRPC frame too short: ${body.length}")
    require(body(0) == 0, "compressed gRPC messages unsupported")
    val n = ((body(1) & 0xff) << 24) | ((body(2) & 0xff) << 16) |
      ((body(3) & 0xff) << 8) | (body(4) & 0xff)
    require(n == body.length - 5, s"gRPC frame length $n != ${body.length - 5}")
    java.util.Arrays.copyOfRange(body, 5, body.length)
  }

  private final class RpcHandler(tree: SnapshotTree, maxBody: Int)
      extends ChannelInboundHandlerAdapter {

    private final class StreamState(val path: String) {
      val body = new ByteArrayOutputStream()
    }
    private val streams = mutable.Map[Int, StreamState]()
    // Highest stream id ever tracked on this connection. RFC 7540 §5.1.1:
    // a peer's new streams use strictly increasing ids, so a HEADERS for
    // id ≤ maxSeenId that is no longer in `streams` is a LATE frame on a
    // stream this server already finished or reset (e.g. the client's
    // in-flight trailers after an oversize RST(CANCEL), or a duplicate
    // END_STREAM HEADERS after a normal finish) — it must be ignored,
    // not re-tracked as a fresh path="" stream and answered a second
    // time on a stream the codec considers closed. O(1) state, no id set.
    private var maxSeenId = 0

    private def track(id: Int, st: StreamState): Unit = {
      if (id > maxSeenId) maxSeenId = id
      // increment only on a genuinely new stream: a duplicate HEADERS on
      // a live id must not double-count (the no-leak counter would never
      // return to baseline) nor silently discard the buffered body
      if (streams.put(id, st).isEmpty) openStreamStates.incrementAndGet()
    }
    private def drop(id: Int): Option[StreamState] = {
      val removed = streams.remove(id)
      if (removed.isDefined) openStreamStates.decrementAndGet()
      removed
    }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          streams.get(h.stream.id) match {
            case Some(existing) =>
              // a second HEADERS on a live stream is the client's
              // trailers (HTTP/2 allows them): keep the existing state —
              // replacing it would drop the buffered body — and treat
              // END_STREAM as the request's end
              if (h.isEndStream) finish(ctx, h.stream, existing)
            case None =>
              // late frame for a finished/reset stream (see maxSeenId) —
              // ignore rather than re-track and double-respond
              if (h.stream.id > maxSeenId) {
                val st = new StreamState(
                  Option(h.headers.path).map(_.toString).getOrElse(""))
                track(h.stream.id, st)
                if (h.isEndStream) finish(ctx, h.stream, st)
              } else lateFramesIgnored.incrementAndGet()
          }
        case d: Http2DataFrame =>
          try {
            streams.get(d.stream.id).foreach { st =>
              if (st.body.size() + d.content.readableBytes() > maxBody) {
                // Oversized message: answer RESOURCE_EXHAUSTED (8, the
                // spec status for message-size limits) and drop the
                // stream state NOW, not a confusing length-mismatch at
                // finish() after buffering the rest anyway.
                drop(d.stream.id)
                trailersOnly(ctx, d.stream, 8,
                  s"message exceeds max size $maxBody")
                // RST(CANCEL) after the trailers: without it a client
                // mid-way through a multi-MB body keeps streaming DATA
                // into the discarded stream until its own END_STREAM —
                // wasted transfer and a held flow-control window. Only
                // when the client hasn't already half-closed: RSTing a
                // fully-closed stream is a codec error, and there is
                // nothing left to stop anyway.
                if (!d.isEndStream)
                  ctx.writeAndFlush(new DefaultHttp2ResetFrame(
                    Http2Error.CANCEL).stream(d.stream))
              } else {
                d.content.readBytes(st.body, d.content.readableBytes())
                if (d.isEndStream) finish(ctx, d.stream, st)
              }
            }
          } finally d.release()
        case r: Http2ResetFrame =>
          // Client RST_STREAM mid-request: free the buffered state —
          // without this a headers-then-reset client leaks its
          // StreamState for the connection's lifetime.
          drop(r.stream.id)
        case other =>
          // SETTINGS/PING etc. are handled inside Http2FrameCodec; release
          // whatever still reaches us and move on
          ReferenceCountUtil.release(other)
      }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      // connection gone: drop all half-received streams
      streams.keys.toVector.foreach(drop)
      ctx.fireChannelInactive()
    }

    private def finish(ctx: ChannelHandlerContext, stream: Http2FrameStream,
        st: StreamState): Unit = {
      drop(stream.id)
      if (st.path != MethodPath) { trailersOnly(ctx, stream, 12,
        s"unknown method: ${st.path}"); return }
      val resp =
        try {
          val req = PufsProto.decodeRequest(unframeMessage(st.body.toByteArray))
          Some(dirContents(tree, req.path))
        } catch { case e: Exception =>
          trailersOnly(ctx, stream, 3, s"bad request: ${e.getMessage}"); None
        }
      resp.foreach { r =>
        val headers = new DefaultHttp2Headers()
          .status("200")
        headers.set("content-type", "application/grpc")
        ctx.write(new DefaultHttp2HeadersFrame(headers).stream(stream))
        ctx.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(frameMessage(PufsProto.encodeResponse(r))))
          .stream(stream))
        val trailers = new DefaultHttp2Headers()
        trailers.set("grpc-status", "0")
        ctx.write(new DefaultHttp2HeadersFrame(trailers, true).stream(stream))
        ctx.flush()
      }
    }

    /** gRPC trailers-only error response (status in the initial HEADERS,
      * END_STREAM set, no body) — the spec's shape for RPC-layer errors. */
    private def trailersOnly(ctx: ChannelHandlerContext,
        stream: Http2FrameStream, grpcStatus: Int, msg: String): Unit = {
      val h = new DefaultHttp2Headers().status("200")
      h.set("content-type", "application/grpc")
      h.set("grpc-status", grpcStatus.toString)
      // gRPC requires percent-encoding; URLEncoder is form-encoding
      // (space -> '+'), which stock clients would render literally.
      h.set("grpc-message",
        java.net.URLEncoder.encode(msg, "UTF-8").replace("+", "%20"))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(h, true).stream(stream))
    }
  }
}
