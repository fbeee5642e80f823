package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter,
  ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.epoll.{EpollDomainSocketChannel, EpollIoHandler}
import io.netty.channel.unix.DomainSocketAddress
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers,
  DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2Headers,
  Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** Drives [[GrpcServer]] over the real wire with Netty's CLIENT HTTP/2
  * stack — an independent h2 endpoint (its own preface, SETTINGS, HPACK
  * encoder, stream accounting), so a server framing bug fails here the
  * way it would against any stock gRPC client — plus golden-byte pins on
  * the hand-rolled proto3 codec. */
class GrpcServerSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // --------------------------------------------------- proto3 golden bytes

  test("proto3: request encodes to the spec bytes (tag 0x0a = field 1 LEN)") {
    assert(PufsProto.encodeRequest(PufsProto.DirContentsRequest("sub"))
      .sameElements(b(0x0a, 0x03, 's', 'u', 'b')))
    assert(PufsProto.encodeRequest(PufsProto.DirContentsRequest(""))
      .sameElements(Array.emptyByteArray)) // proto3 default elided
    assert(PufsProto.decodeRequest(b(0x0a, 0x01, 'x')).path == "x")
    assert(PufsProto.decodeRequest(Array.emptyByteArray).path == "")
  }

  test("proto3: entry encodes per wire spec — defaults elided, varint fields tagged") {
    val e = PufsProto.Entry(id = 1, name = "a", isDir = true, size = 5)
    // 08 01 | 12 01 'a' | 20 01 | 28 05  (fields 1,2,4,5; 3/6/7/8/9 at default)
    assert(PufsProto.encodeEntry(e)
      .sameElements(b(0x08, 0x01, 0x12, 0x01, 'a', 0x20, 0x01, 0x28, 0x05)))
    // negative int64 sign-extends to the full 10-byte varint
    assert(PufsProto.encodeEntry(PufsProto.Entry(id = -1)).sameElements(
      b(0x08, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01)))
    // response nests entries under field 10 (tag 0x52), errorMsg field 11 (0x5a)
    val r = PufsProto.DirContentsResponse(entries = Seq(e))
    val enc = PufsProto.encodeResponse(r)
    assert(enc(0) == 0x52.toByte && enc(1) == 9.toByte)
    assert(PufsProto.encodeResponse(PufsProto.DirContentsResponse(errorMsg = "no"))
      .sameElements(b(0x5a, 0x02, 'n', 'o')))
  }

  test("proto3: round-trip including unicode, zeros, large varints, unknown-field skip") {
    val entries = Seq(
      PufsProto.Entry(),
      PufsProto.Entry(id = Long.MaxValue, name = "héllo→world", isDirty = true,
        size = 1L << 40, modTimeSeconds = 1700000000L,
        blockId = Array.tabulate(32)(_.toByte), populatedRegionCount = 300,
        populatedSize = 123456789L),
      PufsProto.Entry(id = -42, name = "", isDir = true))
    val rt = PufsProto.decodeResponse(
      PufsProto.encodeResponse(PufsProto.DirContentsResponse(entries, "oops")))
    assert(rt.errorMsg == "oops" && rt.entries.size == 3)
    assert(rt.entries(1).name == "héllo→world" &&
      rt.entries(1).size == (1L << 40) &&
      rt.entries(1).blockId.sameElements(Array.tabulate(32)(_.toByte)) &&
      rt.entries(1).populatedRegionCount == 300)
    assert(rt.entries(2).id == -42 && rt.entries(2).isDir)
    // forward compat: an unknown varint field (15) and LEN field (20) are skipped
    val withUnknown = PufsProto.encodeRequest(PufsProto.DirContentsRequest("p")) ++
      b(15 << 3 | 0, 0x7f) ++ b(20 << 3 | 2, 0x02, 0x00, 0x01)
    assert(PufsProto.decodeRequest(withUnknown).path == "p")
  }

  test("proto3: a 64-bit LEN (2^32+5) is rejected, not truncated to its low bits") {
    // varint(4294967301) = 85 80 80 80 10; naive .toInt would read it as 5
    val evil = b(0x0a, 0x85, 0x80, 0x80, 0x80, 0x10) ++ "hello".getBytes(UTF_8)
    intercept[IllegalArgumentException](PufsProto.decodeRequest(evil))
  }

  test("gRPC message framing: flag 0 + u32-BE length, strict on mismatch") {
    val msg = "payload".getBytes(UTF_8)
    val framed = GrpcServer.frameMessage(msg)
    assert(framed.length == 12 && framed(0) == 0 && framed(4) == 7)
    assert(GrpcServer.unframeMessage(framed).sameElements(msg))
    intercept[IllegalArgumentException](GrpcServer.unframeMessage(framed.dropRight(1)))
    intercept[IllegalArgumentException](
      GrpcServer.unframeMessage(b(1, 0, 0, 0, 0))) // compressed flag
  }

  // --------------------------------------------------------- wire fixture

  private lazy val fixture: (String, GrpcServer.Handle) = {
    val src = Files.createTempDirectory("grpc-src").toString
    Files.createDirectories(Paths.get(src, "sub/deep"))
    Files.write(Paths.get(src, "a.txt"), "alpha".getBytes(UTF_8))
    Files.write(Paths.get(src, "sub/b.txt"), "beta-bytes".getBytes(UTF_8))
    Files.write(Paths.get(src, "sub/deep/c.bin"),
      Array.tabulate(5000)(i => (i % 251).toByte))
    val repo = Files.createTempDirectory("grpc-repo").toString
    SnapshotStore.publish(src, repo, "main")
    val sock = Files.createTempDirectory("grpc-sock").resolve("api.sock").toString
    (repo, GrpcServer.start(repo, "main", sock))
  }

  private def connect(socketPath: String): (Channel, MultiThreadIoEventLoopGroup) = {
    val group = new MultiThreadIoEventLoopGroup(1, EpollIoHandler.newFactory())
    val ch = new Bootstrap()
      .group(group).channel(classOf[EpollDomainSocketChannel])
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(c: Channel): Unit = c.pipeline().addLast(
          Http2FrameCodecBuilder.forClient().build(),
          new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
      })
      .connect(new DomainSocketAddress(socketPath)).sync().channel()
    (ch, group)
  }

  /** One shared connection across tests — consecutive streams over the
    * same HPACK contexts, like a long-lived client. */
  private lazy val client: (Channel, MultiThreadIoEventLoopGroup) =
    connect(fixture._2.socketPath)

  private case class RpcResult(headers: Http2Headers, body: Array[Byte],
      trailers: Option[Http2Headers])

  private def call(methodPath: String, body: Array[Byte]): RpcResult =
    callOn(client._1, methodPath, body)

  private def callOn(conn: Channel, methodPath: String,
      body: Array[Byte]): RpcResult = {
    val done = new CompletableFuture[RpcResult]()
    val sb = new Http2StreamChannelBootstrap(conn)
    sb.handler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit =
        c.pipeline().addLast(new ChannelInboundHandlerAdapter {
          private val data = new ByteArrayOutputStream()
          private var headers: Http2Headers = _
          private var trailers: Http2Headers = _
          override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
            msg match {
              case h: Http2HeadersFrame =>
                if (headers == null) headers = h.headers else trailers = h.headers
                if (h.isEndStream) finish()
              case d: Http2DataFrame =>
                val end = d.isEndStream
                try d.content.readBytes(data, d.content.readableBytes())
                finally d.release()
                if (end) finish()
              case other => io.netty.util.ReferenceCountUtil.release(other)
            }
          private def finish(): Unit = done.complete(
            RpcResult(headers, data.toByteArray, Option(trailers)))
          override def exceptionCaught(ctx: ChannelHandlerContext, t: Throwable): Unit =
            done.completeExceptionally(t)
        })
    })
    val stream = sb.open().sync().getNow
    val hdrs = new DefaultHttp2Headers()
      .method("POST").scheme("http").path(methodPath).authority("localhost")
    hdrs.set("content-type", "application/grpc")
    hdrs.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(hdrs))
    stream.writeAndFlush(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(body), true))
    done.get(20, TimeUnit.SECONDS)
  }

  private def getDir(path: String): PufsProto.DirContentsResponse = {
    val res = call(GrpcServer.MethodPath, GrpcServer.frameMessage(
      PufsProto.encodeRequest(PufsProto.DirContentsRequest(path))))
    assert(res.headers.status.toString == "200")
    assert(res.headers.get("content-type").toString == "application/grpc")
    assert(res.trailers.exists(_.get("grpc-status").toString == "0"),
      s"expected OK trailers, got ${res.trailers}")
    PufsProto.decodeResponse(GrpcServer.unframeMessage(res.body))
  }

  test("GetDirContents over the unix socket: root and nested listings") {
    assume(GrpcServer.available, "epoll transport required")
    val root = getDir("")
    val byName = root.entries.map(e => e.name -> e).toMap
    assert(byName.keySet == Set("a.txt", "sub"))
    assert(byName("sub").isDir && !byName("a.txt").isDir && !byName("a.txt").isDirty)
    assert(byName("a.txt").size == 5)
    assert(new String(byName("a.txt").blockId, "US-ASCII").length == 64) // sha256 hex
    assert(byName("a.txt").id > 0 &&
      byName("a.txt").id == GrpcServer.entryId("a.txt")) // stable content-derived ID
    val sub = getDir("sub")
    assert(sub.entries.map(_.name).toSet == Set("b.txt", "deep"))
    val deep = getDir("sub/deep")
    assert(deep.entries.map(e => (e.name, e.size)) == Seq(("c.bin", 5000L)))
  }

  test("app-level errors ride errorMsg with grpc-status 0, per api.proto:23") {
    assume(GrpcServer.available, "epoll transport required")
    assert(getDir("a.txt").errorMsg.contains("not a directory"))
    assert(getDir("ghost").errorMsg.contains("no such directory"))
    assert(getDir("ghost").entries.isEmpty)
  }

  test("unknown method is a trailers-only UNIMPLEMENTED response") {
    assume(GrpcServer.available, "epoll transport required")
    val res = call("/api.Pufs/NoSuchMethod", GrpcServer.frameMessage(Array[Byte]()))
    assert(res.trailers.isEmpty, "trailers-only: status rides the initial HEADERS")
    assert(res.headers.get("grpc-status").toString == "12")
    assert(res.body.isEmpty)
  }

  test("malformed gRPC frame is INVALID_ARGUMENT, not a dropped connection") {
    assume(GrpcServer.available, "epoll transport required")
    val res = call(GrpcServer.MethodPath, b(0, 0, 0, 0, 99)) // length lies
    assert(res.headers.get("grpc-status").toString == "3")
    // and the connection is still serviceable afterwards
    assert(getDir("sub").entries.nonEmpty)
  }

  test("many sequential streams on one connection stay consistent") {
    assume(GrpcServer.available, "epoll transport required")
    val first = getDir("").entries.map(_.name)
    (1 to 20).foreach(_ => assert(getDir("").entries.map(_.name) == first))
  }

  test("concurrent streams on one connection are independently answered") {
    assume(GrpcServer.available, "epoll transport required")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val expected = getDir("sub").entries.map(_.name).toSet
    val all = Await.result(
      Future.sequence((1 to 8).map(_ => Future(getDir("sub")))), 30.seconds)
    all.foreach(r => assert(r.entries.map(_.name).toSet == expected))
  }

  test("grpc-message is percent-encoded (space = %20, never form-encoded '+')") {
    assume(GrpcServer.available, "epoll transport required")
    val res = call("/api.Pufs/NoSuchMethod", GrpcServer.frameMessage(Array[Byte]()))
    val msg = res.headers.get("grpc-message").toString
    assert(msg.contains("%20"), s"expected %20-encoded spaces in '$msg'")
    assert(!msg.contains("+"), s"form-encoding leaked into '$msg'")
  }

  private def awaitUntil(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
      Thread.sleep(10)
    }
  }

  test("client RST_STREAM mid-request frees the server's stream state") {
    assume(GrpcServer.available, "epoll transport required")
    val baseline = GrpcServer.openStreamStates.get()
    val sb = new Http2StreamChannelBootstrap(client._1)
    sb.handler(new ChannelInboundHandlerAdapter())
    val stream = sb.open().sync().getNow
    val hdrs = new DefaultHttp2Headers()
      .method("POST").scheme("http").path(GrpcServer.MethodPath).authority("localhost")
    hdrs.set("content-type", "application/grpc")
    stream.writeAndFlush(new DefaultHttp2HeadersFrame(hdrs)) // no END_STREAM
    awaitUntil("server to buffer the half-open stream")(
      GrpcServer.openStreamStates.get() == baseline + 1)
    stream.close().sync() // active stream channel close => RST_STREAM(CANCEL)
    awaitUntil("server to free the reset stream's state")(
      GrpcServer.openStreamStates.get() == baseline)
    assert(getDir("sub").entries.nonEmpty) // connection still serviceable
  }

  test("duplicate HEADERS (client trailers) finishes the stream: answered, no leak") {
    assume(GrpcServer.available, "epoll transport required")
    val baseline = GrpcServer.openStreamStates.get()
    val done = new CompletableFuture[RpcResult]()
    val sb = new Http2StreamChannelBootstrap(client._1)
    sb.handler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit =
        c.pipeline().addLast(new ChannelInboundHandlerAdapter {
          private val data = new ByteArrayOutputStream()
          private var headers: Http2Headers = _
          private var trailers: Http2Headers = _
          override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
            msg match {
              case h: Http2HeadersFrame =>
                if (headers == null) headers = h.headers else trailers = h.headers
                if (h.isEndStream) done.complete(
                  RpcResult(headers, data.toByteArray, Option(trailers)))
              case d: Http2DataFrame =>
                val end = d.isEndStream
                try d.content.readBytes(data, d.content.readableBytes())
                finally d.release()
                if (end) done.complete(
                  RpcResult(headers, data.toByteArray, Option(trailers)))
              case other => io.netty.util.ReferenceCountUtil.release(other)
            }
        })
    })
    val stream = sb.open().sync().getNow
    val hdrs = new DefaultHttp2Headers()
      .method("POST").scheme("http").path(GrpcServer.MethodPath).authority("localhost")
    hdrs.set("content-type", "application/grpc")
    hdrs.set("te", "trailers")
    // HTTP/2's trailer shape: HEADERS (open) → DATA (no END_STREAM) →
    // a SECOND HEADERS carrying END_STREAM. The server must finish the
    // buffered request off the existing state — a naive re-track would
    // double-count the stream AND discard the body
    stream.write(new DefaultHttp2HeadersFrame(hdrs))
    stream.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(
      GrpcServer.frameMessage(PufsProto.encodeRequest(
        PufsProto.DirContentsRequest("sub")))), false))
    stream.writeAndFlush(new DefaultHttp2HeadersFrame(new DefaultHttp2Headers(), true))
    val res = done.get(20, TimeUnit.SECONDS)
    assert(res.headers.status.toString == "200")
    assert(res.trailers.exists(_.get("grpc-status").toString == "0"),
      s"request body sent before client trailers must be answered, got ${res.trailers}")
    assert(PufsProto.decodeResponse(GrpcServer.unframeMessage(res.body)).entries.nonEmpty)
    awaitUntil("stream state to return to baseline (no double-count)")(
      GrpcServer.openStreamStates.get() == baseline)
  }

  test("oversized message is trailers-only RESOURCE_EXHAUSTED (8), state dropped") {
    assume(GrpcServer.available, "epoll transport required")
    val sock = Files.createTempDirectory("grpc-sock").resolve("small.sock").toString
    val sha = SnapshotStore.getRoot(fixture._1, "main").getOrElse("main")
    val handle = GrpcServer.serve(
      new SnapshotTree(SnapshotStore.mountAt(fixture._1, sha)), sock, maxBody = 64)
    val (conn, group) = connect(sock)
    try {
      val baseline = GrpcServer.openStreamStates.get()
      val res = callOn(conn, GrpcServer.MethodPath,
        GrpcServer.frameMessage(Array.fill[Byte](100)(1)))
      assert(res.headers.get("grpc-status").toString == "8")
      assert(res.trailers.isEmpty, "trailers-only: status rides the initial HEADERS")
      awaitUntil("overflowed stream's state to be dropped")(
        GrpcServer.openStreamStates.get() == baseline)
      // the connection survives and a small request still works
      val ok = callOn(conn, GrpcServer.MethodPath, GrpcServer.frameMessage(
        PufsProto.encodeRequest(PufsProto.DirContentsRequest("sub"))))
      assert(ok.trailers.exists(_.get("grpc-status").toString == "0"))
      // a client still MID-BODY when it overflows gets RST(CANCEL) so it
      // stops sending immediately — observable as the stream channel
      // closing without the client ever sending END_STREAM
      val sb = new Http2StreamChannelBootstrap(conn)
      sb.handler(new ChannelInboundHandlerAdapter())
      val stream = sb.open().sync().getNow
      val hdrs = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(GrpcServer.MethodPath).authority("localhost")
      hdrs.set("content-type", "application/grpc")
      stream.write(new DefaultHttp2HeadersFrame(hdrs))
      stream.writeAndFlush(new DefaultHttp2DataFrame(
        Unpooled.wrappedBuffer(Array.fill[Byte](100)(1)), false)) // NOT end-stream
      awaitUntil("server RST to close the half-open overflowing stream")(
        !stream.isOpen)
      awaitUntil("overflowed half-open stream's state to be dropped")(
        GrpcServer.openStreamStates.get() == baseline)

      // the CROSSED-trailers race over the real wire: client flushes
      // HEADERS + oversized DATA + trailers HEADERS(END_STREAM) together,
      // so its trailers are in flight when the server's RST(CANCEL)
      // fires. (Netty's server codec filters frames on streams it reset,
      // so the handler-level guard is exercised by the EmbeddedChannel
      // test below; here we pin no leak and a live connection.)
      val sb2 = new Http2StreamChannelBootstrap(conn)
      sb2.handler(new ChannelInboundHandlerAdapter())
      val s2 = sb2.open().sync().getNow
      val hdrs2 = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(GrpcServer.MethodPath).authority("localhost")
      hdrs2.set("content-type", "application/grpc")
      hdrs2.set("te", "trailers")
      s2.write(new DefaultHttp2HeadersFrame(hdrs2))
      s2.write(new DefaultHttp2DataFrame(
        Unpooled.wrappedBuffer(Array.fill[Byte](100)(1)), false))
      s2.writeAndFlush(new DefaultHttp2HeadersFrame(new DefaultHttp2Headers(), true))
      awaitUntil("crossed-trailers stream's state to be dropped")(
        GrpcServer.openStreamStates.get() == baseline)
      // connection still serviceable after the race
      val ok2 = callOn(conn, GrpcServer.MethodPath, GrpcServer.frameMessage(
        PufsProto.encodeRequest(PufsProto.DirContentsRequest("sub"))))
      assert(ok2.trailers.exists(_.get("grpc-status").toString == "0"))
    } finally {
      conn.close().syncUninterruptibly()
      group.shutdownGracefully(0, 1, TimeUnit.SECONDS).syncUninterruptibly()
      handle.stop()
    }
  }

  test("late HEADERS on a finished stream id is ignored — no re-track, no double response") {
    // EmbeddedChannel drive of the raw handler: a conformant codec end
    // filters frames on streams it knows are closed, but the handler must
    // not DEPEND on that (ADVICE r13): a duplicate END_STREAM HEADERS
    // after a normal finish — or the client's crossed trailers after an
    // oversize RST — used to be re-tracked as a brand-new path="" stream
    // and answered a second time on an id the codec already closed.
    import io.netty.channel.embedded.EmbeddedChannel
    import io.netty.handler.codec.http2.{Http2FrameStream, Http2Stream}
    val sha = SnapshotStore.getRoot(fixture._1, "main").getOrElse("main")
    val tree = new SnapshotTree(SnapshotStore.mountAt(fixture._1, sha))
    val ch = new EmbeddedChannel(GrpcServer.handlerForTest(tree))
    def stream(sid: Int): Http2FrameStream = new Http2FrameStream {
      override def id(): Int = sid
      override def state(): Http2Stream.State = Http2Stream.State.OPEN
    }
    def post: Http2Headers = {
      val h = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(GrpcServer.MethodPath)
        .authority("localhost")
      h.set("content-type", "application/grpc")
      h
    }
    val body = GrpcServer.frameMessage(
      PufsProto.encodeRequest(PufsProto.DirContentsRequest("sub")))
    val baseline = GrpcServer.openStreamStates.get()
    val s3 = stream(3)
    ch.writeInbound(new DefaultHttp2HeadersFrame(post, false).stream(s3))
    ch.writeInbound(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(body), true).stream(s3))
    // normal finish: response HEADERS + DATA + trailers, state dropped
    assert(ch.outboundMessages().size() == 3,
      s"expected 3 response frames, got ${ch.outboundMessages()}")
    assert(GrpcServer.openStreamStates.get() == baseline)
    val lateBase = GrpcServer.lateFramesIgnored.get()
    ch.writeInbound(
      new DefaultHttp2HeadersFrame(new DefaultHttp2Headers(), true).stream(s3))
    assert(ch.outboundMessages().size() == 3,
      "late duplicate END_STREAM HEADERS produced a second response")
    assert(GrpcServer.lateFramesIgnored.get() == lateBase + 1)
    assert(GrpcServer.openStreamStates.get() == baseline, "late frame re-tracked state")
    // a genuinely new (higher-id) stream on the same connection still serves
    val s5 = stream(5)
    ch.writeInbound(new DefaultHttp2HeadersFrame(post, false).stream(s5))
    ch.writeInbound(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(body), true).stream(s5))
    assert(ch.outboundMessages().size() == 6)
    ch.finishAndReleaseAll()
    ()
  }
}
