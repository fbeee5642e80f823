package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled proto3 wire codec for the reference's `api` package
  * (api/api.proto:1–28) — three messages, no toolchain required. The
  * encoding follows the protobuf wire spec exactly:
  *
  *  - tag = (fieldNumber << 3) | wireType; wire 0 = VARINT, 2 = LEN,
  *  - varints are base-128 little-endian groups, 10 bytes max (negative
  *    int32/int64 sign-extend to the full 64-bit two's complement),
  *  - proto3 scalar fields at their default (0 / "" / false / empty
  *    bytes) are NOT serialized; absent fields decode to defaults,
  *  - unknown fields are skipped by wire type (forward compatibility).
  *
  * Field numbers mirror api.proto verbatim: DirContentsRequest.path=1;
  * Entry ID=1 name=2 isDirty=3 isDir=4 size=5 modTimeSeconds=6
  * blockID=7 populatedRegionCount=8 populatedSize=9;
  * DirContentsResponse.entries=10, errorMsg=11. PufsProtoSpec pins the
  * codec against hand-computed golden byte strings and round-trips,
  * and GrpcServerSpec exercises it end-to-end over the gRPC wire. */
object PufsProto {

  case class DirContentsRequest(path: String)

  case class Entry(
      id: Long = 0L,
      name: String = "",
      isDirty: Boolean = false,
      isDir: Boolean = false,
      size: Long = 0L,
      modTimeSeconds: Long = 0L,
      blockId: Array[Byte] = Array.emptyByteArray,
      populatedRegionCount: Int = 0,
      populatedSize: Long = 0L)

  case class DirContentsResponse(
      entries: Seq[Entry] = Nil,
      errorMsg: String = "")

  // ------------------------------------------------------------ writing

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def varint(v0: Long): Writer = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      this
    }
    private def tag(field: Int, wire: Int): Writer = varint((field << 3) | wire)

    /** int64/int32/bool (proto3 elides defaults). */
    def int64(field: Int, v: Long): Writer =
      if (v == 0L) this else { tag(field, 0); varint(v) }
    def int32(field: Int, v: Int): Writer = int64(field, v.toLong)
    def bool(field: Int, v: Boolean): Writer = int64(field, if (v) 1L else 0L)
    def bytes(field: Int, v: Array[Byte]): Writer =
      if (v == null || v.isEmpty) this
      else { tag(field, 2); varint(v.length.toLong); out.write(v); this }
    def string(field: Int, v: String): Writer =
      if (v == null || v.isEmpty) this else bytes(field, v.getBytes(UTF_8))
    /** Embedded message (LEN-framed); written even when empty — an empty
      * repeated-message element is still an element. */
    def message(field: Int, body: Array[Byte]): Writer = {
      tag(field, 2); varint(body.length.toLong); out.write(body); this
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------------------ reading

  final class Reader(buf: Array[Byte], from: Int, until: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = from
    def hasNext: Boolean = pos < until

    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        if (pos >= until || shift > 63)
          throw new IllegalArgumentException("malformed varint")
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      acc // unreachable
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    /** LEN payload as a sub-range [start, end). Validated as a Long
      * BEFORE the Int narrowing: a 64-bit length like 2^32+5 would
      * otherwise truncate to 5 and silently misparse. */
    def readLen(): (Int, Int) = {
      val v = readVarint()
      if (v < 0 || v > until - pos)
        throw new IllegalArgumentException(s"LEN $v overruns buffer")
      val n = v.toInt
      val r = (pos, pos + n); pos += n; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => readLen()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def slice(start: Int, end: Int): Reader = new Reader(buf, start, end)
    def sliceBytes(start: Int, end: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, start, end)
    def sliceString(start: Int, end: Int): String =
      new String(buf, start, end - start, UTF_8)
  }

  // ------------------------------------------------------------ messages

  def encodeRequest(r: DirContentsRequest): Array[Byte] =
    new Writer().string(1, r.path).toBytes

  def decodeRequest(bytes: Array[Byte]): DirContentsRequest = {
    val rd = new Reader(bytes)
    var path = ""
    while (rd.hasNext) rd.readTag() match {
      case (1, 2) => val (s, e) = rd.readLen(); path = rd.sliceString(s, e)
      case (_, w) => rd.skip(w)
    }
    DirContentsRequest(path)
  }

  def encodeEntry(e: Entry): Array[Byte] =
    new Writer()
      .int64(1, e.id).string(2, e.name).bool(3, e.isDirty).bool(4, e.isDir)
      .int64(5, e.size).int64(6, e.modTimeSeconds).bytes(7, e.blockId)
      .int32(8, e.populatedRegionCount).int64(9, e.populatedSize)
      .toBytes

  private def decodeEntry(rd: Reader): Entry = {
    var e = Entry()
    while (rd.hasNext) rd.readTag() match {
      case (1, 0) => e = e.copy(id = rd.readVarint())
      case (2, 2) => val (s, t) = rd.readLen(); e = e.copy(name = rd.sliceString(s, t))
      case (3, 0) => e = e.copy(isDirty = rd.readVarint() != 0)
      case (4, 0) => e = e.copy(isDir = rd.readVarint() != 0)
      case (5, 0) => e = e.copy(size = rd.readVarint())
      case (6, 0) => e = e.copy(modTimeSeconds = rd.readVarint())
      case (7, 2) => val (s, t) = rd.readLen(); e = e.copy(blockId = rd.sliceBytes(s, t))
      case (8, 0) => e = e.copy(populatedRegionCount = rd.readVarint().toInt)
      case (9, 0) => e = e.copy(populatedSize = rd.readVarint())
      case (_, w) => rd.skip(w)
    }
    e
  }

  def encodeResponse(r: DirContentsResponse): Array[Byte] = {
    val w = new Writer()
    r.entries.foreach(e => w.message(10, encodeEntry(e)))
    w.string(11, r.errorMsg)
    w.toBytes
  }

  def decodeResponse(bytes: Array[Byte]): DirContentsResponse = {
    val rd = new Reader(bytes)
    val entries = Seq.newBuilder[Entry]
    var err = ""
    while (rd.hasNext) rd.readTag() match {
      case (10, 2) => val (s, e) = rd.readLen(); entries += decodeEntry(rd.slice(s, e))
      case (11, 2) => val (s, e) = rd.readLen(); err = rd.sliceString(s, e)
      case (_, w) => rd.skip(w)
    }
    DirContentsResponse(entries.result(), err)
  }
}
