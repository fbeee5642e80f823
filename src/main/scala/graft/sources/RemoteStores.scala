package graft.sources

import java.io.{File, IOException, RandomAccessFile}
import java.net.{HttpURLConnection, URI}

/** The "remote" seam of the lazy FileSystem — a ranged read against a
  * backing object store (reference remote/gcs.go:302-331 NewRangeReader,
  * remote/http.go:22-51 URLRef.Copy). `pufs://` pulls chunks exclusively
  * through this interface, so swapping local-dir ⇄ HTTP ⇄ (a real bucket
  * client) changes nothing above it. */
trait RemoteStore {
  /** Read exactly `len` bytes at `start`. Must throw on failure — the
    * caller treats a short read as corruption. */
  def read(start: Long, len: Int): Array[Byte]
}

/** Local-directory object store (zero-egress stand-in for a bucket). */
final class LocalStore(src: File) extends RemoteStore {
  def read(start: Long, len: Int): Array[Byte] = {
    val raf = new RandomAccessFile(src, "r")
    try {
      raf.seek(start)
      val buf = new Array[Byte](len)
      raf.readFully(buf)
      buf
    } finally raf.close()
  }
}

/** Local store with a generation pin captured at open: every ranged read
  * verifies — before AND after reading, bracketing the non-atomic local
  * read the way GCS's server-side precondition brackets a range GET — that
  * the backing file still has the pinned (size, mtime). The local analog
  * of generation-match range reads (reference remote/gcs.go:302-331
  * `Generation: r.Generation` precondition): an object replaced under an
  * open reader fails with TornReadException instead of silently serving
  * bytes from a different object generation. */
final class PinnedLocalStore(src: File, pinSize: Long, pinMtime: Long)
    extends RemoteStore {
  private def check(): Unit =
    if (src.length() != pinSize || src.lastModified() != pinMtime)
      throw new TornReadException(
        s"$src changed under an open reader (pinned $pinSize:$pinMtime, " +
          s"now ${src.length()}:${src.lastModified()})")
  def read(start: Long, len: Int): Array[Byte] = {
    check()
    val raf = new RandomAccessFile(src, "r")
    val buf = try {
      raf.seek(start)
      val b = new Array[Byte](len)
      raf.readFully(b)
      b
    } finally raf.close()
    check()
    buf
  }
}

/** The backing object changed identity mid-read — the torn-read guard
  * (reference GCS generation-match precondition remote/gcs.go:305-307;
  * HTTP If-Match remote/http.go:24). Not retryable: the snapshot this
  * reader was opened against no longer exists. */
final class TornReadException(msg: String) extends IOException(msg)

/** HTTP(S) remote with Range GET + If-Match ETag pinning + a bounded retry
  * budget (reference remote/http.go:22-51; retry ≤10 core/freezer.go:566-600).
  *
  * The ETag is captured once at open (the snapshot pin); every ranged read
  * sends `If-Match`, so a concurrently-replaced object answers 412 and the
  * read fails with TornReadException instead of silently mixing bytes from
  * two object generations. Transient IO errors retry with linear backoff;
  * 412 never retries (the object is GONE, not flaky). */
final class HttpStore(url: String, etag: Option[String], maxRetries: Int = 10)
    extends RemoteStore {

  def read(start: Long, len: Int): Array[Byte] = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return readOnce(start, len)
      catch {
        case t: TornReadException => throw t // never retry a torn read
        case t: IOException if attempt <= maxRetries =>
          Thread.sleep(math.min(200L * attempt, 1000L))
        case t: IOException =>
          throw new IOException(s"range GET failed after $maxRetries retries", t)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def readOnce(start: Long, len: Int): Array[Byte] = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Range", s"bytes=$start-${start + len - 1}")
      etag.foreach(e => conn.setRequestProperty("If-Match", e))
      conn.getResponseCode match {
        case 206 | 200 =>
          val in = conn.getInputStream
          try {
            val buf = new Array[Byte](len)
            var off = 0
            while (off < len) {
              val n = in.read(buf, off, len - off)
              if (n < 0) throw new IOException(
                s"short ranged read: got $off of $len at $start")
              off += n
            }
            buf
          } finally in.close()
        case 412 =>
          throw new TornReadException(
            s"ETag mismatch on $url — object replaced under an open reader")
        case code =>
          throw new IOException(s"range GET $url returned $code")
      }
    } finally conn.disconnect()
  }
}

object HttpStore {
  /** HEAD the object for (size, etag) — the attribute probe done when a
    * remote URL is linked (reference remote/http.go:61-72 GetAttrs). */
  def head(url: String): (Long, Option[String]) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("HEAD")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(10000)
      val code = conn.getResponseCode
      if (code != 200) throw new IOException(s"HEAD $url returned $code")
      (conn.getContentLengthLong, Option(conn.getHeaderField("ETag")))
    } finally conn.disconnect()
  }
}
