package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL multimodal codecs on the pure JDK — no external media libraries.
  *
  * Earlier rounds stubbed the decode step ([[Multimodal.FakeDecoder]])
  * on the grounds that "no image/audio libs exist in this container".
  * That is true for ffmpeg/libjpeg/Pillow-class codecs, but the JDK
  * itself ships real ones: `javax.imageio` decodes/encodes PNG, JPEG,
  * GIF and BMP (java.desktop module), `java.awt.image` gives real pixel
  * access and real resampling, and `javax.sound.sampled` parses RIFF/WAVE
  * PCM. This object promotes image + audio from stub to real:
  *
  *  - [[decodeDims]] — true header parse (format sniff + dimensions via
  *    `ImageReader.getWidth/getHeight(0)`, no pixel decode, the cheap
  *    metadata pass a 100 TB catalog scan wants),
  *  - [[resizePng]] — true pixel resample (area-ish via
  *    `SCALE_SMOOTH`) + PNG re-encode,
  *  - [[grayFeature]] — real visual embedding: g×g block-mean luminance
  *    over decoded pixels, L2-normalizable, feeding the existing
  *    cosine/ANN operators. Unlike the hash-derived stub vector, this
  *    one is *perceptual*: a resized copy of an image lands near its
  *    original (JdkCodecsSpec pins cosine > 0.99 across a 2.5× resize),
  *    which is what makes embedding-based image near-dup actually work,
  *  - [[avgHash64]] — 64-bit average-hash (8×8 block means thresholded
  *    by their mean; the classic aHash of the perceptual-hashing
  *    literature), resize-stable by construction, slotting into the
  *    existing SimHash/Hamming band screens,
  *  - [[renderWav]]/[[decodeWavMeta]] — canonical 44-byte RIFF PCM16
  *    encode (hand-rolled, so byte layout is spec-pinned) and real
  *    decode through `AudioSystem`.
  *
  * Video demuxing is REAL for YUV4MPEG2 ([[parseY4m]] below — header
  * tags, FRAME boundaries, chroma-subsampled plane extents), the one
  * container a pure JVM can demux honestly because it carries no
  * entropy coding. Entropy-coded containers (mp4/webm) remain
  * environment-blocked (the JDK ships no such demuxer); for those
  * [[Multimodal.frameSample]] falls back to its documented
  * fixed-stride stub.
  *
  * Reference anchor: the reference treats payloads as opaque byte blocks
  * (core/types.go:10) and its workloads README (README.md:66–96) names
  * image/satellite-tile corpora; these codecs make the decode stage of
  * that pipeline real for the formats the JVM carries natively.
  *
  * 100 TB notes: every function here is a per-row kernel used under
  * `mapPartitions` — embarrassingly parallel, no shuffle, no driver
  * state; codec objects are created per call (ImageIO readers are not
  * thread-safe to share) and `ImageIO.setUseCache(false)` keeps decode
  * off executor local disk.
  */
object JdkCodecs {

  // JVM-wide, idempotent: executors never have a display, and ImageIO's
  // default disk-backed cache would put every decode through local disk.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- images

  /** Deterministic test-image dimensions from a key — the same arithmetic
    * is re-computed by the DuckDB oracle, so a mis-parsed header (wrong
    * width/height out of [[decodeDims]]) fails the lane hash. */
  def imgWidth(id: Long): Int = (id % 97).toInt + 16
  def imgHeight(id: Long): Int = ((id * 7) % 83).toInt + 16

  /** splitmix64 — the standard 64-bit finalizer (Steele et al. 2014,
    * public domain), used to key per-image content so nearby ids get
    * decorrelated images. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pixel function behind [[renderPng]] — exposed so the spec can check
    * decoded pixels bit-for-bit. Content is low-frequency on purpose
    * (per channel a seed-keyed 1–4-cycle sine plaid with a continuous
    * phase), so resampling preserves it — perceptual features/hashes of
    * a resized copy stay close to the original's — while the three
    * independently keyed channels give distinct ids genuinely different
    * block structure: an id pair only aHash-collides when all three
    * plaids align in frequency AND phase, which keeps the near-dup
    * graph sparse at corpus scale (the earlier shared x/y gradient
    * design collapsed 1000 images onto 428 distinct hashes — measured —
    * because 2/3 of every image's luminance was identical). */
  def pixelAt(id: Long, w: Int, h: Int, x: Int, y: Int): Int = {
    def chan(k: Int): Int = {
      val r = mix64(id * 3 + k)
      val fx = 1 + (r & 3L).toInt
      val fy = 1 + ((r >>> 2) & 3L).toInt
      val phase = ((r >>> 4) & 0xffffffL).toDouble / (1 << 24) * 2.0 * math.Pi
      val v = (127.5 + 127.5 * math.sin(
        2.0 * math.Pi * (fx * x.toDouble / w + fy * y.toDouble / h) + phase)).toInt
      math.min(255, math.max(0, v))
    }
    (chan(0) << 16) | (chan(1) << 8) | chan(2)
  }

  /** Render the deterministic RGB test image for a key and encode it as a
    * real PNG (lossless, so decode must return [[pixelAt]] exactly). */
  def renderPng(id: Long): Array[Byte] = {
    val w = imgWidth(id); val h = imgHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelAt(id, w, h, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** True header parse: sniff the container, read dimensions WITHOUT
    * decoding pixels. Returns (width, height, format, ok); unparseable
    * payloads → (0, 0, "unknown", false), never a throw. */
  def decodeDims(payload: Array[Byte]): (Int, Int, String, Boolean) = {
    if (payload == null || payload.isEmpty) return (0, 0, "empty", false)
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (0, 0, "unknown", false)
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase, true)
        } finally r.dispose()
      }
    } catch { case _: Exception => (0, 0, "unknown", false) }
    finally iis.close()
  }

  /** Full pixel decode; None if the payload is not a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

  /** Aspect-preserving resize to `maxDim` (no-op if already within) with
    * REAL resampling + PNG re-encode. Target dims use integer floor
    * arithmetic — `max(1, side*maxDim/longSide)` — so the oracle can
    * recompute them exactly. Returns (pngBytes, outW, outH); undecodable
    * input → (empty, 0, 0). */
  def resizePng(payload: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) =
    decodeImage(payload) match {
      case None => (Array.emptyByteArray, 0, 0)
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        val mx = math.max(w, h)
        if (mx <= maxDim) (payload, w, h)
        else {
          val ow = math.max(1, w * maxDim / mx)
          val oh = math.max(1, h * maxDim / mx)
          val scaled = img.getScaledInstance(ow, oh, java.awt.Image.SCALE_SMOOTH)
          val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try g2.drawImage(scaled, 0, 0, null)
          finally g2.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          (bos.toByteArray, ow, oh)
        }
    }

  /** g×g block-mean luminance grid over REAL decoded pixels, flattened
    * row-major to a g² float vector in [0, 1]. Blocks partition the image
    * by integer bounds (i*dim/g .. (i+1)*dim/g), so any image size maps to
    * the same grid — the resize invariance the spec pins. */
  def grayFeature(payload: Array[Byte], grid: Int = 8): Array[Float] =
    decodeImage(payload) match {
      case None => Array.fill(grid * grid)(0f)
      case Some(img) => grayFeatureOf(img, grid)
    }

  private def grayFeatureOf(img: BufferedImage, grid: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Float](grid * grid)
    var gy = 0
    while (gy < grid) {
      val y0 = gy * h / grid; val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
      var gx = 0
      while (gx < grid) {
        val x0 = gx * w / grid; val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
        var sum = 0L; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        out(gy * grid + gx) = if (n == 0) 0f else sum.toFloat / (n * 3 * 255f)
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit average-hash: 8×8 block-mean luminance, each bit = block above
    * the global mean. Resize-stable (JdkCodecsSpec pins Hamming ≤ 3 across
    * a 2.5× downscale), so it slots into the existing 16-bit-band Hamming
    * screens exactly like the text SimHash64. Undecodable → 0L. */
  def avgHash64(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case None => 0L
      case Some(img) =>
        val f = grayFeatureOf(img, 8)
        val mean = f.sum / 64f
        var bits = 0L; var i = 0
        while (i < 64) { if (f(i) > mean) bits |= (1L << i); i += 1 }
        bits
    }

  // ---------------------------------------------------------------- video

  /** Deterministic test-video geometry from a key — the same arithmetic
    * the DuckDB oracle recomputes, so a frame-boundary or plane-size bug
    * in [[parseY4m]] fails the lane hash. */
  def vidWidth(id: Long): Int = (id % 31).toInt + 8
  def vidHeight(id: Long): Int = ((id * 5) % 29).toInt + 8
  def vidFrames(id: Long): Int = (id % 7).toInt + 4

  /** Per-frame luma value: frame f of video id carries a CONSTANT Y
    * plane of this value, so its mean luminance is oracle-exact; U/V
    * planes are splitmix64 noise the parser must skip at exactly w·h
    * bytes each — a plane-size bug desynchronizes every later frame. */
  def vidLuma(id: Long, frame: Int): Int = ((id * 31 + frame * 17) % 251).toInt

  /** Encode the deterministic test video for a key as a real YUV4MPEG2
    * (Y4M) stream: ASCII `YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C444` header,
    * then per frame an ASCII `FRAME` marker + raw 4:4:4 planes. Y4M is
    * the one container a pure JVM can carry honestly — a public,
    * trivially specified format (the mjpegtools/ffmpeg interchange
    * format) with no entropy coding, which is exactly why it closes the
    * "JDK has no demuxer" gap: the demuxing (header parse, frame
    * boundaries, plane layout) is real, only the bitstream is raw. */
  def renderY4m(id: Long): Array[Byte] = {
    val w = vidWidth(id); val h = vidHeight(id); val n = vidFrames(id)
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val frameMarker = "FRAME\n".getBytes("US-ASCII")
    val plane = w * h
    val out = java.nio.ByteBuffer.allocate(
      header.length + n * (frameMarker.length + 3 * plane))
    out.put(header)
    var f = 0
    while (f < n) {
      out.put(frameMarker)
      val y = vidLuma(id, f).toByte
      var i = 0
      while (i < plane) { out.put(y); i += 1 }
      // U/V noise keyed off (id, f, plane index block) — incompressible,
      // and any parser that misreads plane extents lands inside it
      var j = 0
      while (j < 2 * plane) {
        out.put((mix64(id ^ (f.toLong << 32) ^ j.toLong) & 0xff).toByte)
        j += 1
      }
      f += 1
    }
    out.array()
  }

  /** A demuxed Y4M stream: geometry + the decoded LUMA plane per frame
    * (U/V are parsed for extent — they position the next frame — but
    * only Y feeds the gray features downstream). */
  final case class Y4m(width: Int, height: Int, frames: IndexedSeq[Array[Byte]])

  /** REAL Y4M demux: parses the stream header (W/H/C tags), walks FRAME
    * markers, and slices each frame's planes by the declared chroma
    * subsampling (C444 = 3·wh; C420 variants = wh + 2·⌈w/2⌉⌈h/2⌉;
    * C422 = wh + 2·⌈w/2⌉h; mono = wh). Returns None for anything that
    * is not a well-formed Y4M stream — never throws, the per-row-kernel
    * contract shared with [[decodeDims]]/[[decodeWavMeta]]. */
  def parseY4m(payload: Array[Byte]): Option[Y4m] = {
    val Magic = "YUV4MPEG2 "
    if (payload == null || payload.length < Magic.length + 1) return None
    if (!payload.startsWith(Magic.getBytes("US-ASCII"))) return None
    val hdrEnd = payload.indexOf('\n'.toByte)
    if (hdrEnd < 0) return None
    val tags = new String(payload, 0, hdrEnd, "US-ASCII")
      .drop(Magic.length).split(' ').filter(_.nonEmpty)
    var w = -1; var h = -1; var chroma = "420jpeg" // Y4M's default
    var malformed = false
    tags.foreach { t =>
      t.charAt(0) match {
        // toIntOption, not toInt: a corrupt/adversarial header ("W10x",
        // "W99999999999") must take the documented None fallback, not
        // throw NumberFormatException out of the per-row kernel
        case 'W' => t.drop(1).toIntOption match {
          case Some(v) => w = v; case None => malformed = true
        }
        case 'H' => t.drop(1).toIntOption match {
          case Some(v) => h = v; case None => malformed = true
        }
        case 'C' => chroma = t.drop(1)
        case _ => // F/I/A/X tags don't affect demuxing
      }
    }
    if (malformed || w <= 0 || h <= 0) return None
    // plane sizes in Long: W46341 H46341 overflows w*h to a negative Int
    // and Arrays.copyOfRange would throw instead of returning None
    val lumaL = w.toLong * h
    // half extents in Long too: (w + 1) wraps negative at w=Int.MaxValue,
    // which would slip a bogus (even negative) frameBytesL past the
    // payload bound and let copyOfRange throw out of the per-row kernel
    val halfW = (w.toLong + 1) / 2
    val halfH = (h.toLong + 1) / 2
    val frameBytesL: Long = chroma match {
      case "444" => 3L * lumaL
      case "422" => lumaL + 2L * halfW * h
      case c if c.startsWith("420") => lumaL + 2L * halfW * halfH
      case "mono" => lumaL
      case _ => return None
    }
    // 3L·lumaL can overflow Long at w=h≈Int.MaxValue — reject any frame
    // size the arithmetic can't even represent before comparing
    if (frameBytesL <= 0 || frameBytesL < lumaL) return None
    // a stream whose single frame exceeds the payload can hold no frame
    // at all; this bound also proves frameBytes/luma fit in Int below
    if (frameBytesL > payload.length) return None
    val luma = lumaL.toInt
    val frameBytes = frameBytesL.toInt
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var pos = hdrEnd + 1
    val FrameMagic = "FRAME".getBytes("US-ASCII")
    while (pos < payload.length) {
      // frame header: "FRAME", optional ' '-prefixed params, '\n'
      if (pos + FrameMagic.length > payload.length ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(payload, pos, pos + FrameMagic.length),
          FrameMagic)) return None
      var nl = pos + FrameMagic.length
      while (nl < payload.length && payload(nl) != '\n'.toByte) nl += 1
      if (nl >= payload.length) return None
      val dataStart = nl + 1
      // Long compare: dataStart + frameBytes can wrap Int on ~2 GiB payloads
      if (dataStart.toLong + frameBytes > payload.length) return None
      frames += java.util.Arrays.copyOfRange(payload, dataStart, dataStart + luma)
      pos = dataStart + frameBytes
    }
    Some(Y4m(w, h, frames.result()))
  }

  /** Mean of a luma plane, rounded down — integer-exact for the constant
    * planes [[renderY4m]] emits, so the oracle recomputes it. */
  def lumaMean(plane: Array[Byte]): Int =
    if (plane.isEmpty) 0
    else (plane.foldLeft(0L)((a, b) => a + (b & 0xff)) / plane.length).toInt

  // ---------------------------------------------------------------- audio

  def wavSamples(id: Long): Int = (id % 1000).toInt + 100
  val WavRateHz = 8000

  /** Canonical 44-byte-header RIFF/WAVE, PCM16 little-endian mono at
    * [[WavRateHz]], with a deterministic triangle-ish sample pattern.
    * Hand-rolled so the byte layout is pinned by the WAVE spec, not by a
    * library's choice of chunk ordering — total size is exactly
    * 44 + 2·nSamples, which the oracle recomputes. */
  def renderWav(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavRateHz)
      .putInt(WavRateHz * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val period = 32 + (id % 32).toInt
      val phase = i % period
      val tri = if (phase * 2 < period) phase * 2 else 2 * (period - phase)
      bb.putShort(((tri * 65535 / period) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL decode through `javax.sound.sampled`: (sampleRateHz, channels,
    * frames, ok). Unparseable → (0, 0, 0, false). */
  def decodeWavMeta(payload: Array[Byte]): (Int, Int, Long, Boolean) = {
    if (payload == null || payload.isEmpty) return (0, 0, 0L, false)
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        (f.getSampleRate.toInt, f.getChannels, in.getFrameLength, true)
      } finally in.close()
    } catch { case _: Exception => (0, 0, 0L, false) }
  }
}

/** Real image decoder behind the [[Multimodal.Decoder]] seam — drop-in
  * for the stub wherever payloads are actual images. */
object JdkImageDecoder extends Multimodal.Decoder {
  def decode(payload: Array[Byte]): (Int, Int, String, Boolean) =
    JdkCodecs.decodeDims(payload)
}
