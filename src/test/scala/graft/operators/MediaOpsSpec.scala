package graft.operators

import graft.SparkSpec
import graft.functions.{JdkCodecs, JdkImageDecoder}

/** The real-codec properties a SQL oracle cannot check: pixel-level
  * round-trips, resample geometry/content, and the perceptual outputs'
  * resize invariance (the property that makes image near-dup work, and
  * that the hash-derived stub could never have). The three MediaOps lanes
  * themselves are driver-oracled (decode(encode(f(id))) == f(id) per row);
  * this spec covers what lives below the lane surface. */
class MediaOpsSpec extends SparkSpec {

  test("PNG round-trip: header parse returns the rendered geometry, pixels decode exactly") {
    for (id <- Seq(0L, 1L, 41L, 96L, 1234L, 99999L)) {
      val png = JdkCodecs.renderPng(id)
      // real PNG magic, not a fake container
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
      val (w, h, fmt, ok) = JdkCodecs.decodeDims(png)
      assert(ok && fmt == "png")
      assert(w == JdkCodecs.imgWidth(id) && h == JdkCodecs.imgHeight(id))
      // PNG is lossless: decoded pixels must equal the renderer's function
      val img = JdkCodecs.decodeImage(png).get
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w / 2, h / 2)))
        assert((img.getRGB(x, y) & 0xffffff) == JdkCodecs.pixelAt(id, w, h, x, y),
          s"pixel mismatch at ($x,$y) for id=$id")
    }
  }

  test("decode is total: garbage, truncated and empty payloads report ok=false") {
    assert(JdkCodecs.decodeDims(Array.emptyByteArray) == (0, 0, "empty", false))
    assert(!JdkCodecs.decodeDims("not an image".getBytes)._4)
    val truncated = JdkCodecs.renderPng(7L).take(20)
    val (_, _, _, ok) = JdkCodecs.decodeDims(truncated)
    // header may sniff as PNG but pixel decode must not blow up either
    assert(JdkCodecs.decodeImage(truncated).isEmpty || ok)
    assert(JdkCodecs.avgHash64("junk".getBytes) == 0L)
    assert(!JdkCodecs.decodeWavMeta("RIFFjunk".getBytes)._4)
  }

  test("resize: real resample hits the integer-floor target box, no-op within bounds") {
    val id = 4321L // 16..112 wide; ensure a genuinely large side
    val png = JdkCodecs.renderPng(id)
    val (w, h, _, _) = JdkCodecs.decodeDims(png)
    val (out, ow, oh) = JdkCodecs.resizePng(png, maxDim = 40)
    val mx = math.max(w, h)
    assert(ow == math.max(1, w * 40 / mx) && oh == math.max(1, h * 40 / mx))
    val (dw, dh, fmt, ok) = JdkCodecs.decodeDims(out)
    assert(ok && fmt == "png" && dw == ow && dh == oh)
    // content survives: mean luminance within 2% of the original's
    def meanLum(b: Array[Byte]) = { val f = JdkCodecs.grayFeature(b, 4); f.sum / f.length }
    assert(math.abs(meanLum(out) - meanLum(png)) < 0.02)
    // already-small image: returned unchanged
    val small = JdkCodecs.resizePng(JdkCodecs.renderPng(0L), maxDim = 4096)
    assert(small._2 == JdkCodecs.imgWidth(0L) && (small._1 sameElements JdkCodecs.renderPng(0L)))
  }

  test("perceptual embedding: resized copy stays near its original, distinct images do not") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val png = JdkCodecs.renderPng(4321L)
    val (resized, _, _) = JdkCodecs.resizePng(png, maxDim = 40)
    val fOrig = JdkCodecs.grayFeature(png)
    val fSmall = JdkCodecs.grayFeature(resized)
    assert(cos(fOrig, fSmall) > 0.99, "a ~2.5x downscale must keep cosine > 0.99")
    // a different image (different blue plane + geometry) is clearly apart
    val fOther = JdkCodecs.grayFeature(JdkCodecs.renderPng(77L))
    assert(cos(fOrig, fOther) < cos(fOrig, fSmall))
  }

  test("avgHash64: resize-stable, discriminating, deterministic") {
    val png = JdkCodecs.renderPng(4321L)
    val (resized, _, _) = JdkCodecs.resizePng(png, maxDim = 40)
    val h1 = JdkCodecs.avgHash64(png)
    val h2 = JdkCodecs.avgHash64(resized)
    // the smooth test gradient puts several blocks AT the global mean, so
    // a handful of boundary bits may flip under resampling; ≤8 of 64 is
    // the aHash literature's near-dup band, and the far side must stay far
    val near = java.lang.Long.bitCount(h1 ^ h2)
    assert(near <= 8, s"phash must survive resize: $near bits differ")
    val far = java.lang.Long.bitCount(
      h1 ^ JdkCodecs.avgHash64(JdkCodecs.renderPng(98765L)))
    assert(far > near && far > 10,
      s"distinct images must hash apart: near=$near far=$far")
    assert(h1 == JdkCodecs.avgHash64(JdkCodecs.renderPng(4321L)))
  }

  test("WAV: canonical RIFF layout, real javax.sound decode agrees with the arithmetic") {
    for (id <- Seq(0L, 3L, 999L, 100000L)) {
      val wav = JdkCodecs.renderWav(id)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      assert(wav.length == 44 + 2 * JdkCodecs.wavSamples(id))
      val (rate, ch, frames, ok) = JdkCodecs.decodeWavMeta(wav)
      assert(ok && rate == JdkCodecs.WavRateHz && ch == 1)
      assert(frames == JdkCodecs.wavSamples(id).toLong)
    }
  }

  test("JdkImageDecoder slots behind the Multimodal.Decoder seam") {
    val (w, h, fmt, ok) = JdkImageDecoder.decode(JdkCodecs.renderPng(5L))
    assert(ok && fmt == "png" && w == JdkCodecs.imgWidth(5L) && h == JdkCodecs.imgHeight(5L))
    import org.apache.spark.sql.functions._
    val df = graft.Tables.t(spark, sfDir, "documents").limit(8)
      .select(col("doc_id").as("id"))
      .withColumn("payload",
        udf((id: Long) => JdkCodecs.renderPng(id)).apply(col("id")))
    val metas = graft.functions.Multimodal.decodeMeta(df, JdkImageDecoder)
      .select("id", "width", "height", "format", "ok").collect()
    assert(metas.nonEmpty && metas.forall { r =>
      r.getBoolean(4) && r.getString(3) == "png" &&
        r.getInt(1) == JdkCodecs.imgWidth(r.getLong(0)) &&
        r.getInt(2) == JdkCodecs.imgHeight(r.getLong(0))
    })
  }

  test("l64: band screen over real-pixel aHashes ≡ unscreened brute force, planted resizes surface") {
    import org.apache.spark.sql.functions._
    val sigs = spark.read.parquet(MediaOps.AHashSigs.fixture(spark, sfDir))
    val screened = MediaOps.queries("l64_image_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS LONG)").as("ham"))
      .filter(col("ham") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(screened == brute,
      s"radius-3 pigeonhole must be exact: ${(screened diff brute).size} extra, " +
        s"${(brute diff screened).size} missed")
    // the planted real-resize copies are the near-dups a curation pass
    // must catch: a healthy majority land within the radius
    val planted = sigs.filter(col("doc_id") >= 10000000L).count()
    val caught = screened.count { case (a, b, _) => b == a + 10000000L }
    assert(planted > 0 && caught * 2 > planted,
      s"only $caught of $planted planted resize pairs within Hamming 3")
  }

  test("Y4M round-trip: real demux returns the encoded geometry, frames and luma") {
    for (id <- Seq(0L, 1L, 30L, 1234L, 99999L)) {
      val y4m = JdkCodecs.renderY4m(id)
      assert(new String(y4m.take(10), "US-ASCII") == "YUV4MPEG2 ")
      val v = JdkCodecs.parseY4m(y4m).getOrElse(fail(s"id=$id did not parse"))
      assert(v.width == JdkCodecs.vidWidth(id) && v.height == JdkCodecs.vidHeight(id))
      assert(v.frames.length == JdkCodecs.vidFrames(id))
      // frame f carries a constant Y plane of vidLuma(id, f); a plane-
      // extent bug would read U/V noise as luma and break this exactly
      v.frames.zipWithIndex.foreach { case (plane, f) =>
        assert(plane.length == v.width * v.height)
        assert(JdkCodecs.lumaMean(plane) == JdkCodecs.vidLuma(id, f),
          s"frame $f of id=$id decoded wrong luma")
        assert(plane.forall(b => (b & 0xff) == JdkCodecs.vidLuma(id, f)))
      }
    }
  }

  test("Y4M parser is total and handles the format's variants") {
    assert(JdkCodecs.parseY4m(Array.emptyByteArray).isEmpty)
    assert(JdkCodecs.parseY4m("not a video".getBytes).isEmpty)
    assert(JdkCodecs.parseY4m(null).isEmpty)
    // truncated mid-frame: None, not a partial parse
    val full = JdkCodecs.renderY4m(7L)
    assert(JdkCodecs.parseY4m(full.dropRight(5)).isEmpty)
    // C420 (the format's default when no C tag is present): 2x2-subsampled
    // chroma, ceil division on odd dims — hand-build a 3x3, 2-frame stream
    def c420(w: Int, h: Int, frames: Int, yVal: Int): Array[Byte] = {
      val luma = w * h
      val chroma = ((w + 1) / 2) * ((h + 1) / 2)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F30:1\n".getBytes("US-ASCII"))
      for (_ <- 0 until frames) {
        bos.write("FRAME Xsome-param\n".getBytes("US-ASCII")) // param'd marker
        for (_ <- 0 until luma) bos.write(yVal)
        for (_ <- 0 until 2 * chroma) bos.write(128)
      }
      bos.toByteArray
    }
    val v = JdkCodecs.parseY4m(c420(3, 3, 2, 77))
      .getOrElse(fail("C420-default stream did not parse"))
    assert(v.width == 3 && v.height == 3 && v.frames.length == 2)
    assert(v.frames.forall(p => p.length == 9 && JdkCodecs.lumaMean(p) == 77))
    // unknown chroma tag: rejected, not misread
    val bad = "YUV4MPEG2 W2 H2 C999\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(1)
    assert(JdkCodecs.parseY4m(bad).isEmpty)
  }

  test("frameSample demuxes Y4M for real and falls back to the stub otherwise") {
    import org.apache.spark.sql.functions._
    import graft.functions.Multimodal
    val ids = graft.Tables.t(spark, sfDir, "documents").limit(6)
      .select(col("doc_id").as("id"))
      .withColumn("payload",
        udf((id: Long) => JdkCodecs.renderY4m(id)).apply(col("id")))
    val frames = Multimodal.frameSample(ids, everyN = 2).collect()
    frames.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      val plane = r.getAs[Array[Byte]]("frame")
      assert(f % 2 == 0 && f < JdkCodecs.vidFrames(id))
      assert(plane.length == JdkCodecs.vidWidth(id) * JdkCodecs.vidHeight(id))
      assert(JdkCodecs.lumaMean(plane) == JdkCodecs.vidLuma(id, f))
    }
    val perDoc = frames.groupBy(_.getLong(0)).view.mapValues(_.length)
    perDoc.foreach { case (id, n) =>
      assert(n == (JdkCodecs.vidFrames(id) + 1) / 2)
    }
    // a non-Y4M payload still flows through the documented stub slicing
    import graft.SparkSpec.spark.implicits._
    val stub = Multimodal.frameSample(
      Seq((1L, Array.fill[Byte](512)(3))).toDF("id", "payload"),
      everyN = 2, frameBytes = 128).collect()
    assert(stub.length == 2 && stub.forall(_.getAs[Array[Byte]]("frame").length == 128))
  }

  test("lanes run end-to-end on sf0.001 and match their own oracle arithmetic") {
    for ((name, q) <- MediaOps.queries) {
      val rows = q(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name returned no rows")
    }
    val dec = MediaOps.queries("l61_image_decode")(spark, sfDir).collect()
    assert(dec.forall { r =>
      r.getInt(1) == JdkCodecs.imgWidth(r.getLong(0)) &&
        r.getInt(2) == JdkCodecs.imgHeight(r.getLong(0)) && r.getString(3) == "png"
    })
  }

  test("chained mapPartitions survive EliminateSerialization fusion (r12 l19 regression)") {
    // Catalyst fuses adjacent typed maps, handing the downstream lambda
    // the upstream's RAW rows (no encoder round-trip) — so every
    // mapPartitions producer must attach its schema or a by-name getAs
    // downstream throws UNSUPPORTED_CALL.FIELD_INDEX. This chain is the
    // l19 shape distilled: generate payloads → frameSample (by-name
    // reads) → a by-name feature map, COLLECTED.
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.Multimodal
    val pSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val pEnc = ExpressionEncoder(RowEncoder.encoderFor(pSchema))
    val payloads = graft.Tables.t(spark, sfDir, "documents").limit(4)
      .select(col("doc_id").as("id"))
      .mapPartitions { rows =>
        rows.map(r => new GenericRowWithSchema(
          Array(r.getLong(0), JdkCodecs.renderY4m(r.getLong(0))), pSchema): SRow)
      }(pEnc)
    val oSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("plane_bytes", IntegerType, nullable = false)))
    val oEnc = ExpressionEncoder(RowEncoder.encoderFor(oSchema))
    val out = Multimodal.frameSample(payloads, everyN = 2)
      .mapPartitions { rows =>
        rows.map(r => SRow(r.getAs[Long]("id"),
          r.getAs[Array[Byte]]("frame").length))
      }(oEnc).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(1) ==
      JdkCodecs.vidWidth(r.getLong(0)) * JdkCodecs.vidHeight(r.getLong(0))))
  }

  test("parseY4m is total on adversarial headers (never throws)") {
    def bytes(s: String) = s.getBytes("US-ASCII")
    // non-numeric W/H: NumberFormatException class of payloads
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W10x H4\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
    // > Int.MaxValue dimension tag
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W99999999999 H4\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
    // w*h overflows Int (46341^2 > Int.MaxValue): must reject, not
    // throw out of Arrays.copyOfRange on a negative length
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W46341 H46341\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
    // frame bytes exceeding the payload: no frame fits
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W100 H100 C444\nFRAME\n") ++
      Array.fill[Byte](10)(0)).isEmpty)
    // W=Int.MaxValue with C422: (w + 1) wraps negative in Int, so the Int
    // half-width gave frameBytes=-2, slipped past the payload bound, and
    // copyOfRange threw IllegalArgumentException — must reject instead
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W2147483647 H2 C422\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
    // same wrap via the C420 half-height path
    assert(JdkCodecs.parseY4m(bytes("YUV4MPEG2 W2 H2147483647 C420\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
    // 3·w·h overflows LONG at w=h=Int.MaxValue: frameBytesL goes
    // negative and must be rejected by the <=0 guard, not compared
    assert(JdkCodecs.parseY4m(
      bytes("YUV4MPEG2 W2147483647 H2147483647 C444\nFRAME\n") ++
      Array.fill[Byte](60)(0)).isEmpty)
  }
}
