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
}
