package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per partition (SURVEY §2.3
  * "multimodal columns"; the puFS blob model §1.4 — payloads are opaque
  * byte blocks, reference core/types.go:10).
  *
  * Codecs: images and audio are REAL via [[JdkCodecs]] (ImageIO /
  * javax.sound — see [[JdkImageDecoder]] for the Decoder-seam form),
  * and video demuxing is REAL for YUV4MPEG2 ([[JdkCodecs.parseY4m]],
  * used by [[frameSample]]). `FakeDecoder` remains the documented stub
  * for payloads with no JVM codec (mp4/webm/jpeg2000 …): the schema
  * contract, the mapPartitions batch shape (decoder state initialized
  * once per partition, not per row — exactly how a JNI/FFmpeg handle
  * would be held), and the partition-parallel execution are identical
  * on both paths.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("ok", BooleanType)))

  /** Deterministic stand-in for an image decoder: derives fake dimensions
    * from the payload hash; a real implementation would parse the header. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, String, Boolean)
  }

  object FakeDecoder extends Decoder {
    def decode(payload: Array[Byte]): (Int, Int, String, Boolean) = {
      if (payload == null || payload.isEmpty) (0, 0, "empty", false)
      else {
        val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
        val w = ((md(0) & 0x7f) << 8 | (md(1) & 0xff)) % 4096 + 1
        val h = ((md(2) & 0x7f) << 8 | (md(3) & 0xff)) % 4096 + 1
        val fmt = if ((md(4) & 1) == 0) "png" else "jpeg"
        (w, h, fmt, true)
      }
    }
  }

  /** Decode a binary column into a metadata struct, one decoder instance
    * per partition. Input must have columns (id: LONG, payload: BINARY);
    * output adds (width, height, format, ok). */
  def decodeMeta(df: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ metaSchema.fields)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      // per-partition init: a real codec opens its native handle HERE
      val d = decoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, fmt, ok) = d.decode(payload)
        // rows here may be handed RAW to a fused downstream typed map
        // (EliminateSerialization skips the encoder between adjacent
        // mapPartitions), so every producer in this object attaches the
        // schema — by-name getAs on a schemaless GenericRow throws.
        new GenericRowWithSchema(
          (r.toSeq ++ Seq(w, h, fmt, ok)).toArray, outSchema): Row
      }
    }(enc)
  }

  /** Feature extraction: payload → dim-float embedding (the CLIP-embed
    * slot of a multimodal pipeline). STUBBED to a deterministic
    * hash-derived unit-ish vector; the contract — BINARY in,
    * ArrayType(FloatType) out, batched per partition, composable with the
    * ANN/near-dup operators downstream — is the real deliverable. */
  def featureExtract(df: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType), nullable = false))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256") // per-partition handle
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.empty[Byte])
        val vec = new Array[Float](dim)
        // one digest per 32-component block — digest() RESETS the engine,
        // so calling it per component would hash the empty message for
        // every i not straight after an update(): 62 of 64 components
        // were payload-independent constants
        var block = Array.emptyByteArray
        var i = 0
        while (i < dim) {
          if (i % 32 == 0) {
            md.reset(); md.update(payload); md.update(i.toByte)
            block = md.digest()
          }
          vec(i) = ((block(i % 32) & 0xff) - 128) / 128.0f
          i += 1
        }
        new GenericRowWithSchema((r.toSeq :+ vec.toSeq).toArray, outSchema): Row
      }
    }(enc)
  }

  /** Frame sampling: one video payload → every Nth frame as its own
    * binary row (id, frame_idx, frame). REAL for YUV4MPEG2 payloads
    * since round 12 — [[JdkCodecs.parseY4m]] demuxes the container
    * (header, FRAME boundaries, plane extents) and each emitted frame
    * is the decoded luma plane; other containers (mp4/webm — the JDK
    * has no entropy-coded demuxer) fall back to the documented
    * fixed-stride slicing stub. The 1→N generator shape, the per-
    * partition decode, and the downstream BINARY contract are identical
    * on both paths, which is the point: swapping in a JNI demuxer for
    * the remaining containers changes no plumbing. */
  def frameSample(df: DataFrame, everyN: Int = 2, frameBytes: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Long]("id")
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.empty[Byte])
        def frameRow(f: Int, bytes: Array[Byte]): Row =
          new GenericRowWithSchema(Array(id, f, bytes), outSchema)
        JdkCodecs.parseY4m(payload) match {
          case Some(v) =>
            (0 until v.frames.length by everyN).iterator.map { f =>
              frameRow(f, v.frames(f))
            }
          case None =>
            val nFrames = payload.length / frameBytes
            (0 until nFrames by everyN).iterator.map { f =>
              frameRow(f, java.util.Arrays.copyOfRange(
                payload, f * frameBytes, (f + 1) * frameBytes))
            }
        }
      }
    }(enc)
  }

  /** Resize: payload → payload' with updated metadata (aspect-preserving
    * cap at maxDim). The stub re-hashes content into the new identity;
    * a real impl transcodes. Shape: BINARY→BINARY column map. */
  def resizeStub(df: DataFrame, maxDim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { rows =>
      val d = FakeDecoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, _, ok) = d.decode(payload)
        val scale = if (ok && math.max(w, h) > maxDim)
          maxDim.toDouble / math.max(w, h) else 1.0
        new GenericRowWithSchema((r.toSeq ++ Seq(
          math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt))).toArray, outSchema): Row
      }
    }(enc)
  }
}
