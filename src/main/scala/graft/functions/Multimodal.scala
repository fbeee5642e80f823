package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per partition (SURVEY §2.3
  * "multimodal columns"; the puFS blob model §1.4 — payloads are opaque
  * byte blocks, reference core/types.go:10).
  *
  * The actual codec is STUBBED (`FakeDecoder`) — no image/audio libraries
  * exist in this container — but everything Spark-side is real and load-
  * bearing: the schema contract, the mapPartitions batch shape (decoder
  * state initialized once per partition, not per row — exactly how a
  * JNI/FFmpeg handle would be held), and the partition-parallel execution.
  * Swapping FakeDecoder for a real codec changes no plumbing.
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
        Row.fromSeq(r.toSeq ++ Seq(w, h, fmt, ok))
      }
    }(enc)
  }
}
