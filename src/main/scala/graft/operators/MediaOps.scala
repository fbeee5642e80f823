package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t
import graft.functions.JdkCodecs

/** REAL multimodal codec lanes (SURVEY §2.3 "multimodal columns" — the
  * decode / resize / feature-extract stages, previously stubbed).
  *
  * The trick that makes a real codec ORACLE-checkable with a SQL engine
  * that cannot decode PNG: each lane *generates* its media from table
  * keys with pinned arithmetic ([[JdkCodecs.imgWidth]] etc.), runs the
  * REAL decoder over the real bytes, and emits what the decoder parsed.
  * DuckDB recomputes the expected values from the key arithmetic alone —
  * so the lane hash-matches iff `decode(encode(f(id))) == f(id)` held on
  * every row, i.e. iff the codec actually round-tripped real PNG/WAVE
  * payloads. A header mis-parse, a resample that lands on the wrong
  * target box, or a RIFF layout bug each breaks the hash.
  *
  * Scale shape: the decode lanes are per-row kernels under
  * mapPartitions — no shuffle, no driver state, embarrassingly
  * parallel — followed only by the driver-protocol orderBy. At 100 TB
  * this is the decode stage of a media curation pipeline: scan →
  * decode/resize → embedding/near-dup, with the codec cost scaling with
  * rows/executor. l64 then closes that pipeline END-TO-END: real decoded
  * pixels → resize-stable perceptual hash ([[JdkCodecs.avgHash64]]) →
  * the SAME banded Hamming screen the text crawl serves
  * (LlmOps.simhash64BandScreen), with planted real-resize near-dups
  * flowing through — oracled via an engine-emitted signature fixture
  * replayed brute-force in DuckDB (the l54w discipline). The remaining
  * sub-lane property (grayFeature resize invariance) stays pinned in
  * MediaOpsSpec because DuckDB cannot decode pixels.
  */
object MediaOps {

  type Q = (SparkSession, String) => DataFrame

  /** Render the deterministic PNG for each doc_id, then decode it for real. */
  private def pngOf(id: Long): Array[Byte] = JdkCodecs.renderPng(id)

  val queries: Map[String, Q] = Map(
    // L61: image metadata decode — real ImageIO header parse (format
    // sniff + dims, no pixel decode: the cheap catalog pass).
    "l61_image_decode" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("format", StringType, nullable = false)))
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
      docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, fmt, _) = JdkCodecs.decodeDims(pngOf(id))
          Row(id, w, h, fmt)
        }
      }(enc).orderBy("doc_id")
    }),

    // L62: real resize — decode pixels, resample to maxDim=40 with
    // SCALE_SMOOTH, re-encode PNG, then re-DECODE the produced bytes;
    // out_w/out_h come from the second decode, so they certify the
    // resampled image really has the target geometry.
    "l62_image_resize" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("in_w", IntegerType, nullable = false),
        StructField("in_h", IntegerType, nullable = false),
        StructField("out_w", IntegerType, nullable = false),
        StructField("out_h", IntegerType, nullable = false)))
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
      docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val png = pngOf(id)
          val (iw, ih, _, _) = JdkCodecs.decodeDims(png)
          val (outBytes, _, _) = JdkCodecs.resizePng(png, maxDim = 40)
          val (ow, oh, _, _) = JdkCodecs.decodeDims(outBytes)
          Row(id, iw, ih, ow, oh)
        }
      }(enc).orderBy("doc_id")
    }),

    // L64: image near-dup — REAL pixels end-to-end: render PNG, decode,
    // 64-bit average-hash (the classic aHash), then the SAME 4×16-band
    // Hamming screen the text crawl uses (LlmOps.simhash64BandScreen —
    // radius-3 pigeonhole completeness and the bit_count verify are
    // shared code, so image and text near-dup cannot drift). Every 5th
    // doc also contributes a REALLY-resized copy (decode → SCALE_SMOOTH
    // to maxDim 64 → re-encode → re-decode → hash) at doc_id + 10^7 —
    // aHash is resize-stable, so those planted pairs flow through the
    // screen as the near-duplicates a media curation pass must catch.
    // Oracle: generated like l54w's — the engine-emitted (doc_id, ahash)
    // fixture is replayed as an UNSCREENED brute-force Hamming join in
    // DuckDB, so band completeness over hashes of real decoded pixels is
    // driver-checked row-for-row.
    "l64_image_neardup" -> ((s, d) =>
      graft.operators.LlmOps.simhash64BandScreen(
        s.read.parquet(AHashSigs.fixture(s, d)))
        .orderBy(col("a"), col("b"))),

    // L65: real video demux — YUV4MPEG2 (the mjpegtools/ffmpeg raw
    // interchange container: public spec, no entropy coding — the one
    // container a pure JVM can demux honestly). Each doc renders a real
    // Y4M stream (key-pinned geometry + constant-Y frames + noise U/V
    // planes), JdkCodecs.parseY4m demuxes it, every 2nd frame is
    // sampled, and each sampled frame emits its decoded mean luminance.
    // The oracle recomputes every field from the key arithmetic —
    // a frame-boundary or plane-extent bug desynchronizes the stream
    // and reads U/V noise as luma, failing the hash.
    "l65_video_y4m" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("frame_idx", IntegerType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_frames", LongType, nullable = false),
        StructField("y_mean", IntegerType, nullable = false)))
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
      docs.mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          // flatMap over the Option keeps the lane total — parseY4m's
          // contract is "never throws", and this call site shouldn't be
          // the one place a malformed stream could still kill a task
          JdkCodecs.parseY4m(JdkCodecs.renderY4m(id)).iterator.flatMap { v =>
            (0 until v.frames.length by 2).iterator.map { f =>
              Row(id, f, v.width, v.height, v.frames.length.toLong,
                JdkCodecs.lumaMean(v.frames(f)))
            }
          }
        }
      }(enc).orderBy("doc_id", "frame_idx")
    }),

    // L19 (rebuilt on the real codecs, round 12 — previously the
    // FakeDecoder no-oracle lane): the multimodal batch pipeline
    // composed end-to-end as DATAFRAME STAGES, all three modalities
    // real — image header decode through the Multimodal.Decoder seam
    // (JdkImageDecoder/ImageIO), audio through javax.sound, video
    // through Multimodal.frameSample's REAL Y4M demux path → per-frame
    // luma feature → per-doc aggregate → 3-way join. Every output field
    // is key-arithmetic, so the whole composition is oracle-checked.
    "l19_multimodal_pipeline" -> ((s, d) => {
      import graft.functions.{JdkImageDecoder, Multimodal}
      val ids = t(s, d, "documents").select(col("doc_id").as("id"))
      val pSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val pEnc = ExpressionEncoder(RowEncoder.encoderFor(pSchema))
      // GenericRowWithSchema, not a bare Row: Catalyst's
      // EliminateSerialization fuses adjacent typed maps, so the NEXT
      // mapPartitions lambda receives these rows verbatim (no encoder
      // round-trip) and reads them by field name — a schemaless
      // GenericRow throws UNSUPPORTED_CALL.FIELD_INDEX there (r12 bug).
      def withPayload(mk: Long => Array[Byte]): DataFrame =
        ids.mapPartitions { rows =>
          rows.map(r => new GenericRowWithSchema(
            Array(r.getLong(0), mk(r.getLong(0))), pSchema): Row)
        }(pEnc)
      // image stage: REAL header decode via the Decoder seam
      val img = Multimodal.decodeMeta(
          withPayload(JdkCodecs.renderPng), JdkImageDecoder)
        .select(col("id"), col("width").as("img_w"),
          col("height").as("img_h"), col("format").as("img_format"))
      // audio stage: REAL RIFF/WAVE decode
      val wSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("wav_rate", IntegerType, nullable = false),
        StructField("wav_frames", LongType, nullable = false)))
      val wEnc = ExpressionEncoder(RowEncoder.encoderFor(wSchema))
      val wav = withPayload(JdkCodecs.renderWav).mapPartitions { rows =>
        rows.map { r =>
          val (rate, _, frames, _) =
            JdkCodecs.decodeWavMeta(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), rate, frames)
        }
      }(wEnc)
      // video stage: REAL Y4M demux (frameSample's Y4M path), per-frame
      // luma feature, per-doc aggregate
      val frames = Multimodal.frameSample(
        withPayload(JdkCodecs.renderY4m), everyN = 2)
      val fSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("plane_bytes", IntegerType, nullable = false),
        StructField("y_mean", IntegerType, nullable = false)))
      val fEnc = ExpressionEncoder(RowEncoder.encoderFor(fSchema))
      val feats = frames.mapPartitions { rows =>
        rows.map { r =>
          val fr = r.getAs[Array[Byte]]("frame")
          Row(r.getLong(0), fr.length, JdkCodecs.lumaMean(fr))
        }
      }(fEnc)
      val vid = feats.groupBy("id").agg(
        count(lit(1)).as("vid_sampled"),
        min(col("plane_bytes")).as("vid_plane_bytes"),
        sum(col("y_mean")).cast("long").as("vid_y_sum"))
      img.join(wav, "id").join(vid, "id")
        .select(col("id").as("doc_id"), col("img_w"), col("img_h"),
          col("img_format"), col("wav_rate"), col("wav_frames"),
          col("vid_sampled"), col("vid_plane_bytes"), col("vid_y_sum"))
        .orderBy("doc_id")
    }),

    // L63: real audio decode — hand-rolled canonical RIFF/WAVE PCM16
    // encode, decoded back through javax.sound.sampled; rate/channels/
    // frame-count come from the decoder, total bytes from the payload.
    "l63_audio_wav" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false),
        StructField("n_frames", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false)))
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
      docs.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val wav = JdkCodecs.renderWav(id)
          val (rate, ch, frames, _) = JdkCodecs.decodeWavMeta(wav)
          Row(id, rate, ch, frames, wav.length.toLong)
        }
      }(enc).orderBy("doc_id")
    }))

  /** Engine-emitted aHash fixture backing the l64 oracle — the L54wSigs
    * discipline (LlmOps.scala): ImageIO has no DuckDB twin, so the lane
    * writes the (doc_id, simhash=aHash64) table it computed from real
    * decoded pixels to parquet, serves the band screen from those files,
    * and the generated oracle replays the unscreened brute-force Hamming
    * join over the SAME files. Lazy cell per (process, corpus dir),
    * built outside the CHM bin lock. */
  private[graft] object AHashSigs {
    private final class Cell(mk: => String) { lazy val dir: String = mk }
    private val built =
      new java.util.concurrent.ConcurrentHashMap[String, Cell]()
    /** Fixture path for the generated oracle SQL — resolved per the
      * ACTIVE verify dir (see [[OracleDir]]). */
    private[graft] def forOracle: Option[String] =
      OracleDir.select(built).map(_.dir)
    def fixture(s: SparkSession, d: String): String =
      built.computeIfAbsent(d, _ => new Cell({
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ahash-sigs").toString
        val schema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("simhash", LongType, nullable = false)))
        val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
        t(s, d, "documents").select(col("doc_id"))
          .mapPartitions { rows =>
            rows.flatMap { r =>
              val id = r.getLong(0)
              val png = JdkCodecs.renderPng(id)
              val orig = Row(id, JdkCodecs.avgHash64(png))
              if (id % 5 == 0) {
                // maxDim 64: ~70% of the corpus genuinely resamples
                // (the rest is within bounds and passes through — the
                // identical-bytes trivial dup, also a real case); the
                // aHash of a true resample stays within the screen's
                // radius for ~3 in 4 images (measured, see MediaOpsSpec)
                val (rs, _, _) = JdkCodecs.resizePng(png, maxDim = 64)
                Seq(orig, Row(id + 10000000L, JdkCodecs.avgHash64(rs)))
              } else Seq(orig)
            }
          }(enc)
          .write.mode("overwrite").parquet(dir)
        dir
      })).dir
  }

  def oracleSql: Map[String, String] = staticOracleSql ++
    AHashSigs.forOracle.map { p =>
      "l64_image_neardup" ->
        s"""WITH sh AS (
           |  SELECT doc_id, simhash FROM read_parquet('$p/*.parquet'))
           |SELECT x.doc_id AS a, y.doc_id AS b,
           |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
           |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
           |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
           |ORDER BY a, b""".stripMargin
    }

  private val staticOracleSql: Map[String, String] = Map(
    "l61_image_decode" ->
      """SELECT doc_id,
        |       CAST((doc_id % 97) + 16 AS INT) AS width,
        |       CAST(((doc_id * 7) % 83) + 16 AS INT) AS height,
        |       'png' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // out dims: aspect-preserving integer floor to maxDim=40; `//` is
    // DuckDB integer (floor) division, matching Scala's positive-int `/`
    "l62_image_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST((doc_id % 97) + 16 AS INT) AS w,
        |         CAST(((doc_id * 7) % 83) + 16 AS INT) AS h
        |  FROM documents)
        |SELECT doc_id, w AS in_w, h AS in_h,
        |       CAST(CASE WHEN GREATEST(w, h) <= 40 THEN w
        |            ELSE GREATEST(1, (w * 40) // GREATEST(w, h)) END AS INT) AS out_w,
        |       CAST(CASE WHEN GREATEST(w, h) <= 40 THEN h
        |            ELSE GREATEST(1, (h * 40) // GREATEST(w, h)) END AS INT) AS out_h
        |FROM dims ORDER BY doc_id""".stripMargin,

    "l63_audio_wav" ->
      """SELECT doc_id,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST((doc_id % 1000) + 100 AS BIGINT) AS n_frames,
        |       CAST(44 + 2 * ((doc_id % 1000) + 100) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // every 2nd frame of nf = (id%7)+4 frames; y_mean of frame f is the
    // constant luma (id*31 + f*17) % 251 the encoder painted
    "l65_video_y4m" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         CAST((doc_id % 31) + 8 AS INT) AS w,
        |         CAST(((doc_id * 5) % 29) + 8 AS INT) AS h,
        |         CAST((doc_id % 7) + 4 AS INT) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |         unnest(range(0, CAST(nf AS BIGINT), 2)) AS fr
        |  FROM v)
        |SELECT doc_id, CAST(fr AS INT) AS frame_idx, w AS width,
        |       h AS height, CAST(nf AS BIGINT) AS n_frames,
        |       CAST((doc_id * 31 + fr * 17) % 251 AS INT) AS y_mean
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "l19_multimodal_pipeline" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         CAST((doc_id % 97) + 16 AS INT) AS img_w,
        |         CAST(((doc_id * 7) % 83) + 16 AS INT) AS img_h,
        |         CAST((doc_id % 31) + 8 AS INT) AS vw,
        |         CAST(((doc_id * 5) % 29) + 8 AS INT) AS vh,
        |         CAST((doc_id % 7) + 4 AS INT) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(range(0, CAST(nf AS BIGINT), 2)) AS fr
        |  FROM v),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS vid_sampled,
        |         SUM((doc_id * 31 + fr * 17) % 251) AS vid_y_sum
        |  FROM f GROUP BY doc_id)
        |SELECT v.doc_id, v.img_w, v.img_h, 'png' AS img_format,
        |       CAST(8000 AS INT) AS wav_rate,
        |       CAST((v.doc_id % 1000) + 100 AS BIGINT) AS wav_frames,
        |       CAST(agg.vid_sampled AS BIGINT) AS vid_sampled,
        |       CAST(v.vw * v.vh AS INT) AS vid_plane_bytes,
        |       CAST(agg.vid_y_sum AS BIGINT) AS vid_y_sum
        |FROM v JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)

  /** (doc_id, simhash = aHash64 of the REAL decoded pixels) for every id
    * in `ids` — the signature kernel behind the standing image near-dup
    * index (idx_image_screen): render → ImageIO decode → 8×8 aHash.
    * `resizeMaxDim > 0` hashes the REALLY-resized copy instead (decode →
    * SCALE_SMOOTH → re-encode → re-decode → hash), the arriving-batch
    * form whose planted pairs the screen must catch; `idShift` keeps
    * batch ids disjoint from corpus ids. Output is schema-compatible
    * with SimHashIndex sigs/, so image signatures ride the SAME
    * band-partitioned standing index as text SimHash64. */
  private[graft] def aHashSigsOf(ids: DataFrame, resizeMaxDim: Int = 0,
      idShift: Long = 0L): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("simhash", LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val png = JdkCodecs.renderPng(id)
        val payload =
          if (resizeMaxDim <= 0) png
          else JdkCodecs.resizePng(png, maxDim = resizeMaxDim)._1
        Row(id + idShift, JdkCodecs.avgHash64(payload))
      }
    }(enc)
  }
}
