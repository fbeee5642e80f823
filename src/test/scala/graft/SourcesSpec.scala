package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Source/sink inventory (SURVEY §2.3 "Sources / sinks"): CSV and JSON
  * scans round-trip against the parquet ground truth; binaryFile reads
  * whole objects as opaque blocks (B4 analog); parquet/csv sinks write
  * readable output; multimodal decode plumbing runs per-partition. */
class SourcesSpec extends SparkSpec {

  private lazy val outRoot = Files.createTempDirectory("sources-spec").toString

  test("csv sink + scan round-trips nation") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val p = s"$outRoot/nation_csv"
    nation.write.mode("overwrite").option("header", "true").csv(p)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(p)
    assert(back.count() == nation.count())
    val a = back.select("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val b = nation.select("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(a == b)
  }

  test("json sink + scan round-trips region") {
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val p = s"$outRoot/region_json"
    region.write.mode("overwrite").json(p)
    val back = spark.read.json(p)
    assert(back.count() == region.count())
    assert(back.select("r_name").orderBy("r_name").collect().map(_.getString(0)).toSeq ==
      region.select("r_name").orderBy("r_name").collect().map(_.getString(0)).toSeq)
  }

  test("parquet sink round-trips with schema") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100)
    val p = s"$outRoot/li_pq"
    li.write.mode("overwrite").parquet(p)
    val back = spark.read.parquet(p)
    assert(back.schema == li.schema)
    assert(back.count() == 100)
  }

  test("orc sink + scan round-trips lineitem slice with schema intact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .limit(500)
    val p = s"$outRoot/li_orc"
    li.write.mode("overwrite").orc(p)
    val back = spark.read.orc(p)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head().getDouble(0) ==
      li.agg(sum("l_quantity")).head().getDouble(0))
  }

  test("text sink + scan round-trips one line per document") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("value"))
      .limit(200)
    val p = s"$outRoot/docs_txt"
    docs.write.mode("overwrite").text(p)
    val back = spark.read.text(p)
    assert(back.count() == docs.count())
    assert(back.orderBy("value").collect().map(_.getString(0)).toSeq ==
      docs.orderBy("value").collect().map(_.getString(0)).toSeq)
  }

  test("csv scan surfaces malformed rows as _corrupt_record, keeps the rest") {
    // PERMISSIVE ingestion: dirty rows must not kill the 100 TB job, and
    // must stay attributable for a quarantine pass
    val dir = Files.createTempDirectory("graft-badcsv").toString
    Files.write(Paths.get(dir, "part.csv"),
      "1,alpha,10.5\n2,beta,not-a-number\n3,gamma,7.25\n".getBytes)
    val df = spark.read
      .schema("id BIGINT, name STRING, score DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized frame
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("_corrupt_record")
      .contains("not-a-number"))
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.agg(sum("score")).collect()(0).getDouble(0) == 17.75)
    df.unpersist()
    ()
  }

  test("parquet schema evolution: mergeSchema unifies widened batches") {
    // a long-lived table gains columns over time; readers must see the
    // union schema with nulls for pre-widening files
    import graft.SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "quality"))
    assert(merged.count() == 4)
    assert(merged.filter(col("quality").isNull).count() == 2,
      "pre-widening rows must read as null quality")
  }

  test("binaryFile scan reads whole objects as opaque blocks") {
    val dir = Files.createTempDirectory("binf").toString
    Files.write(Paths.get(dir, "a.bin"), Array.tabulate(1000)(_.toByte))
    Files.write(Paths.get(dir, "b.bin"), "hello".getBytes)
    val df = spark.read.format("binaryFile").load(dir)
    val rows = df.select("path", "length", "content")
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]]("content"))).sortBy(_._1).toSeq
    assert(rows.map(x => (x._1, x._2)) == Seq(("a.bin", 1000L), ("b.bin", 5L)))
    assert(new String(rows(1)._3) == "hello")
  }

  test("multimodal decodeMeta runs per partition with stable fake dims") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"))
      .repartition(4)
    val out = graft.functions.Multimodal.decodeMeta(docs)
    assert(out.schema.fieldNames.toSeq ==
      Seq("id", "payload", "width", "height", "format", "ok"))
    val n = out.count()
    assert(n == docs.count())
    assert(out.filter(col("ok")).count() == n, "all payloads decode")
    assert(out.filter(col("width").between(1, 4096) &&
      col("height").between(1, 4096)).count() == n)
    // determinism: same payload -> same fake dims on a second run
    val one = out.filter(col("id") === 0).select("width", "height").head()
    val two = graft.functions.Multimodal.decodeMeta(docs)
      .filter(col("id") === 0).select("width", "height").head()
    assert(one == two)
  }

  test("multimodal frame-sample explodes every Nth frame with exact slices") {
    import graft.SparkSpec.spark.implicits._
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val df = Seq((1L, payload)).toDF("id", "payload").repartition(2)
    val frames = graft.functions.Multimodal.frameSample(df, everyN = 2, frameBytes = 256)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]]("frame")))
      .sortBy(_._1)
    // 1000/256 = 3 frames, every 2nd -> indices 0, 2
    assert(frames.map(_._1).toSeq == Seq(0, 2))
    assert(java.util.Arrays.equals(frames(0)._2,
      java.util.Arrays.copyOfRange(payload, 0, 256)))
    assert(java.util.Arrays.equals(frames(1)._2,
      java.util.Arrays.copyOfRange(payload, 512, 768)))
  }

  test("multimodal featureExtract emits deterministic fixed-dim embeddings") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq((1L, "abc".getBytes), (2L, "abc".getBytes), (3L, "xyz".getBytes))
      .toDF("id", "payload").repartition(3)
    val out = graft.functions.Multimodal.featureExtract(df, dim = 64)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Float](2)).toMap
    assert(out.values.forall(_.length == 64))
    assert(out(1L) == out(2L), "same payload must embed identically")
    assert(out(1L) != out(3L), "different payloads must differ")
    assert(out(1L).forall(v => v >= -1.0f && v <= 1.0f))
    // EVERY 32-component block must be payload-dependent — a digest()
    // call per component (which resets the engine) once made 62 of 64
    // components the constant sha256("") and vec(1..31) == vec(33..63)
    val (a, b) = (out(1L), out(3L))
    assert((1 until 32).exists(i => a(i) != b(i)),
      "components 1-31 are payload-independent — digest misuse regressed")
    assert((33 until 64).exists(i => a(i) != b(i)),
      "components 33-63 are payload-independent — digest misuse regressed")
    assert(a.slice(1, 32) != a.slice(33, 64),
      "block 0 and block 1 must differ (the i.toByte domain separator)")
  }

  test("multimodal resize caps the longer side and preserves aspect") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq((1L, "some image bytes".getBytes)).toDF("id", "payload")
    val r = graft.functions.Multimodal.resizeStub(df, maxDim = 64).head()
    val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
    assert(math.max(w, h) <= 64 && w >= 1 && h >= 1)
  }

  test("l19 multimodal pipeline decodes all three modalities per doc") {
    val out = graft.operators.MediaOps.queries("l19_multimodal_pipeline")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("img_format") == "png")
      assert(r.getAs[Int]("img_w") == graft.functions.JdkCodecs.imgWidth(id))
      assert(r.getAs[Long]("wav_frames") ==
        graft.functions.JdkCodecs.wavSamples(id).toLong)
      assert(r.getAs[Int]("vid_plane_bytes") ==
        graft.functions.JdkCodecs.vidWidth(id) *
          graft.functions.JdkCodecs.vidHeight(id))
      assert(r.getAs[Long]("vid_sampled") ==
        (graft.functions.JdkCodecs.vidFrames(id) + 1) / 2)
    }
  }
}
