package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third-decade standing-index serve probe: K=1000 index-side growth —
  * plus the law's second axis, batch-side growth, via
  * `SPARK_GRAFT_SERVE_AXIS=batch` (fixed corpus, batch 1×/10×/100×; see
  * [[batchAxis]]).
  *
  * The serve-scaling claim ("screen/probe cost tracks the arriving
  * batch, not the corpus") has measured evidence at K=10 and K=100
  * (SCALE.md); this main adds the third decade for the six idx serve
  * lanes ONLY — the steady-state 100 TB cost — keeping the probe batch
  * pinned to base-replica ids while the index side grows 1000×.
  *
  * Generation rides the existing x100 dir (ScaleBench machinery) instead
  * of unioning 1000 branches into one plan: ten key-shifted copies of
  * the x100 tables, shift = i·100·Off so copy i's replica j lands at
  * key (j + 100·i)·Off — exactly the id layout a direct x1000 run would
  * produce. Document text is re-salted per copy with a second per-token
  * marker (`~~i`), the same densification discipline as ScaleBench's
  * first-level salt: without it every copy pair would share ALL its
  * shingles and the probe would measure a synthetic 10× duplication no
  * true scale-up has. Only `documents` and `embeddings` are generated —
  * the only tables the serve lanes touch — which bounds generation and
  * build cost (5M docs / 2M vectors from the sf0.1 base).
  *
  *   SPARK_GRAFT_SF_DIR        base dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_SCALE_FROM    pre-scaled dir (default /tmp/graft_scale_x100)
  *   SPARK_GRAFT_SERVE_DIR     output (default /tmp/graft_scale_x1000)
  *
  * Prints ONE JSON line:
  *   {"metric":"serve_scale_ratio_mean","value":…,"k":1000,
  *    "base":{lane:sec…},"scaled":{lane:sec…},"ratio_per_k":{lane:r…}}
  */
object ServeScaleProbe {

  private val FromK = 100
  private val Copies = 10

  private[graft] def generateFromX100(spark: SparkSession, from: String,
      out: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def copies(name: String, key: String,
        tweak: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) = {
      val src = spark.read.parquet(s"$from/$name.parquet")
      (0 until Copies).map { i =>
        tweak(src.withColumn(key,
          col(key) + lit(i.toLong * FromK * ScaleBench.Off)), i)
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    copies("documents", "doc_id",
      (d, i) => if (i == 0) d
        else d.withColumn("text", concat(
          regexp_replace(col("text"), " ", s"~~$i "), lit(s"~~$i"))))
    copies("embeddings", "vec_id", (d, _) => d)
  }

  /** The serve law's SECOND axis (VERDICT r10 #6): fixed corpus, bursty
    * batch. Times every idx_ lane at batch multipliers 1×/10×/100×
    * against one ScaleBench-generated corpus dir and reports each
    * lane's per-X ratio — batch-linear lanes sit at ~1, and a
    * pair-verify term going super-linear WITHIN a batch would show as a
    * rising ratio at 100×. One JSON line:
    *   {"metric":"serve_batch_scale","batch_xs":[1,10,100],
    *    "lanes":{name:[sec,…]},"ratio_per_x":{name:[r10,r100]}} */
  private def batchAxis(spark: SparkSession, corpus: String): Unit = {
    val marker = java.nio.file.Paths.get(corpus, "_SCALE_DONE")
    require(java.nio.file.Files.exists(marker),
      s"$corpus must be a completed ScaleBench dir (run ScaleBench first)")
    // The corpus holds K replica shards (K is recorded in the marker); a
    // batch multiplier above K would silently slice only the K available
    // shards — the "100x" cell would time a Kx batch and report a
    // spurious sub-linear ratio. Fail fast instead of mis-measuring.
    val corpusK = new String(java.nio.file.Files.readAllBytes(marker)).trim.toInt
    val bxs = sys.env.getOrElse("SPARK_GRAFT_SERVE_BATCH_XS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    require(bxs.max <= corpusK,
      s"batch multipliers $bxs exceed corpus K=$corpusK ($corpus holds only " +
        s"$corpusK replica shards; regenerate with ScaleBench K>=${bxs.max})")
    val only = sys.env.get("SPARK_GRAFT_SERVE_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    def suite(bx: Int) = Bench.serveLanes(bx).filter { case (n, _) =>
      only.isEmpty || only(n)
    }
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, corpus).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // localCheckpoint blocks are freed only when the ContextCleaner
      // sees their RDDs GC'd; without this nudge, 8 index builds + ~70
      // timed runs at x100 scale accumulated ~45 GB of dead blocks in
      // the block manager and filled the disk mid-probe (observed r13).
      // Outside the timed region, so it costs the measurement nothing.
      System.gc()
      secs
    }
    // warmup pays the one-time index builds (ServeIndexes caches per
    // dir) + JIT; then 2 timed sweeps per (lane, batchX), min
    for (bx <- bxs; (name, fn) <- suite(bx))
      try timeOne(fn)
      catch { case e: Throwable =>
        System.err.println(s"[serve-batch] warmup $name@x$bx: ${e.getMessage}")
      }
    val times = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (_ <- 1 to 2; bx <- bxs; (name, fn) <- suite(bx)) {
      try {
        val s = timeOne(fn)
        times((name, bx)) = math.min(times.getOrElse((name, bx), Double.MaxValue), s)
      } catch { case _: Throwable => failed += s"$name@x$bx" }
    }
    val laneNames = suite(1).map(_._1)
    val lanesJson = laneNames.map { n =>
      "\"" + n + "\":[" + bxs.map(bx =>
        times.get((n, bx)).map(v => f"$v%.3f").getOrElse("null"))
        .mkString(",") + "]"
    }.mkString("{", ",", "}")
    // per-X ratio vs the 1× cell, normalized by X: ~1 = batch-linear
    val ratioJson = laneNames.map { n =>
      val b1 = times.get((n, bxs.head))
      "\"" + n + "\":[" + bxs.tail.map { bx =>
        (b1, times.get((n, bx))) match {
          case (Some(a), Some(b)) if a > 0 => f"${b / a / (bx.toDouble / bxs.head)}%.3f"
          case _ => "null"
        }
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"serve_batch_scale","corpus":"$corpus","corpus_k":$corpusK,"batch_xs":${bxs.mkString("[", ",", "]")},"lanes":$lanesJson,"ratio_per_x":$ratioJson,"failed":$failedJson}""")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val from = sys.env.getOrElse("SPARK_GRAFT_SCALE_FROM", "/tmp/graft_scale_x100")
    val out = sys.env.getOrElse("SPARK_GRAFT_SERVE_DIR", "/tmp/graft_scale_x1000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (sys.env.getOrElse("SPARK_GRAFT_SERVE_AXIS", "corpus") == "batch") {
      batchAxis(spark,
        sys.env.getOrElse("SPARK_GRAFT_SERVE_CORPUS", from))
      spark.stop()
      return
    }

    val fromMarker = java.nio.file.Paths.get(from, "_SCALE_DONE")
    require(java.nio.file.Files.exists(fromMarker) &&
      new String(java.nio.file.Files.readAllBytes(fromMarker)).trim == FromK.toString,
      s"$from must be a completed K=$FromK ScaleBench dir (run ScaleBench first)")
    val done = java.nio.file.Paths.get(out, "_SERVE_SCALE_DONE")
    if (!java.nio.file.Files.exists(done)) {
      generateFromX100(spark, from, out)
      java.nio.file.Files.write(done, (FromK * Copies).toString.getBytes)
    }

    val only = sys.env.get("SPARK_GRAFT_SERVE_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val suite = Bench.headline.filter { case (n, _) =>
      n.startsWith("idx_") && (only.isEmpty || only(n))
    }
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        d: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc() // reap dead localCheckpoint blocks (see batchAxis note)
      secs
    }
    // warmup sweep pays the index builds (ServeIndexes caches per dir);
    // then 2 timed sweeps, min per dir — ScaleBench's exact protocol
    suite.foreach { case (name, fn) =>
      try { timeOne(fn, base); timeOne(fn, out) }
      catch { case e: Throwable =>
        System.err.println(s"[serve-probe] warmup $name: ${e.getMessage}")
      }
    }
    val baseT = scala.collection.mutable.LinkedHashMap[String, Double]()
    val scaleT = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (_ <- 1 to 2; (name, fn) <- suite) {
      try {
        val b = timeOne(fn, base)
        baseT(name) = math.min(baseT.getOrElse(name, Double.MaxValue), b)
        val s = timeOne(fn, out)
        scaleT(name) = math.min(scaleT.getOrElse(name, Double.MaxValue), s)
      } catch { case _: Throwable => failed += name }
    }
    def jm(m: scala.collection.Map[String, Double]): String =
      m.map { case (q, v) => "\"" + q + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val k = FromK * Copies
    val ratios = baseT.collect {
      case (q, b) if b > 0 && scaleT.contains(q) => q -> scaleT(q) / b / k
    }
    val mean = if (ratios.isEmpty) -1.0 else ratios.values.sum / ratios.size
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"serve_scale_ratio_mean","value":$mean%.4f,"unit":"x_per_k","k":$k,"base":${jm(baseT)},"scaled":${jm(scaleT)},"ratio_per_k":${jm(ratios)},"failed":$failedJson}""")
    spark.stop()
  }
}
