package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Sidecar refit-policy measurement (VERDICT r14 #5): the routed ANN
  * arm extends its IVFPQ sidecar under FROZEN quantizers (the FAISS add
  * contract) — correct for bounded drift, but after appends ≫ the
  * fitted corpus the centroids/codebooks describe a minority of the
  * data and routed recall can decay silently. This probe measures that
  * decay: build on a clusterless corpus of n, append 4n drawn from a
  * SHIFTED distribution (mean-shifted unit Gaussians — the fitted
  * centroids sit off the appended population's center), and serve the
  * same shifted-population probe batch from (a) the frozen-quantizer
  * sidecar and (b) a fresh fit over the merged corpus — i.e. exactly
  * what a refit-at-N× policy would produce.
  *
  *   SPARK_GRAFT_DRIFT_N       fitted corpus size (default 200000)
  *   SPARK_GRAFT_DRIFT_X       appended multiple of n (default 4)
  *   SPARK_GRAFT_DRIFT_SHIFT   mean shift of the appended population in
  *                             vector-lengths along e0 (default 0.75)
  *   SPARK_GRAFT_DRIFT_PROBES  probe batch (default 500)
  *   SPARK_GRAFT_DRIFT_DIR     cache root (default /tmp/graft_anndrift)
  *   SPARK_GRAFT_CPUS          local[] parallelism (default 32)
  *
  * Prints ONE JSON line:
  *   {"metric":"ann_drift","n":…,"appended":…,"shift":…,"nprobe":…,
  *    "frozen_recall":…,"frozen_planted":…,
  *    "fresh_recall":…,"fresh_planted":…}
  */
object AnnDriftProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DRIFT_N", "200000").toLong
    val x = sys.env.getOrElse("SPARK_GRAFT_DRIFT_X", "4").toInt
    val shift = sys.env.getOrElse("SPARK_GRAFT_DRIFT_SHIFT", "0.75").toDouble
    val nProbes = sys.env.getOrElse("SPARK_GRAFT_DRIFT_PROBES", "500").toInt
    val root = sys.env.getOrElse("SPARK_GRAFT_DRIFT_DIR", "/tmp/graft_anndrift")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tag = s"n$n-x$x-s$shift-p$nProbes"

    // fitted population: centered clusterless corpus, ids [0, n)
    def cached(name: String)(mk: String => Unit): String = {
      val dir = s"$root/$tag/$name"
      val marker = java.nio.file.Paths.get(dir, "_BUILD_DONE")
      if (!java.nio.file.Files.exists(marker)) {
        val t0 = System.nanoTime()
        mk(dir)
        System.err.println(
          f"[drift] built $name in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        java.nio.file.Files.createDirectories(marker.getParent)
        java.nio.file.Files.write(marker, tag.getBytes)
        ()
      }
      dir
    }
    val baseDir = cached("base") { d =>
      SynthVectors.corpus(spark, n).write.mode("overwrite").parquet(d)
    }
    // appended population: x·n SHIFTED vectors plus one planted near-dup
    // per probe, ids remapped past the fitted corpus
    val apDir = cached("appended") { d =>
      SynthVectors.corpus(spark, x * n, planted = nProbes,
          shift = shift, seedSalt = 101L)
        .select((col("vec_id") + n).as("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(d)
    }
    val appended = spark.read.parquet(apDir)

    // frozen arm: build on base (sidecar forced), then ONE bulk append
    // of the shifted population under the frozen quantizers — auto-refit
    // DISABLED (this probe measures exactly the decay the refit policy
    // exists to stop; with the default factor the 4× append would refit
    // and measure the fresh arm twice)
    spark.conf.set(operators.AnnIndex.FlatMaxBucketRowsKey, "1")
    spark.conf.set(operators.AnnIndex.RefitFactorKey, "0")
    val frozenDir = cached("frozen") { d =>
      operators.AnnIndex.buildFrom(spark, spark.read.parquet(baseDir), d)
      operators.AnnIndex.append(spark, d, appended)
    }
    // fresh arm: what refit-at-N× produces — one fit over the merged
    // corpus (same code path, nothing frozen)
    val freshDir = cached("fresh") { d =>
      operators.AnnIndex.buildFrom(spark,
        spark.read.parquet(baseDir).union(appended), d)
    }

    // probes: shifted-population vectors whose planted dups exist
    val probes = appended.filter(col("vec_id") < n + nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      .localCheckpoint(true)
    graft.functions.VectorExpressions.register(spark)
    val topk = udaf(new graft.functions.TopK(5),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    val all = spark.read.parquet(baseDir).union(appended)
    val exact = broadcast(probes)
      .join(all, col("probe_id") =!= col("vec_id"))
      .withColumn("cos", expr("cosine_f32(pv, embedding)"))
      .groupBy("probe_id")
      .agg(topk(col("cos"), col("vec_id")).as("nb"))
      .select(col("probe_id"), explode(col("nb.id")).as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    operators.AnnIndex.refreshCounts(frozenDir)
    operators.AnnIndex.refreshCounts(freshDir)
    require(operators.AnnIndex.chosenArm(spark, frozenDir) == "ivfpq" &&
      operators.AnnIndex.chosenArm(spark, freshDir) == "ivfpq",
      "both arms must serve routed for the comparison to mean anything")
    def served(dir: String): Set[(Long, Long)] =
      operators.AnnIndex.queryProbes(spark, dir, probes, 5)
        .select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)]): Double =
      (got & exact).size.toDouble / exact.size
    // planted ids: source n+i (i < nProbes) has its dup at n + x·n + i
    def planted(got: Set[(Long, Long)]): Double =
      (0 until nProbes).count(i =>
        got.contains((n + i, n + x * n + i))).toDouble / nProbes
    val (fz, fr) = (served(frozenDir), served(freshDir))
    // serve COST, frozen vs refit: the frozen sidecar's cell count stays
    // at √n_fitted while the corpus grows, so its candidate term
    // 2·nprobe·n/k_fitted is LINEAR in n — the refit's primary value
    // (recall barely moves; see the planted columns)
    def timeOne(dir: String): Double = {
      val t0 = System.nanoTime()
      operators.AnnIndex.queryProbes(spark, dir, probes, 5)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timeOne(frozenDir); timeOne(freshDir) // warmup
    var fzS = Double.MaxValue
    var frS = Double.MaxValue
    for (_ <- 1 to 2) {
      fzS = math.min(fzS, timeOne(frozenDir))
      frS = math.min(frS, timeOne(freshDir))
    }
    println(f"""{"metric":"ann_drift","n":$n,"appended":${x * n},"shift":$shift%.2f,"nprobe":${operators.AnnIndex.RouteNprobe},"frozen_recall":${recall(fz)}%.3f,"frozen_planted":${planted(fz)}%.3f,"fresh_recall":${recall(fr)}%.3f,"fresh_planted":${planted(fr)}%.3f,"frozen_sec":$fzS%.3f,"fresh_sec":$frS%.3f}""")
    spark.stop()
  }
}
