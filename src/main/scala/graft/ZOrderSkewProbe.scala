package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-key z-order evidence (VERDICT r16 #3) — the measurement behind
  * the rank-normalization switch: ZOrderProbe measured pruning on
  * uniform TPC-H keys; this probe measures it on the distribution that
  * BREAKS min-max scaling. The corpus is a zipf-like pair
  * (a = floor(2^20/(1+e)), e uniform → P(a ≥ t) ~ 1/t; a=1 holds ~half
  * the rows) clustered two ways into the same file count:
  *
  *   rank   — the shipped LayoutOps.clusterByZOrderN (approx-quantile
  *            range buckets via the codegen'd range_bucket kernel)
  *   minmax — the pre-r17 normalization replayed inline (min-max scale
  *            to 16-bit space; same zordern kernel, same sort, same
  *            file count — the only variable is the normalization)
  *
  * For tail/mid range predicates on the skewed key it reports the
  * zone-map hit count (files a footer-stats reader must touch) under
  * both layouts. Min-max puts 99.9% of the VALUE DOMAIN's rows in
  * bucket 0, so the z-key carries no information about `a` and every
  * file's footer spans the query range — the measured r17 numbers at
  * 2M rows / 64 files: 64/64 hit on every query vs rank's 2–7/64.
  *
  *   SPARK_GRAFT_ZSKEW_N      rows (default 2,000,000)
  *   SPARK_GRAFT_ZSKEW_FILES  files per table (default 64)
  *   SPARK_GRAFT_ZSKEW_DIR    work dir (default /tmp/graft_zskew;
  *                            corpus + layouts are marker-gated)
  *
  * A third leg (r19) routes the SAME corpus through the CLI's
  * label-to-label OPTIMIZE (publish → `Cli optimize` z-order →
  * zone-map sidecar → mounted label) and reports the pruned-file count
  * through SnapshotStore.prunedFiles — proving prune-after-optimize
  * arrives through the snapshot surface, not just raw footers.
  *
  * Prints ONE JSON line:
  *   {"metric":"zorder_skew_probe","rows":N,"files":F,"label_files":L,
  *    "queries":{q:{"hit_rank":h,"hit_minmax":m,"hit_label":l,"rows":r}}}
  */
object ZOrderSkewProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ZSKEW_N", "2000000").toLong
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_ZSKEW_FILES", "64").toInt
    val root = sys.env.getOrElse("SPARK_GRAFT_ZSKEW_DIR", "/tmp/graft_zskew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = s"$root/src_$n"
    val rankDir = s"$root/rank_${n}_$nFiles"
    val mmDir = s"$root/minmax_${n}_$nFiles"
    def gated(marker: String)(work: => Unit): Unit = {
      val p = java.nio.file.Paths.get(root, s"_DONE_$marker")
      if (!java.nio.file.Files.exists(p)) {
        work
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, "1".getBytes)
        ()
      }
    }
    gated(s"src_$n") {
      spark.range(n).selectExpr(
        "CAST(1048576 / (1 + (abs(hash(id)) % 1048576)) AS BIGINT) AS a",
        "CAST(abs(hash(id, 7L)) % 1000000 AS BIGINT) AS b")
        .write.mode("overwrite").parquet(src)
    }
    gated(s"rank_${n}_$nFiles") {
      graft.operators.LayoutOps.clusterByZOrderN(spark, src, rankDir,
        nFiles, Seq("a", "b"))
    }
    gated(s"minmax_${n}_$nFiles") {
      // the pre-r17 normalization, replayed with the same kernel/sort
      graft.functions.ZOrder.register(spark)
      val df = spark.read.parquet(src)
      val r = df.agg(min(col("a")).cast("double"), max(col("a")).cast("double"),
        min(col("b")).cast("double"), max(col("b")).cast("double")).collect()(0)
      def norm(c: String, lo: Double, hi: Double) = {
        val span = math.max(hi - lo, 1e-300)
        least(floor((col(c).cast("double") - lo) / span * 65536.0),
          lit(65535.0)).cast("long")
      }
      val z = call_function("zordern",
        norm("a", r.getDouble(0), r.getDouble(1)),
        norm("b", r.getDouble(2), r.getDouble(3)))
      df.withColumn("__z", z)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z")).drop("__z")
        .write.mode("overwrite").parquet(mmDir)
    }

    def files(dir: String): Seq[java.io.File] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

    // LABEL PATH (VERDICT r17 #7 / r18 #8): the same zipf corpus
    // through the CLI's label-to-label OPTIMIZE — publish src as table
    // t/, `Cli optimize` with z-order a,b + zone-map stats on both keys,
    // then count PRUNED files through the mounted label's zone-map
    // sidecar for the same queries. The dir-to-dir probe above measures
    // the layout machinery; this leg proves the SAME pruning arrives
    // through the snapshot surface a reader actually mounts (manifest +
    // stats sidecar + label pointer), not just through raw footers.
    val repo = s"$root/repo_${n}_$nFiles"
    gated(s"label_${n}_$nFiles") {
      val stage = s"$root/stage_$n"
      val t = java.nio.file.Paths.get(stage, "t")
      java.nio.file.Files.createDirectories(t)
      files(src).foreach { f =>
        val dst = t.resolve(f.getName)
        if (!java.nio.file.Files.exists(dst)) {
          try { java.nio.file.Files.createLink(dst, f.toPath); () }
          catch { case _: Exception =>
            java.nio.file.Files.copy(f.toPath, dst); () }
        }
      }
      graft.sources.SnapshotStore.publish(spark, stage, repo, "main")
      val totalBytes = files(src).map(_.length).sum
      val rc = graft.Cli.run(List("optimize", repo, "main", "t",
        math.max(1L, totalBytes / nFiles).toString, "a,b", "a,b"))
      require(rc == 0, s"Cli optimize failed: $rc")
    }
    def labelHits(lo: Long, hi: Long): Int =
      graft.sources.SnapshotStore.prunedFiles(repo, "main", "a",
        lo.toDouble, if (hi == Long.MaxValue) Double.MaxValue else hi.toDouble)
        .count(p => p.startsWith("t/") && p.endsWith(".parquet"))
    val labelFiles = graft.sources.SnapshotStore.mount(repo, "main")
      .count(p => p.path.startsWith("t/") && p.path.endsWith(".parquet"))
    def extents(dir: String): Seq[(Long, Long)] = files(dir).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("a")), max(col("a"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val extRank = extents(rankDir)
    val extMm = extents(mmDir)
    def hits(ext: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      ext.count { case (mn, mx) => mx >= lo && mn <= hi }

    val queries = Seq(
      ("a_ge_1024", 1024L, Long.MaxValue), // ~0.1% of rows (deep tail)
      ("a_ge_64", 64L, Long.MaxValue), //     ~1.6%
      ("a_16_to_63", 16L, 63L)) //            ~4.7% (mid band)
    val out = queries.map { case (name, lo, hi) =>
      val rows = spark.read.parquet(rankDir)
        .filter(col("a") >= lo && col("a") <= hi).count()
      val rowsMm = spark.read.parquet(mmDir)
        .filter(col("a") >= lo && col("a") <= hi).count()
      require(rows == rowsMm, s"layout changed the answer for $name")
      // the label leg must ANSWER identically too: read exactly the
      // pruned files out of the CAS and count
      val pruned = graft.sources.SnapshotStore.prunedFiles(repo, "main",
        "a", lo.toDouble,
        if (hi == Long.MaxValue) Double.MaxValue else hi.toDouble)
        .filter(p => p.startsWith("t/") && p.endsWith(".parquet"))
      val byPath = graft.sources.SnapshotStore.mount(repo, "main")
        .map(e => e.path -> e.sha256).toMap
      val rowsLabel =
        if (pruned.isEmpty) 0L
        else spark.read.parquet(pruned.map(p =>
            s"$repo/CAS/${byPath(p)}"): _*)
          .filter(col("a") >= lo && col("a") <= hi).count()
      require(rows == rowsLabel,
        s"label-path pruning changed the answer for $name")
      s""""$name":{"hit_rank":${hits(extRank, lo, hi)},""" +
        s""""hit_minmax":${hits(extMm, lo, hi)},""" +
        s""""hit_label":${labelHits(lo, hi)},"rows":$rows}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"zorder_skew_probe","rows":$n,""" +
      s""""files":$nFiles,"label_files":$labelFiles,"queries":$out}""")
    spark.stop()
  }
}
