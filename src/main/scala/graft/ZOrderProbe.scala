package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-side z-order evidence at scale — the measurement behind the
  * OPTIMIZE ZORDER claim: LayoutSpec proves per-file extents shrink at
  * sf0.001; this probe measures what a READER buys on a 10×-scaled
  * lineitem (≈6M rows), where parquet row-group statistics actually
  * gate IO.
  *
  * Setup (marker-gated, like ScaleBench): the source clusters once via
  * clusterByZOrderN on (l_orderkey, l_partkey, l_suppkey) into N files,
  * and a CONTROL table rewrites the same rows into the same file count
  * with no layout (repartition = round-robin) — same codec, same sizes,
  * so any scan delta is layout, not format. For each dimension the
  * probe times a mid-domain 1/8-wide box count on both tables
  * (min-of-2 after warmup) and reads every file's footer min/max to
  * report the zone-map hit fraction — the files a footer-stats reader
  * must touch.
  *
  *   SPARK_GRAFT_ZPROBE_SRC      source parquet (default x10 lineitem)
  *   SPARK_GRAFT_ZPROBE_DIR      work dir (default /tmp/graft_zorder_probe)
  *   SPARK_GRAFT_ZPROBE_FILES    output files per table (default 64)
  *   SPARK_GRAFT_ZPROBE_CLUSTER  comma-list of cluster keys (default all
  *                               three probe dims) — clustering on a
  *                               SUBSET measures the resolution trade:
  *                               fewer dims buy tighter per-dim extents
  *                               on the clustered keys and none on the
  *                               rest
  *
  * Prints ONE JSON line:
  *   {"metric":"zorder_read_probe","files":N,
  *    "dims":{dim:{"hit_z":h,"hit_flat":f,"sec_z":s,"sec_flat":s2,
  *                 "rows":r}}}
  */
object ZOrderProbe {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_ZPROBE_SRC",
      "/tmp/graft_scale_x10/lineitem.parquet")
    val root = sys.env.getOrElse("SPARK_GRAFT_ZPROBE_DIR",
      "/tmp/graft_zorder_probe")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_ZPROBE_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val dims = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val clusterDims = sys.env.get("SPARK_GRAFT_ZPROBE_CLUSTER")
      .map(_.split(",").toSeq).getOrElse(dims)
    // the markers and table dirs key on the JOINED KEY NAMES (advisor
    // r16: a different same-cardinality SPARK_GRAFT_ZPROBE_CLUSTER list
    // must rebuild) AND on the source identity (r17: a probe dir
    // surviving a regenerated source corpus otherwise times a fresh
    // z-table against a stale flat one — caught when the row-count
    // cross-check tripped on exactly that)
    val srcId = {
      val f = new java.io.File(src)
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          s"$src|${f.length}|${f.lastModified}").toLong & 0xFFFFFFFFL)
    }
    val clusterTag = clusterDims.mkString("_")
    val zDir = s"$root/zorder_${clusterTag}_$srcId"
    val flatDir = s"$root/flat_$srcId"
    val done = java.nio.file.Paths.get(root, s"_DONE_${clusterTag}_$srcId")
    if (!java.nio.file.Files.exists(done)) {
      graft.operators.LayoutOps.clusterByZOrderN(spark, src, zDir, nFiles,
        clusterDims)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
      java.nio.file.Files.write(done, nFiles.toString.getBytes)
      ()
    }
    val doneFlat = java.nio.file.Paths.get(root, s"_DONE_FLAT_$srcId")
    if (!java.nio.file.Files.exists(doneFlat)) {
      spark.read.parquet(src).repartition(nFiles)
        .write.mode("overwrite").parquet(flatDir)
      java.nio.file.Files.write(doneFlat, nFiles.toString.getBytes)
      ()
    }

    val b = spark.read.parquet(src)
      .agg(dims.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
        dims.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*)
      .collect()(0)

    def files(dir: String): Seq[java.io.File] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

    // footer min/max per file — what a zone-map/footer-stats reader sees
    def extents(dir: String, c: String): Seq[(Long, Long)] =
      files(dir).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }

    def timeCount(dir: String, pred: org.apache.spark.sql.Column): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = spark.read.parquet(dir).filter(pred).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warmup: footers cached, codegen compiled
      val (a, n1) = once()
      val (b2, n2) = once()
      require(n1 == n2)
      (math.min(a, b2), n1)
    }

    val out = dims.zipWithIndex.map { case (c, j) =>
      val (lo, hi) = (b.getLong(2 * j), b.getLong(2 * j + 1))
      val span = hi - lo
      val (bLo, bHi) = (lo + span / 2 - span / 16, lo + span / 2 + span / 16)
      val pred = col(c) >= bLo && col(c) <= bHi
      val hitZ = extents(zDir, c).count { case (l, h) => h >= bLo && l <= bHi }
      val hitF = extents(flatDir, c).count { case (l, h) => h >= bLo && l <= bHi }
      val (secZ, rowsZ) = timeCount(zDir, pred)
      val (secF, rowsF) = timeCount(flatDir, pred)
      require(rowsZ == rowsF,
        s"layout changed the answer for $c: $rowsZ vs $rowsF")
      f""""$c%s":{"hit_z":$hitZ%d,"hit_flat":$hitF%d,"sec_z":$secZ%.3f,"sec_flat":$secF%.3f,"rows":$rowsZ%d}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"zorder_read_probe","files":$nFiles,"dims":$out}""")
    spark.stop()
  }
}
