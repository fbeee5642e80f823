package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimHashIndex

/** Measures the banded-SimHash cost-model crossover AT THE SCALE THE
  * PROJECTION WAS BUILT FOR (VERDICT r11 #1): the pruned bands/ arm was
  * only ever timed at corpora where it LOSES (50 K and 5 M docs, both
  * sub-row-group per partition dir), so `PrunedMinSigsBytes` was an
  * extrapolation. Signatures need no documents — a standing SimHash
  * index is just (doc_id, simhash LONG) — so this probe synthesizes
  * corpora of 10^7..4·10^8 uniform signatures (`xxhash64(id)`: random
  * bits, incompressible, the adversarial case for the pruned arm since
  * real sign-skewed simhashes compress better and shrink the plain
  * scan's advantage), migrates each to the bands/ layout, and times the
  * SAME serve screen both ways:
  *
  *   pruned: `prunedMinSigsBytes=0`         (partition-pruned bands/ scan)
  *   plain:  `prunedMinSigsBytes=MaxValue`  (full sigs/ scan, in-plan bands)
  *
  * Small batches only (default 8 and 32 docs → ≤32/≤128 of 1024 dirs
  * touched): that is the steady-state serve shape the pruned arm exists
  * for, and term 1 of the cost model (prefix width ≤204) already routes
  * wide batches to the plain arm.
  *
  *   SPARK_GRAFT_XOVER_NS   comma row counts (default
  *                          10000000,30000000,100000000,400000000)
  *   SPARK_GRAFT_XOVER_BS   comma batch sizes (default 8,32)
  *   SPARK_GRAFT_XOVER_DIR  base dir (default /tmp/graft_simhash_xover)
  *
  * Prints ONE JSON line:
  *   {"metric":"simhash_xover","points":[{"n":…,"sigs_bytes":…,
  *    "batch":…,"pruned_sec":…,"plain_sec":…,"pruned_over_plain":…},…]}
  */
object SimHashScaleProbe {

  private def timeOne(spark: SparkSession, fn: => DataFrame): Double = {
    val t0 = System.nanoTime()
    fn.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    System.gc() // reap dead localCheckpoint blocks (ServeScaleProbe note)
    secs
  }

  def main(args: Array[String]): Unit = {
    val ns = sys.env.getOrElse("SPARK_GRAFT_XOVER_NS",
      "10000000,30000000,100000000,400000000")
      .split(",").map(_.trim.toLong).toSeq
    val bs = sys.env.getOrElse("SPARK_GRAFT_XOVER_BS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_XOVER_DIR",
      "/tmp/graft_simhash_xover")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def indexDir(n: Long) = s"$base/n$n"

    // ---- generate + migrate (idempotent per size; marker-gated) ----
    for (n <- ns) {
      val dir = indexDir(n)
      val done = java.nio.file.Paths.get(dir, "_XOVER_DONE")
      if (!java.nio.file.Files.exists(done)) {
        System.err.println(s"[xover] generating n=$n at $dir")
        spark.range(n)
          .select(col("id").as("doc_id"), xxhash64(col("id")).as("simhash"))
          .write.mode("overwrite").parquet(s"$dir/sigs")
        SimHashIndex.migrate(spark, dir)
        java.nio.file.Files.write(done, n.toString.getBytes)
      }
    }

    def sigsBytes(n: Long): Long = {
      val p = new org.apache.hadoop.fs.Path(s"${indexDir(n)}/sigs")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(p).getLength
    }

    // synthetic batch signatures: ids disjoint from the corpus, hashes
    // salted so collisions with the standing table stay incidental
    def batchSigs(b: Int): DataFrame =
      spark.range(b)
        .select((col("id") + lit(1L << 40)).as("doc_id"),
          xxhash64(col("id"), lit("xover-batch")).as("simhash"))
        .localCheckpoint(true)

    // batch signatures built ONCE per size, OUTSIDE the timed region:
    // batchSigs' eager localCheckpoint is a Spark job, and paying it
    // inside timeOne added an identical constant to both arms —
    // compressing pruned_over_plain toward 1 at exactly the small batch
    // sizes the crossover lives at
    val sigsByB: Map[Int, DataFrame] = bs.map(b => b -> batchSigs(b)).toMap

    def screen(n: Long, b: Int, minSigs: String): Double = {
      spark.conf.set(SimHashIndex.PrunedMinSigsBytesKey, minSigs)
      try timeOne(spark,
        SimHashIndex.neighborsAgainstSigs(spark, indexDir(n), sigsByB(b)))
      finally spark.conf.unset(SimHashIndex.PrunedMinSigsBytesKey)
    }

    // warmup sweep (JIT + FS caches), then 2 timed sweeps, min
    for (n <- ns; b <- bs) { screen(n, b, "0"); screen(n, b, Long.MaxValue.toString) }
    val t = scala.collection.mutable.LinkedHashMap[(Long, Int, String), Double]()
    for (_ <- 1 to 2; n <- ns; b <- bs; arm <- Seq("pruned", "plain")) {
      val s = screen(n, b,
        if (arm == "pruned") "0" else Long.MaxValue.toString)
      t((n, b, arm)) = math.min(t.getOrElse((n, b, arm), Double.MaxValue), s)
    }
    val points = (for (n <- ns; b <- bs) yield {
      val pr = t((n, b, "pruned")); val pl = t((n, b, "plain"))
      f"""{"n":$n,"sigs_bytes":${sigsBytes(n)},"batch":$b,"pruned_sec":$pr%.3f,"plain_sec":$pl%.3f,"pruned_over_plain":${pr / pl}%.3f}"""
    }).mkString("[", ",", "]")
    println(s"""{"metric":"simhash_xover","points":$points}""")
    spark.stop()
  }
}
