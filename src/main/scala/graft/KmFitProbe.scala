package graft

import org.apache.spark.sql.SparkSession

/** k-means fit-cost probe (VERDICT r18 #6 follow-through): the Lloyd
  * fit now runs on a deterministic id-hash sample capped at
  * `spark.graft.kmeans.fitSampleCap` rows, so fit cost should go FLAT
  * across corpus decades (the pre-r19 fit was KmIters full-corpus
  * passes). Times `KmFix.fixture` — fit only; the frozen-fixture serve
  * is measured by the l70 bench lane — across the given sf dirs and
  * reports the observed fit-input rows per decade.
  *
  *   SPARK_GRAFT_KMFIT_DIRS  comma-separated sf dirs
  *                           (default sf0.01,sf0.1 under /root/testdata)
  *
  * Prints ONE JSON line:
  *   {"metric":"kmeans_fit_probe","cells":{dir:{"sec":s,"fit_rows":n}}}
  */
object KmFitProbe {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_KMFIT_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cells = dirs.map { d =>
      val t0 = System.nanoTime()
      graft.operators.LlmOps.KmFix.fixture(spark, d)
      val sec = (System.nanoTime() - t0) / 1e9
      val name = d.split("/").last
      f""""$name":{"sec":$sec%.2f,"fit_rows":${graft.operators.LlmOps.KmFix.lastFitN.get()}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"kmeans_fit_probe","cells":$cells}""")
    spark.stop()
  }
}
