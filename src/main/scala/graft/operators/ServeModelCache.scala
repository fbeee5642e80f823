package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-JVM cache of COLLECTED broadcast-sized index MODEL tables (PQ
  * codebooks, IVF coarse centroids) for the serving paths: the serving
  * process keeps the k·d-bounded model resident — the standard ANN
  * serving contract — instead of re-reading and re-collecting the same
  * parquet model on every probe batch (measured r19: each re-read +
  * collect/count was a separate driver-blocking job, and the model jobs
  * were ~half the per-batch serve latency at bench scale).
  *
  * Correctness does NOT lean on the write-once convention: entries are
  * keyed by directory and guarded by a file signature (name, length,
  * mtime of every file in the model dir), so a rebuild — even by another
  * process — invalidates the entry on the next serve. Only model state
  * bounded by k·d ever lands here; corpus-sized tables (cells/ codes/
  * vectors/) are read from parquet on every serve.
  */
private[operators] object ServeModelCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  private def signature(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")
  }

  /** Cached `load` keyed by `dir`, revalidated against the dir's file
    * signature on every call (one local listStatus, no Spark job). The
    * benign race — two threads loading the same dir — both reach the
    * same value; last put wins. */
  def cached[T <: AnyRef](spark: SparkSession, dir: String)(load: => T): T = {
    val sig = signature(spark, dir)
    val hit = cache.get(dir)
    if (hit != null && hit._1 == sig) hit._2.asInstanceOf[T]
    else {
      val v = load
      cache.put(dir, (sig, v))
      v
    }
  }

  /** Test hook: drop everything (e.g. after deleting temp dirs). */
  private[graft] def clear(): Unit = cache.clear()
}
