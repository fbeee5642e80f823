package graft.sources

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One stage's storage-IO attribution: bytes/fetches the pufs:// layer
  * pulled between the previous stage completion and this one. */
case class StageIo(stageId: Int, bytesPulled: Long, fetches: Long,
    activeTransfers: Int)

/** Per-stage cache-IO attribution as a SparkListener — the reference's
  * live monitor ticker (stats every 5 s while mounted,
  * pufs/cmd/mount.go:305-316) re-expressed in Spark's own metrics
  * fabric: each completed stage records the DELTA of the global pull
  * counters, so "which stage paid for the cold cache" is a queryable
  * DataFrame instead of a log line.
  *
  * Counters are JVM-global (one cache arena per executor); on a real
  * cluster each executor would report via the plugin/metrics sink — the
  * listener shape is identical, attribution becomes per-executor too. */
final class PufsMetricsListener extends SparkListener {
  private val log = new java.util.concurrent.ConcurrentLinkedQueue[StageIo]()
  private val lastBytes = new java.util.concurrent.atomic.AtomicLong(
    PufsFileSystem.bytesPulled.get())
  private val lastFetches = new java.util.concurrent.atomic.AtomicLong(
    PufsFileSystem.fetchCount.get())

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val b = PufsFileSystem.bytesPulled.get()
    val f = PufsFileSystem.fetchCount.get()
    val db = b - lastBytes.getAndSet(b)
    val df = f - lastFetches.getAndSet(f)
    log.add(StageIo(sc.stageInfo.stageId, db, df,
      PufsFileSystem.activeTransfers.get()))
  }

  def snapshots: Seq[StageIo] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq
  }

  def asDataFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshots.toDF()
  }
}
