package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Measures total shuffle bytes WRITTEN by everything a DataFrame
  * executes — the per-lane observable behind ShuffleBudgetSpec. Stage-
  * completion events carry the stage-aggregated task metrics; the
  * listener bus is asynchronous, so the reading polls until stable
  * rather than racing the last event. */
object ShuffleMetrics {

  def shuffleBytesOf(df: DataFrame): Long = {
    val spark = df.sparkSession
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) { acc.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    }
    // drain BEFORE registering: still-queued stage events from a prior
    // lane's jobs would otherwise be delivered to this fresh listener
    // and inflate its count
    org.apache.spark.GraftBusAccess.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      // drain AFTER: deterministic — returns only once every event from
      // this lane's jobs has been delivered (no polling window to miss)
      org.apache.spark.GraftBusAccess.drain(spark.sparkContext)
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

/** One-off recorder: prints every lane's measured shuffle bytes at
  * sf0.001 as a ready-to-paste ceiling table (measured × 4, floored).
  * Run with `sbt "Test/runMain graft.ShuffleMeasure"` when lanes are
  * added or plans intentionally change shape. */
object ShuffleMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val b = ShuffleMetrics.shuffleBytesOf(fn(spark, SparkSpec.sfDir))
      name -> b
    }
    rows.foreach { case (n, b) =>
      val ceil = math.max(256L * 1024, b * 4)
      println(f"""    "$n%s" -> ${ceil}L, // measured $b%d""")
    }
    spark.stop()
  }
}
