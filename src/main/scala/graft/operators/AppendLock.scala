package graft.operators

import org.apache.spark.sql.SparkSession

/** Exclusive per-indexDir append lock shared by ALL the standing indexes
  * (lifted out of DedupIndex so every index family serializes appends
  * the same way): a per-key JVM monitor — OS file locks are
  * process-level, and a second same-JVM appender would throw
  * OverlappingFileLockException — plus, on a lockable local filesystem,
  * a cross-process OS file lock (DedupHammerSpec exercises that leg with
  * two real JVMs).
  *
  * The lock matters even for the PURE parquet-append indexes (Jaccard /
  * NearDup / SimHash signature rows, no derived bloom state): concurrent
  * appends to one directory stage their commits in the SAME
  * `_temporary` tree, and one job's commit-cleanup deletes the other's
  * staged task files — rows lost silently, the worst failure mode an
  * index can have. On object stores without native locks the
  * single-writer-per-index contract applies (the streaming builders
  * satisfy it: one query owns one indexDir; marker + append-last makes
  * their replays idempotent). */
private[operators] object AppendLock {

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withLock[A](spark: SparkSession, indexDir: String)(body: => A): A = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    val key =
      if (local)
        java.nio.file.Paths.get(p.toUri.getPath)
          .toAbsolutePath.normalize.toString
      else indexDir
    val monitor = jvmLocks.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      if (local) {
        val lockPath = java.nio.file.Paths.get(key, ".append.lock")
        java.nio.file.Files.createDirectories(lockPath.getParent)
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        // Bounded tryLock loop rather than a blocking lock(): the JVM
        // monitor above is held while we wait, so an indefinitely
        // blocking OS lock would let one wedged peer process stall every
        // same-JVM appender for this index with zero diagnostics. Poll,
        // log who we're waiting on after the first second, and fail
        // loudly (lock path named) after 10 minutes instead of hanging.
        try {
          val deadlineNs = System.nanoTime() + 600L * 1000 * 1000 * 1000
          var l: java.nio.channels.FileLock = ch.tryLock()
          var warned = false
          while (l == null) {
            if (System.nanoTime() > deadlineNs)
              throw new java.util.concurrent.TimeoutException(
                s"AppendLock: gave up after 600s waiting for $lockPath " +
                  "(held by another process)")
            if (!warned && System.nanoTime() >
                deadlineNs - 599L * 1000 * 1000 * 1000) {
              org.apache.logging.log4j.LogManager.getLogger(getClass)
                .warn(s"AppendLock: waiting on $lockPath held by another process")
              warned = true
            }
            Thread.sleep(50)
            l = ch.tryLock()
          }
          try body finally l.release()
        }
        finally ch.close()
      } else body
    }
  }
}
