package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files => JF, Paths => JP}

/** Kill-the-JVM e2e for the two-arm ANN append window (VERDICT r14 #2 —
  * the one new failure mode round 14's routing introduced): a SIGKILL
  * between AnnIndex.append's flat write and its IVFPQ sidecar extension
  * leaves the arms serving DIFFERENT corpora, and past the routing
  * threshold a naive router would silently drop the appended batch from
  * every routed result. This spec SIGKILLs a real child JVM in exactly
  * that window and pins the full story: the divergence is real on disk,
  * chosenArm's count guard detects it and serves the exact-recall flat
  * arm (appended rows included), and repairSidecar reconverges the
  * sidecar to byte-identical serving with a crash-free twin of the same
  * index. */
class AnnCrashSpec extends SparkSpec {

  test("ANN append: SIGKILL between the arms is detected, served around, and repaired") {
    val root = JF.createTempDirectory("ann-crash")
    val key = graft.operators.AnnIndex.FlatMaxBucketRowsKey
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "0") // tiny corpus routes like a 10^9-vector one
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
        "precondition: the index must be routing before the crash")
      // crash-free twin: a byte-copy of the SAME built index (identical
      // frozen quantizers, so a repaired sidecar must serve identically)
      val ref = s"$root/ref"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(idx), new java.io.File(ref))

      // the batch: near-dups of corpus vectors under fresh ids
      val batch = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 20)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      val batchPq = s"$root/batch"
      batch.write.parquet(batchPq)

      // child JVM appends to idx and is SIGKILLed between the arms
      val sentinel = root.resolve("kill-ann")
      val log1 = root.resolve("child1.log")
      val child = ChildJvm.start("graft.AnnCrashChild",
        Seq(idx, batchPq, "after_flat_write", sentinel.toString), log1)
      try assert(ChildJvm.awaitFile(sentinel),
        s"child never reached the crash point — log:\n${ChildJvm.logTail(log1)}")
      finally {
        child.destroyForcibly() // SIGKILL — no shutdown hooks, no finally
        child.waitFor()
        ()
      }

      // the window is real on disk: flat holds the batch, the sidecar
      // doesn't
      val nFlat = spark.read.parquet(s"$idx/vectors").count()
      val nSide = spark.read.parquet(s"$idx/ivfpq/vectors").count()
      assert(nFlat == nSide + 20,
        s"expected 20-row divergence, got flat=$nFlat sidecar=$nSide")

      // a fresh-counting server detects it and refuses to route
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "flat",
        "diverged sidecar must not be served")
      // ...and the fallback serve SEES the appended rows: a probe that
      // IS an appended vector's source finds its 900000-shifted dup
      val probes = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 5 && col("vec_id") >= 0)
        .filter(col("vec_id") < 900000L) // corpus side only
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val flatTop = graft.operators.AnnIndex
        .queryProbes(spark, idx, probes, 1)
        .select("probe_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 5L).foreach { p =>
        assert(flatTop(p) == p + 900000L,
          s"fallback flat serve missed appended dup of $p: got ${flatTop(p)}")
      }
      // the routed arm REALLY would have dropped the batch (why the
      // guard exists): the sidecar alone knows nothing past the corpus
      val sideHits = graft.operators.IvfPqIndex
        .queryProbes(spark, s"$idx/ivfpq", probes, 1,
          nprobe = graft.operators.AnnIndex.RouteNprobe)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(!sideHits.exists(_ >= 900000L),
        "diverged sidecar unexpectedly serves appended rows")

      // recovery: repairSidecar appends exactly the missing rows under
      // the frozen quantizers; serving must reconverge to the crash-free
      // twin (same build byte-copied, same batch appended cleanly)
      graft.operators.AnnIndex.repairSidecar(spark, idx)
      ChildJvm.run("graft.AnnCrashChild",
        Seq(ref, batchPq, "none", s"$root/unused"),
        root.resolve("child2.log"))
      graft.operators.AnnIndex.refreshCounts(ref)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
        "repair must restore routing")
      assert(graft.operators.AnnIndex.chosenArm(spark, ref) == "ivfpq")
      def served(dir: String) = graft.operators.AnnIndex
        .queryProbes(spark, dir, probes, 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(served(idx) == served(ref),
        "repaired index diverges from the crash-free twin")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
