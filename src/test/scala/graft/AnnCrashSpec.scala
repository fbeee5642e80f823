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

  /** The SQ8 arm's crash window, killed for real (r17 — the same
    * discipline the two-arm ivfpq window got in r14): a SIGKILL between
    * append's flat write and its SQ8 codes extension leaves the codes
    * short, and a naive codes re-rank would silently drop the appended
    * batch from every result. Pins: the window is real on disk, the
    * count guard degrades serving to the complete float32 re-rank
    * (appended rows found), and repairSidecar's anti-join code append
    * restores SQ8 serving that finds the planted dup. */
  test("SQ8 append: SIGKILL before the codes write degrades to float32 and repairs") {
    val root = JF.createTempDirectory("ann-sq8-crash")
    val key = graft.operators.AnnIndex.ServeSq8Key
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)
      assert(graft.operators.AnnIndex.serveMode(spark, idx) == "sq8",
        "precondition: SQ8 serving before the crash")
      val batch = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 20)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      val batchPq = s"$root/batch"
      batch.write.parquet(batchPq)

      val sentinel = root.resolve("kill-sq8")
      val log1 = root.resolve("child1.log")
      val child = ChildJvm.start("graft.AnnSq8Child",
        Seq(idx, batchPq, "after_flat_write", sentinel.toString), log1)
      try assert(ChildJvm.awaitFile(sentinel),
        s"child never reached the crash point — log:\n${ChildJvm.logTail(log1)}")
      finally {
        child.destroyForcibly() // SIGKILL — no shutdown hooks, no finally
        child.waitFor()
        ()
      }
      // the window is real on disk: flat holds the batch, the codes don't
      val nFlat = spark.read.parquet(s"$idx/vectors").count()
      val nCodes = spark.read.parquet(s"$idx/sq8/codes").count()
      assert(nFlat == nCodes + 20,
        s"expected 20-row code divergence, got flat=$nFlat codes=$nCodes")
      // a fresh-counting server degrades to the complete float32 re-rank
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.serveMode(spark, idx) == "float32",
        "short codes must not serve")
      val probes = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val floatTop = graft.operators.AnnIndex
        .queryProbes(spark, idx, probes, 1)
        .select("probe_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 5L).foreach(p => assert(floatTop(p) == p + 900000L,
        s"float32 fallback missed appended dup of $p: got ${floatTop(p)}"))
      // repair appends exactly the missing codes; SQ8 serving resumes
      // and finds the planted dups
      assert(graft.operators.AnnIndex.repairNeeded(spark, idx))
      graft.operators.AnnIndex.repairSidecar(spark, idx)
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.serveMode(spark, idx) == "sq8",
        "repair must restore SQ8 serving")
      val sq8Top = graft.operators.AnnIndex
        .queryProbes(spark, idx, probes, 1)
        .select("probe_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 5L).foreach(p => assert(sq8Top(p) == p + 900000L,
        s"repaired SQ8 serve missed appended dup of $p: got ${sq8Top(p)}"))
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** VERDICT r15 #1: the r15 divergence guard compares CACHED counts, and
    * a long-lived serving stream was the one caller with no refresh
    * cadence — a serving JVM outliving an external writer's crashed
    * append kept routing to the short sidecar indefinitely. This test
    * runs the REAL streaming serve (annServeEachBatch) while a child JVM
    * crash-appends mid-stream, and pins the full timeline: the batch
    * BEFORE the cadence fires still routes short (the stale-cache state
    * the cadence exists to bound), the next refresh batch observes the
    * divergence and serves the appended rows through the flat arm. */
  test("serving stream observes an external crashed append within the refresh cadence") {
    import graft.SparkSpec.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = JF.createTempDirectory("ann-stream-crash")
    val tKey = graft.operators.AnnIndex.FlatMaxBucketRowsKey
    val rKey = graft.streaming.StreamJobs.AnnServeRefreshKey
    val saved = Seq(tKey, rKey).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(tKey, "0")  // tiny corpus routes like a 10^9-vector one
      spark.conf.set(rKey, "2")  // observe divergence within 2 batches
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)

      val probeRows = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id").isin(0L, 3L, 4L))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        .sortBy(_._1)
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
      val probes = mem.toDF().toDF("probe_id", "pv")
        .withColumn("pv", col("pv").cast("array<float>"))
      val outDir = s"$root/out"
      val q = graft.streaming.StreamJobs
        .annServeEachBatch(probes, idx, outDir, k = 3).start()
      try {
        // batch 0: warms the caches; counts agree, serving is routed
        mem.addData(probeRows(0))
        q.processAllAvailable()
        assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
          "precondition: the stream must be routing before the crash")

        // an EXTERNAL writer crash-appends between the arms: 20 dups of
        // corpus vectors under +900000 ids land in flat, not the sidecar
        val batch = spark.read.parquet(s"$idx/vectors")
          .filter(col("vec_id") < 20)
          .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
        val batchPq = s"$root/batch"
        batch.write.parquet(batchPq)
        val sentinel = root.resolve("kill-ann-stream")
        val log1 = root.resolve("child1.log")
        val child = ChildJvm.start("graft.AnnCrashChild",
          Seq(idx, batchPq, "after_flat_write", sentinel.toString), log1)
        try assert(ChildJvm.awaitFile(sentinel),
          s"child never reached the crash point — log:\n${ChildJvm.logTail(log1)}")
        finally {
          child.destroyForcibly()
          child.waitFor()
          ()
        }
        assert(spark.read.parquet(s"$idx/vectors").count() ==
          spark.read.parquet(s"$idx/ivfpq/vectors").count() + 20,
          "crash window must be real on disk")
        // the serving JVM's caches are stale: without the cadence this
        // state persists indefinitely
        assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
          "stale caches must still claim agreement — the gap the cadence closes")

        // batch 1 (no refresh yet): still routed — the sidecar knows
        // nothing of the appended rows, so probe 3's on-disk dup 900003
        // is missing from its answers
        mem.addData(probeRows(1))
        q.processAllAvailable()
        // batch 2 (refresh fires): fresh counts disagree, serving falls
        // back to the flat arm, which SEES the appended rows — probe 4's
        // dup 900004 is the exact-cosine-1 top answer
        mem.addData(probeRows(2))
        q.processAllAvailable()
      } finally q.stop()

      val answers = spark.read.parquet(s"$outDir/answers")
        .select(col("batch_id").cast("long"), col("probe_id"),
          col("rnk"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val b1 = answers.filter(_._1 == 1L)
      assert(b1.nonEmpty && b1.forall(_._4 < 900000L),
        s"pre-cadence batch must still be routed (short answers): ${b1.toSeq}")
      val b2Top = answers.filter(a => a._1 == 2L && a._3 == 1).map(a => a._2 -> a._4).toMap
      assert(b2Top.get(4L).contains(900004L),
        s"post-refresh batch must serve flat and see the appended dup: $b2Top")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The opt-in self-healing path: with serveAutoRepair on, the refresh
    * batch that OBSERVES an external crashed append also repairs it
    * inline — the stream returns to routed serving in the same batch,
    * with the appended rows visible through the reconverged sidecar,
    * instead of degrading to flat until an operator runs repairSidecar
    * by hand. */
  test("serving stream with auto-repair reconverges the sidecar and keeps routing") {
    import graft.SparkSpec.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = JF.createTempDirectory("ann-stream-heal")
    val tKey = graft.operators.AnnIndex.FlatMaxBucketRowsKey
    val rKey = graft.streaming.StreamJobs.AnnServeRefreshKey
    val hKey = graft.streaming.StreamJobs.AnnAutoRepairKey
    val saved = Seq(tKey, rKey, hKey).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(tKey, "0")
      spark.conf.set(rKey, "2")
      spark.conf.set(hKey, "true")
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)
      val probeRows = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id").isin(0L, 3L, 4L))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        .sortBy(_._1)
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
      val probes = mem.toDF().toDF("probe_id", "pv")
        .withColumn("pv", col("pv").cast("array<float>"))
      val outDir = s"$root/out"
      val q = graft.streaming.StreamJobs
        .annServeEachBatch(probes, idx, outDir, k = 3).start()
      try {
        mem.addData(probeRows(0))
        q.processAllAvailable()

        val batch = spark.read.parquet(s"$idx/vectors")
          .filter(col("vec_id") < 20)
          .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
        val batchPq = s"$root/batch"
        batch.write.parquet(batchPq)
        val sentinel = root.resolve("kill-ann-heal")
        val log1 = root.resolve("child1.log")
        val child = ChildJvm.start("graft.AnnCrashChild",
          Seq(idx, batchPq, "after_flat_write", sentinel.toString), log1)
        try assert(ChildJvm.awaitFile(sentinel),
          s"child never reached the crash point — log:\n${ChildJvm.logTail(log1)}")
        finally {
          child.destroyForcibly()
          child.waitFor()
          ()
        }
        assert(spark.read.parquet(s"$idx/vectors").count() ==
          spark.read.parquet(s"$idx/ivfpq/vectors").count() + 20,
          "crash window must be real on disk")

        mem.addData(probeRows(1)) // batch 1: no refresh, still routed-short
        q.processAllAvailable()
        mem.addData(probeRows(2)) // batch 2: refresh + AUTO-REPAIR + serve
        q.processAllAvailable()
      } finally q.stop()

      // the repair reconverged the sidecar ON DISK, routing is restored,
      // and the post-repair batch served the appended dup ROUTED
      assert(spark.read.parquet(s"$idx/vectors").count() ==
        spark.read.parquet(s"$idx/ivfpq/vectors").count(),
        "auto-repair must reconverge the sidecar row count")
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
        "healed index must route again")
      val answers = spark.read.parquet(s"$outDir/answers")
        .select(col("batch_id").cast("long"), col("probe_id"),
          col("rnk"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val b2Top = answers.filter(a => a._1 == 2L && a._3 == 1)
        .map(a => a._2 -> a._4).toMap
      assert(b2Top.get(4L).contains(900004L),
        s"healed routed serve must see the appended dup: $b2Top")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The healing matrix's second row: an EXTERNAL refit crash leaves NO
    * sidecar (not a diverged one), so the append-divergence predicate
    * alone would let the stream serve flat forever. repairNeeded also
    * fires on routed-eligible-but-sidecarless, and the auto-repair path
    * then REBUILDS (a fresh fit over the grown corpus) and returns to
    * routed serving — the stream heals both crash windows. */
  test("serving stream auto-repair rebuilds a sidecar lost to an external refit crash") {
    import graft.SparkSpec.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = JF.createTempDirectory("ann-stream-refit-heal")
    val tKey = graft.operators.AnnIndex.FlatMaxBucketRowsKey
    val rKey = graft.streaming.StreamJobs.AnnServeRefreshKey
    val hKey = graft.streaming.StreamJobs.AnnAutoRepairKey
    val saved = Seq(tKey, rKey, hKey).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(tKey, "0")
      spark.conf.set(rKey, "2")
      spark.conf.set(hKey, "true")
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)
      val probeRows = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id").isin(0L, 3L, 4L))
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        .sortBy(_._1)
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
      val probes = mem.toDF().toDF("probe_id", "pv")
        .withColumn("pv", col("pv").cast("array<float>"))
      val outDir = s"$root/out"
      val q = graft.streaming.StreamJobs
        .annServeEachBatch(probes, idx, outDir, k = 3).start()
      try {
        mem.addData(probeRows(0))
        q.processAllAvailable()

        // external writer refits (refitFactor=1.0) and dies in the
        // no-sidecar window: ivfpq/ gone, tmp stranded, flat +20 rows
        val batch = spark.read.parquet(s"$idx/vectors")
          .filter(col("vec_id") < 20)
          .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
        val batchPq = s"$root/batch"
        batch.write.parquet(batchPq)
        val sentinel = root.resolve("kill-refit-stream")
        val log1 = root.resolve("child1.log")
        val child = ChildJvm.start("graft.AnnRefitChild",
          Seq(idx, batchPq, "refit_before_rename", sentinel.toString), log1)
        try assert(ChildJvm.awaitFile(sentinel),
          s"child never reached the refit window — log:\n${ChildJvm.logTail(log1)}")
        finally {
          child.destroyForcibly()
          child.waitFor()
          ()
        }
        assert(!JF.exists(JP.get(s"$idx/ivfpq/centroids")),
          "refit crash must be real on disk (no sidecar)")

        mem.addData(probeRows(1)) // batch 1: no refresh; flat (correct, linear)
        q.processAllAvailable()
        mem.addData(probeRows(2)) // batch 2: refresh + REBUILD + routed serve
        q.processAllAvailable()
      } finally q.stop()

      // the rebuild is a fresh fit over the grown corpus and routing is
      // back — the exact end-state the crashed refit was aiming for
      assert(graft.operators.IvfPqIndex.fittedN(spark, s"$idx/ivfpq")
        .contains(520L),
        "auto-rebuild must re-fit over the grown corpus")
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
        "healed index must route again")
      val answers = spark.read.parquet(s"$outDir/answers")
        .select(col("batch_id").cast("long"), col("probe_id"),
          col("rnk"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val b2Top = answers.filter(a => a._1 == 2L && a._3 == 1)
        .map(a => a._2 -> a._4).toMap
      assert(b2Top.get(4L).contains(900004L),
        s"healed routed serve must see the appended dup: $b2Top")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** VERDICT r15 #2: refitSidecar's delete-then-rename was argued safe
    * (no sidecar → flat serving) but never SIGKILL-observed, and the
    * path now fires automatically at refitFactor crossings. A child JVM
    * is killed INSIDE the no-sidecar window; the spec pins the degraded
    * state (flat serving, appended rows included), then a clean re-refit
    * via repairSidecar's rebuild path (fresh fit over the full corpus —
    * fittedN advances to the grown size) restores routed serving that
    * finds every planted dup. */
  test("refit swap: SIGKILL in the no-sidecar window degrades to flat and re-refits cleanly") {
    val root = JF.createTempDirectory("ann-refit-crash")
    val key = graft.operators.AnnIndex.FlatMaxBucketRowsKey
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "0")
      val idx = s"$root/idx"
      graft.operators.AnnIndex.build(spark, sfDir, idx)
      val fitted0 = graft.operators.IvfPqIndex.fittedN(spark, s"$idx/ivfpq")
      assert(fitted0.contains(500L), s"precondition: fresh fit marker, got $fitted0")

      val batch = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 20)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      val batchPq = s"$root/batch"
      batch.write.parquet(batchPq)

      // child appends with refitFactor=1.0 (any growth refits) and is
      // SIGKILLed between the sidecar delete and the tmp rename
      val sentinel = root.resolve("kill-refit")
      val log1 = root.resolve("child1.log")
      val child = ChildJvm.start("graft.AnnRefitChild",
        Seq(idx, batchPq, "refit_before_rename", sentinel.toString), log1)
      try assert(ChildJvm.awaitFile(sentinel),
        s"child never reached the refit window — log:\n${ChildJvm.logTail(log1)}")
      finally {
        child.destroyForcibly()
        child.waitFor()
        ()
      }

      // the window is real on disk: no sidecar, the aside build stranded
      assert(!JF.exists(JP.get(s"$idx/ivfpq/centroids")),
        "old sidecar must be deleted inside the window")
      assert(JF.exists(JP.get(s"$idx/ivfpq.tmp")),
        "aside-built tmp sidecar must be stranded by the kill")

      // degraded state: flat serving, exact recall INCLUDING the batch
      graft.operators.AnnIndex.refreshCounts(idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "flat",
        "no-sidecar window must serve the flat arm")
      val probes = spark.read.parquet(s"$idx/vectors")
        .filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      def top1(k: Int) = graft.operators.AnnIndex
        .queryProbes(spark, idx, probes, k)
        .filter(col("rnk") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val flatTop = top1(1)
      (0L until 5L).foreach { p =>
        assert(flatTop(p) == p + 900000L,
          s"degraded flat serve missed appended dup of $p: got ${flatTop(p)}")
      }

      // recovery: repairSidecar's rebuild path re-fits over the FULL
      // grown corpus — the refit's intent, achieved after the crash
      graft.operators.AnnIndex.repairSidecar(spark, idx)
      assert(graft.operators.AnnIndex.chosenArm(spark, idx) == "ivfpq",
        "repair must restore routing")
      assert(graft.operators.IvfPqIndex.fittedN(spark, s"$idx/ivfpq")
        .contains(520L),
        "re-refit must record the grown corpus as the fitted size")
      val routedTop = top1(5)
      (0L until 5L).foreach { p =>
        assert(routedTop(p) == p + 900000L,
          s"re-refit routed serve missed planted dup of $p: got ${routedTop(p)}")
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
