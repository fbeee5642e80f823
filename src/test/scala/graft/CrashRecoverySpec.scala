package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files => JF, Paths => JP, Path}

/** Kill-the-JVM curation e2e (VERDICT r9 #2): a REAL child process runs
  * the full streaming pipeline (file source → curateIngest → checkpoint),
  * gets SIGKILLed between the Jaccard append and the exact append — the
  * window the append ORDER exists for — and a restarted process must
  * converge to exactly the state a crash-free run produces: same
  * accepted/ rows, same exact-screen behavior, same near-dup-screen
  * behavior. The in-process replay matrix (StreamingSpec) simulates these
  * crash points by state surgery; this observes one for real, process
  * death and streaming-checkpoint replay included. */
class CrashRecoverySpec extends SparkSpec {

  private def doc(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ")

  /** Write rows as ONE parquet file named `name` in `dir` with a chosen
    * mtime — the file streaming source orders new files by timestamp, so
    * explicit mtimes pin batch order under maxFilesPerTrigger=1. */
  private def writeBatchFile(rows: Seq[(Long, String)], dir: Path,
      name: String, mtimeMs: Long): Path = {
    import graft.SparkSpec.spark.implicits._
    val stage = JF.createTempDirectory("crash-batch-stage")
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val part = JF.list(stage).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    JF.createDirectories(dir)
    val dst = dir.resolve(name)
    JF.move(part, dst)
    JF.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    dst
  }

  test("SIGKILL between the appends: restart converges to the crash-free run") {
    val root = JF.createTempDirectory("crash-e2e")
    val modelDir = s"$root/eval-model"
    val evalDoc = "exam question secret alpha bravo charlie delta echo " +
      "foxtrot golf hotel"
    import graft.SparkSpec.spark.implicits._
    graft.streaming.StreamJobs.buildDecontamModel(
      Seq((1L, evalDoc)).toDF("doc_id", "text"), modelDir)

    val docA = doc("alpha")
    val docB = doc("bravo")
    val docC = doc("civic")
    // carries the eval doc's 8-gram run → must be decontaminated out
    val docDirty = ("padding " * 12).trim + " " + evalDoc
    val b0 = Seq(10L -> docA, 15L -> docB)
    val b1 = Seq(
      20L -> docA,                               // exact dup of indexed 10
      21L -> docA.replace("alpha20", "changed"), // near dup of indexed 10
      22L -> docC,                               // novel → accepted
      23L -> docDirty)                           // contaminated → dropped
    val t0 = System.currentTimeMillis() - 60000

    // ---- crash run: kill mid-batch-0, then restart with batch 1 present
    val inCrash = root.resolve("in-crash")
    val pipeCrash = s"$root/pipe-crash"
    val ckptCrash = s"$root/ckpt-crash"
    writeBatchFile(b0, inCrash, "b0.parquet", t0)
    val sentinel = root.resolve("kill-here")
    val log1 = root.resolve("child1.log")
    val child = ChildJvm.start("graft.CrashCurateChild",
      Seq(inCrash.toString, modelDir, pipeCrash, ckptCrash,
        "after_jaccard_append", sentinel.toString), log1)
    assert(ChildJvm.awaitFile(sentinel),
      s"child never reached the crash point — log:\n${ChildJvm.logTail(log1)}")
    child.destroyForcibly() // SIGKILL — no shutdown hooks, no finally
    child.waitFor()
    // the kill landed in the committed window: Jaccard rows are on disk,
    // the batch marker is not
    assert(JF.exists(JP.get(s"$pipeCrash/jaccard/shingles")),
      "Jaccard append had not landed before the kill")
    assert(!JF.exists(JP.get(s"$pipeCrash/commits/0")),
      "batch marker exists — the kill landed after commit, not between the appends")
    writeBatchFile(b1, inCrash, "b1.parquet", t0 + 60000)
    val log2 = root.resolve("child2.log")
    ChildJvm.run("graft.CrashCurateChild",
      Seq(inCrash.toString, modelDir, pipeCrash, ckptCrash,
        "none", s"$root/unused-sentinel"), log2)

    // ---- reference run: same batches, no crash, fresh dirs
    val inRef = root.resolve("in-ref")
    val pipeRef = s"$root/pipe-ref"
    val ckptRef = s"$root/ckpt-ref"
    writeBatchFile(b0, inRef, "b0.parquet", t0)
    writeBatchFile(b1, inRef, "b1.parquet", t0 + 60000)
    val log3 = root.resolve("child3.log")
    ChildJvm.run("graft.CrashCurateChild",
      Seq(inRef.toString, modelDir, pipeRef, ckptRef,
        "none", s"$root/unused-sentinel2"), log3)

    // ---- convergence: accepted rows identical (and correct)
    def accepted(pipe: String): Set[Long] =
      spark.read.parquet(s"$pipe/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted(pipeRef) == Set(10L, 15L, 22L),
      s"reference run accepted ${accepted(pipeRef)}")
    assert(accepted(pipeCrash) == accepted(pipeRef),
      s"crash run accepted ${accepted(pipeCrash)} != ref ${accepted(pipeRef)}")

    // ---- convergence: the standing EXACT index screens identically —
    // known contents are dups, a novel probe is new, in both indexes
    val probes = Seq(90L -> docA, 91L -> docB, 92L -> docC,
      93L -> doc("delta")).toDF("doc_id", "text")
    def exactNovel(pipe: String): Set[Long] =
      graft.operators.DedupIndex.newAgainst(spark, s"$pipe/exact", probes)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactNovel(pipeRef) == Set(93L))
    assert(exactNovel(pipeCrash) == exactNovel(pipeRef),
      "exact index diverged from the crash-free run")

    // ---- convergence: the standing JACCARD index screens identically —
    // a near-dup probe of an indexed doc matches it in both (the crash
    // run's index holds duplicate stored rows from the re-append; the
    // distinct-shingle verify must absorb that)
    val ndProbe = Seq(95L -> docA.replace("alpha7", "tweaked"))
      .toDF("doc_id", "text")
    def ndMatches(pipe: String): Set[(Long, Long)] =
      graft.operators.JaccardIndex
        .pairsAgainst(spark, s"$pipe/jaccard", ndProbe)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ndMatches(pipeRef) == Set((10L, 95L)),
      s"reference near-dup screen found ${ndMatches(pipeRef)}")
    assert(ndMatches(pipeCrash) == ndMatches(pipeRef),
      "Jaccard index diverged from the crash-free run")
  }
}
