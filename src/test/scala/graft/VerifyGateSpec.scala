package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The correctness gate itself must be un-foolable (VERDICT r12 #2):
  * round 12 shipped a lane that threw on every execution, Verify
  * swallowed the throw, and the lane VANISHED from the correctness
  * artifact instead of failing it. These tests pin the two defenses:
  * a crashed lane leaves an `_ERROR` sentinel (so every checker sees a
  * hard FAIL), and the oracle/no-oracle split covers the registry
  * exactly (so no lane can sit outside both verification paths). */
class VerifyGateSpec extends SparkSpec {

  private type Q = (SparkSession, String) => DataFrame

  test("a deliberately-crashing lane shows up as FAIL, not as absence") {
    val out = Files.createTempDirectory("graft-verify-gate").toString
    val lanes: Map[String, Q] = Map(
      "good_lane" -> ((s, _) => s.range(3).select(col("id"))),
      "crash_lane" -> ((_, _) => throw new IllegalStateException("boom")))
    Verify.dumpLanes(spark, sfDir, out, only = None, queries = lanes)

    val crashDir = Paths.get(out, "crash_lane")
    assert(Files.isDirectory(crashDir), "crashed lane must leave a dir")
    assert(Files.exists(crashDir.resolve("_ERROR")),
      "crashed lane must leave an _ERROR sentinel")
    assert(Files.readString(crashDir.resolve("_ERROR")).contains("boom"))
    val goodFiles = Files.list(Paths.get(out, "good_lane")).toArray.map(_.toString)
    assert(goodFiles.exists(_.endsWith(".parquet")), "good lane still dumps parquet")

    val lanesJson = Files.readString(Paths.get(out, "lanes.json"))
    assert(lanesJson.contains("\"crash_lane\"") && lanesJson.contains("\"good_lane\""),
      "lanes.json must record the full selected registry, crashes included")
  }

  test("a crash overwrites a stale parquet dump — never reports the old answer") {
    val out = Files.createTempDirectory("graft-verify-gate2").toString
    val ok: Map[String, Q] = Map("lane" -> ((s, _) => s.range(2).select(col("id"))))
    Verify.dumpLanes(spark, sfDir, out, only = None, queries = ok)
    assert(Files.list(Paths.get(out, "lane")).toArray
      .map(_.toString).exists(_.endsWith(".parquet")))
    val broken: Map[String, Q] =
      Map("lane" -> ((_, _) => throw new RuntimeException("regressed")))
    Verify.dumpLanes(spark, sfDir, out, only = None, queries = broken)
    val files = Files.list(Paths.get(out, "lane")).toArray.map(_.toString)
    assert(files.exists(_.endsWith("_ERROR")))
    assert(!files.exists(_.endsWith(".parquet")),
      "stale parquet from the previous run must not survive a crash")
  }

  test("filtered dev-loop rerun keeps lanes.json == output dirs (no spurious extras)") {
    val out = Files.createTempDirectory("graft-verify-gate3").toString
    val lanes: Map[String, Q] = Map(
      "lane_a" -> ((s, _) => s.range(2).select(col("id"))),
      "lane_b" -> ((s, _) => s.range(3).select(col("id"))))
    Verify.dumpLanes(spark, sfDir, out, only = None, queries = lanes)
    // dev loop: re-verify ONE lane into the same outdir — lane_a's dir
    // from the full run must stay listed, or check.py reports it as
    // "output dir not in lane registry" (ADVICE r13)
    Verify.dumpLanes(spark, sfDir, out, only = Some(Set("lane_b")), queries = lanes)
    val lanesJson = Files.readString(Paths.get(out, "lanes.json"))
    assert(lanesJson.contains("\"lane_a\"") && lanesJson.contains("\"lane_b\""),
      s"filtered run must union pre-existing dirs into lanes.json: $lanesJson")
    // a later FULL run against a SHRUNK registry deletes the stray dir —
    // lanes.json == dirs is the invariant every checker assumes
    val shrunk: Map[String, Q] =
      Map("lane_b" -> ((s, _) => s.range(3).select(col("id"))))
    Verify.dumpLanes(spark, sfDir, out, only = None, queries = shrunk)
    assert(!Files.exists(Paths.get(out, "lane_a")),
      "full run must clear dirs that left the registry")
    val lanesJson2 = Files.readString(Paths.get(out, "lanes.json"))
    assert(!lanesJson2.contains("lane_a") && lanesJson2.contains("\"lane_b\""))
  }

  test("oracle ∪ declared-no-oracle ∪ generated-oracle covers the lane registry exactly") {
    val oracle = SparkEntry.oracleSql.keySet
    val noOracle = SparkEntry.noOracle.keySet
    val generated = SparkEntry.generatedOracle.keySet
    val registry = SparkEntry.queries.keySet
    val overlap = (oracle ++ generated) intersect noOracle
    assert(overlap.isEmpty, s"lanes declared BOTH oracle and no-oracle: $overlap")
    // generated-oracle lanes register their SQL only after running in this
    // process, so the covering check must not depend on suite order
    val unverified = registry -- oracle -- noOracle -- generated
    assert(unverified.isEmpty,
      s"lanes outside every verification path (the r12 silent-loss hole): $unverified")
    val phantom = (oracle ++ noOracle ++ generated) -- registry
    assert(phantom.isEmpty, s"verification entries without a lane: $phantom")
  }
}
