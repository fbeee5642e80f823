package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round normalization contract of the bench artifact:
  * value_calib_adjusted = raw total scaled by quiet-host/observed calib,
  * so a 2x-slower host reports ~the same adjusted number for the same
  * code (SCALE.md "Host-speed drift"). */
class BenchSpec extends AnyFunSuite {

  test("adjusted total normalizes host drift out") {
    // same engine work measured on a 2x-slower host: raw total doubles,
    // calib doubles, adjusted total is unchanged
    val quietTotal = 15.0
    val slowTotal = 30.0
    val quietAdj = Bench.adjustedTotal(quietTotal, Bench.QuietCalib1t)
    val slowAdj = Bench.adjustedTotal(slowTotal, Bench.QuietCalib1t * 2)
    assert(math.abs(quietAdj - slowAdj) < 1e-9)
    assert(quietAdj == quietTotal, "on the quiet host adjusted == raw")
  }

  test("adjusted total is defensive about a broken calibration") {
    assert(Bench.adjustedTotal(10.0, 0.0) == 10.0)
    assert(Bench.adjustedTotal(10.0, -1.0) == 10.0)
  }

  test("loadPrevBench picks the newest round artifact and parses it") {
    val dir = java.nio.file.Files.createTempDirectory("bench-prev").toFile
    def write(name: String, body: String): Unit =
      java.nio.file.Files.writeString(dir.toPath.resolve(name), body)
    // driver-shaped wrapper: {"n":N,...,"parsed":{...}}
    write("BENCH_r09.json",
      """{"n":9,"parsed":{"queries":{"q1_agg":0.4},
        |"calib":{"sha256_1t_256mb_sec":0.2}}}""".stripMargin)
    write("BENCH_r10.json",
      """{"n":10,"parsed":{"queries":{"q1_agg":0.334,"l13_ann":0.659},
        |"calib":{"sha256_1t_256mb_sec":0.251}}}""".stripMargin)
    write("BENCH_r10_broken.json", "{not json") // ignored: name mismatch
    val Some((n, qs, calib, calibSpark)) = Bench.loadPrevBench(dir)
    assert(n == 10)
    assert(qs == Map("q1_agg" -> 0.334, "l13_ann" -> 0.659))
    assert(calib == 0.251)
    assert(calibSpark == 0.0, "pre-r14 artifact has no spark anchor → 0.0 sentinel")
    // r14+ artifact: the spark anchor parses alongside the sha pair
    write("BENCH_r11.json",
      """{"n":11,"parsed":{"queries":{"q1_agg":0.3},
        |"calib":{"sha256_1t_256mb_sec":0.2,"spark_10m_shuffle_sec":0.61}}}""".stripMargin)
    val Some((_, _, _, cs11)) = Bench.loadPrevBench(dir)
    assert(cs11 == 0.61)
  }

  test("spark-anchored adjusted total normalizes drift and is defensive") {
    val quietAdj = Bench.adjustedTotalSpark(15.0, Bench.QuietCalibSpark)
    val slowAdj = Bench.adjustedTotalSpark(30.0, Bench.QuietCalibSpark * 2)
    assert(math.abs(quietAdj - slowAdj) < 1e-9)
    assert(quietAdj == 15.0)
    assert(Bench.adjustedTotalSpark(10.0, 0.0) == 10.0)
    assert(Bench.adjustedTotalSpark(10.0, -1.0) == 10.0)
  }

  test("hostLoad reads loadavg and sees at least this JVM") {
    val (la, jvms) = Bench.hostLoad()
    assert(la >= 0.0, s"loadavg unreadable: $la")
    assert(jvms >= 1, s"JVM census missed the current process: $jvms")
  }

  test("loadPrevBench survives a truncated artifact and an empty dir") {
    val dir = java.nio.file.Files.createTempDirectory("bench-prev2").toFile
    assert(Bench.loadPrevBench(dir).isEmpty)
    java.nio.file.Files.writeString(
      dir.toPath.resolve("BENCH_r04.json"), """{"parsed": null}""")
    assert(Bench.loadPrevBench(dir).isEmpty,
      "a round whose stdout truncated (parsed:null) must be skipped, not crash")
  }

  test("SCALE.md's stated suite counts match the code (artifact lint)") {
    // VERDICT r9 AND r10 both caught this count drifting by hand; the
    // linted line at the top of SCALE.md is the single current-state
    // statement and must equal the registries it describes
    val scale = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SCALE.md"))
    val re = """Current headline suite: (\d+) lanes \(\+(\d+) extra probes\)""".r
    val m = re.findFirstMatchIn(scale)
      .getOrElse(fail("SCALE.md lost its linted suite-count line"))
    assert(m.group(1).toInt == Bench.headline.size,
      s"SCALE.md says ${m.group(1)} headlines; Bench.headline has ${Bench.headline.size}")
    assert(m.group(2).toInt == ScaleBench.extraProbes.size,
      s"SCALE.md says ${m.group(2)} extras; ScaleBench.extraProbes has ${ScaleBench.extraProbes.size}")
  }
}
