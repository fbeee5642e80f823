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
    val Some((n, qs, anchors)) = Bench.loadPrevBench(dir)
    assert(n == 10)
    assert(qs == Map("q1_agg" -> 0.334, "l13_ann" -> 0.659))
    assert(anchors == Map("sha256_1t_256mb_sec" -> 0.251),
      "pre-r14 artifact carries only the sha anchor")
    // r14+/r15+ artifact: every numeric calib field parses as an anchor
    // (loadavg/jvms ride along; hostDriftFactor excludes them)
    write("BENCH_r11.json",
      """{"n":11,"parsed":{"queries":{"q1_agg":0.3},
        |"calib":{"sha256_1t_256mb_sec":0.2,"spark_10m_shuffle_sec":0.61,
        |"spark_1b_agg_sec":1.21,"loadavg":2.29,"jvms":2}}}""".stripMargin)
    val Some((_, _, a11)) = Bench.loadPrevBench(dir)
    assert(a11("spark_10m_shuffle_sec") == 0.61)
    assert(a11("spark_1b_agg_sec") == 1.21)
    assert(a11("loadavg") == 2.29) // parsed; excluded at ratio time
  }

  test("hostDriftFactor takes the median anchor ratio and outvotes one liar") {
    // the r14→r15 shape: both sha anchors say the host got 1.10× faster,
    // the overhead-bound 10M job claims 2.0× — median must side with
    // the pair, not the outlier
    val prev = Map("sha256_1t_256mb_sec" -> 0.287,
      "sha256_32t_4gb_sec" -> 0.186, "spark_10m_shuffle_sec" -> 0.59,
      "loadavg" -> 2.29, "jvms" -> 2.0)
    val cur = Map("sha256_1t_256mb_sec" -> 0.260,
      "sha256_32t_4gb_sec" -> 0.169, "spark_10m_shuffle_sec" -> 0.295,
      "spark_1b_agg_sec" -> 1.127, "loadavg" -> 0.3, "jvms" -> 2.0)
    val f = Bench.hostDriftFactor(prev, cur)
    assert(f > 1.0 && f < 1.2, s"median must track the sha pair: $f")
    // odd count: exact middle
    assert(Bench.hostDriftFactor(Map("a" -> 2.0), Map("a" -> 1.0)) == 2.0)
    // even count: geometric mean of the middle two
    val g = Bench.hostDriftFactor(Map("a" -> 2.0, "b" -> 8.0),
      Map("a" -> 1.0, "b" -> 1.0))
    assert(math.abs(g - 4.0) < 1e-9)
    // no shared anchors → raw comparison
    assert(Bench.hostDriftFactor(Map("a" -> 2.0), Map("b" -> 1.0)) == 1.0)
    // loadavg/jvms never count as anchors
    assert(Bench.hostDriftFactor(
      Map("loadavg" -> 4.0, "jvms" -> 8.0),
      Map("loadavg" -> 1.0, "jvms" -> 2.0)) == 1.0)
  }

  test("1B-anchored adjusted total normalizes drift and is defensive") {
    val quietAdj = Bench.adjustedTotalSpark1b(15.0, Bench.QuietCalibSpark1b)
    val slowAdj = Bench.adjustedTotalSpark1b(30.0, Bench.QuietCalibSpark1b * 2)
    assert(math.abs(quietAdj - slowAdj) < 1e-9)
    assert(quietAdj == 15.0)
    assert(Bench.adjustedTotalSpark1b(10.0, 0.0) == 10.0)
    assert(Bench.adjustedTotalSpark1b(10.0, -1.0) == 10.0)
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
