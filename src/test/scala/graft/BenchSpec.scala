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
}
