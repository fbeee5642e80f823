package graft.sources

import graft.SparkSpec

/** RegionMask.add/missing — the reference's interval algebra
  * (region/region.go:28-124; regression shapes region_test.go:59-146),
  * property-checked against a brute-force bitset model. */
class RegionMaskSpec extends SparkSpec {

  test("missing() against brute-force model (300 seeded cases)") {
    val rnd = new scala.util.Random(1234)
    (1 to 300).foreach { i =>
      val mask = new RegionMask
      val model = Array.fill(300)(false)
      (0 until rnd.nextInt(12)).foreach { _ =>
        val s = rnd.nextInt(250); val len = rnd.nextInt(60)
        mask.add(s, s + len)
        (s until math.min(300, s + len)).foreach(model(_) = true)
      }
      val qs = rnd.nextInt(280); val qe = qs + 1 + rnd.nextInt(20)
      val got = mask.missing(qs, qe)
      val expect = (qs until qe).filterNot(model(_))
      val gotFlat = got.flatMap { case (a, b) => a until b }
      assert(gotFlat == expect, s"case $i: mask=${mask.snapshot} q=($qs,$qe)")
      // missing ranges must be disjoint + sorted
      got.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("regression shapes") {
    val m = new RegionMask
    m.add(0, 100)
    assert(m.missing(0, 100).isEmpty)
    assert(m.missing(50, 150) == Seq((100L, 150L)))
    m.add(200, 300)
    assert(m.missing(0, 400) == Seq((100L, 200L), (300L, 400L)))
    m.add(100, 200) // bridge
    assert(m.missing(0, 300).isEmpty)
    assert(m.regionCount == 1 && m.populatedBytes == 300)
  }

  test("contains and empty queries") {
    val m = new RegionMask
    assert(!m.contains(0, 1))
    assert(m.missing(5, 5).isEmpty) // empty query
    m.add(10, 20)
    assert(m.contains(10, 20) && m.contains(12, 18) && !m.contains(9, 11))
  }
}
