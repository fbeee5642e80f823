package graft

import graft.functions.{Interval, IntervalUnion}

/** Property tests for the interval-union Aggregator — the region-mask
  * algebra (reference region/region.go:28-124; regression shapes of
  * region/region_test.go:59-146 re-expressed as properties + cases).
  * Seeded-random property loops (deterministic, offline-friendly). */
class IntervalUnionSpec extends SparkSpec {

  private val iu = new IntervalUnion

  private def bruteForce(ivs: Seq[(Long, Long)]): Long =
    ivs.flatMap { case (s, e) => s until e }.distinct.size.toLong

  private def viaAggregator(ivs: Seq[(Long, Long)]): Long =
    iu.finish(ivs.foldLeft(iu.zero) { case (b, (s, e)) => iu.reduce(b, Interval(s, e)) })

  private def randomIntervals(rnd: scala.util.Random, n: Int): List[(Long, Long)] =
    List.fill(n) {
      val s = rnd.nextLong(200)
      (s, s + rnd.nextLong(41))
    }

  test("covered length equals brute-force set coverage (200 cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { i =>
      val ivs = randomIntervals(rnd, rnd.nextInt(15))
      assert(viaAggregator(ivs) == bruteForce(ivs), s"case $i: $ivs")
    }
  }

  test("merge is order-independent (partial aggregation safe)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { i =>
      val a = randomIntervals(rnd, rnd.nextInt(10))
      val b = randomIntervals(rnd, rnd.nextInt(10))
      val bufA = a.foldLeft(iu.zero) { case (buf, (s, e)) => iu.reduce(buf, Interval(s, e)) }
      val bufB = b.foldLeft(iu.zero) { case (buf, (s, e)) => iu.reduce(buf, Interval(s, e)) }
      assert(iu.finish(iu.merge(bufA, bufB)) == iu.finish(iu.merge(bufB, bufA)), s"case $i")
      assert(iu.finish(iu.merge(bufA, bufB)) == bruteForce(a ++ b), s"case $i")
    }
  }

  test("buffer stays sorted and disjoint") {
    val rnd = new scala.util.Random(99)
    (1 to 100).foreach { i =>
      val ivs = randomIntervals(rnd, rnd.nextInt(15))
      val buf = ivs.foldLeft(iu.zero) { case (b, (s, e)) => iu.reduce(b, Interval(s, e)) }
      val pairs = buf.grouped(2).map(p => (p(0), p(1))).toSeq
      pairs.foreach { case (s, e) => assert(s < e, s"case $i: degenerate $buf") }
      pairs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1, s"case $i: overlap/touch $buf")
        case _ =>
      }
    }
  }

  // deterministic regression shapes (adjacent merge, containment, bridge)
  test("regression cases") {
    assert(viaAggregator(Seq((0L, 5L), (5L, 8L))) == 8L)             // touching merges
    assert(viaAggregator(Seq((0L, 10L), (2L, 3L))) == 10L)           // contained
    assert(viaAggregator(Seq((0L, 2L), (8L, 10L), (1L, 9L))) == 10L) // bridge
    assert(viaAggregator(Seq((5L, 5L))) == 0L)                       // empty interval
    assert(viaAggregator(Nil) == 0L)
    assert(viaAggregator(Seq((0L, 2L), (4L, 6L))) == 4L)             // disjoint
  }
}
