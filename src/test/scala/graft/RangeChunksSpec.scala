package graft

import graft.plans.RangeChunks

/** The range-chunk Generator (Q-U3): chunk math matches the reference's
  * ensurePulled alignment (reference core/freezer.go:125-183). */
class RangeChunksSpec extends SparkSpec {

  test("chunks cover [0, size) exactly, last chunk truncated") {
    RangeChunks.register(spark)
    import graft.SparkSpec.spark.implicits._
    val df = Seq((1L, 500L), (2L, 1024L), (3L, 0L), (4L, 100L))
      .toDF("id", "sz")
      .selectExpr("id", "range_chunks(sz, 256)")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // id=1: 500/256 -> 2 chunks (256, 244); id=2: 4x256; id=3: none; id=4: 1x100
    assert(rows.count(_._1 == 1) == 2)
    assert(rows.filter(_._1 == 1).map(_._4).sum == 500)
    assert(rows.count(_._1 == 2) == 4)
    assert(rows.filter(_._1 == 2).forall(_._4 == 256))
    assert(rows.count(_._1 == 3) == 0)
    assert(rows.filter(_._1 == 4).toSeq == Seq((4L, 0L, 0L, 100L)))
    // starts are contiguous chunk-aligned
    rows.filter(_._1 == 2).sortBy(_._2).zipWithIndex.foreach { case ((_, idx, start, _), i) =>
      assert(idx == i && start == i * 256L)
    }
  }

  test("null and non-positive inputs yield no rows") {
    RangeChunks.register(spark)
    import graft.SparkSpec.spark.implicits._
    val df = Seq((1L, -5L), (2L, 0L)).toDF("id", "sz")
      .selectExpr("id", "range_chunks(sz, 256)")
    assert(df.count() == 0)
  }
}
