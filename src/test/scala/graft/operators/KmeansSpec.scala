package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** l70's fit + serving invariants (the generated oracle pins the
  * assignment values; this pins what the oracle cannot see). */
class KmeansSpec extends SparkSpec {

  private def vecs = graft.Tables.t(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("Lloyd iterations do not increase the SSE objective") {
    val init = vecs.orderBy("vec_id").limit(LlmOps.KmK).collect().zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble).toSeq) }.toSeq
    val fitted = spark.read.parquet(LlmOps.KmFix.fixture(spark, sfDir))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    assert(fitted.size == LlmOps.KmK)
    def sse(c: Seq[(Int, Seq[Double])]): Double =
      LlmOps.KmFix.assign(vecs, c).agg(sum("dist")).collect()(0).getDouble(0)
    val (s0, s1) = (sse(init), sse(fitted))
    assert(s1 <= s0, s"Lloyd must not increase SSE: $s0 -> $s1")
  }

  test("fit runs on a deterministic id-hash sample under the cap; serve covers the full corpus") {
    // VERDICT r18 #6: the Lloyd fit was KmIters full-corpus passes —
    // at 100 TB, four O(n) scans for a K·d density summary. The fit
    // now samples by id-hash to ≤ ~cap rows (the l20/l37 discipline);
    // the frozen-fixture serve half still labels EVERY row map-only.
    val capKey = LlmOps.KmFix.FitSampleCapKey
    val saved = spark.conf.getOption(capKey)
    val d = java.nio.file.Files.createTempDirectory("km-sample-sf").toString
    graft.Tables.t(spark, sfDir, "embeddings")
      .write.parquet(s"$d/embeddings.parquet")
    try {
      spark.conf.set(capKey, "100") // 500-row corpus → stride 5
      val fix = LlmOps.KmFix.fixture(spark, d)
      val fitN = LlmOps.KmFix.lastFitN.get()
      assert(fitN >= LlmOps.KmK && fitN <= 200,
        s"fit input must sit near the 100-row cap, far under n=500: $fitN")
      val cents = spark.read.parquet(fix).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
      assert(cents.size == LlmOps.KmK, "a sampled fit still carries K centroids")
      // Lloyd monotonicity holds on the frame it optimizes — the sample
      // (stride 5 = ceil(500/100), the fixture's own rule)
      val sample = vecs.filter(
        pmod(xxhash64(col("vec_id")), lit(5L)) === 0)
      val init = sample.orderBy("vec_id").limit(LlmOps.KmK).collect()
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](1).map(_.toDouble).toSeq) }.toSeq
      def sse(c: Seq[(Int, Seq[Double])]): Double =
        LlmOps.KmFix.assign(sample, c).agg(sum("dist")).collect()(0).getDouble(0)
      assert(sse(cents) <= sse(init),
        "sampled Lloyd must not increase the sample SSE")
      // serving is untouched by how the fit sampled: every corpus row
      // labels in-range against the sampled fixture
      val out = LlmOps.KmFix.assign(vecs, cents).collect()
      assert(out.length == 500 &&
        out.forall(r => r.getInt(2) >= 0 && r.getInt(2) < LlmOps.KmK))
    } finally saved match {
      case Some(v) => spark.conf.set(capKey, v)
      case None => spark.conf.unset(capKey)
    }
  }

  test("assignment is exhaustive, in-range, and map-only") {
    val out = LlmOps.kmeansAssign(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == vecs.count().toInt, "every embedding labeled")
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < LlmOps.KmK))
    assert(rows.map(_.getInt(1)).distinct.length >= 2,
      "a degenerate one-cluster fit would make the lane vacuous")
    // the centroid table rides the plan as a literal: the sort-free
    // assignment has NO exchange and NO join anywhere in its plan
    val cents = spark.read.parquet(LlmOps.KmFix.fixture(spark, sfDir))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val plan = LlmOps.KmFix.assign(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"assignment must be map-only:\n$plan")
  }
}
