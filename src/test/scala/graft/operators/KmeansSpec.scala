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
