package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions.udaf

import graft.functions.{Interval, IntervalUnion}

/** One-call session attach — the "switch to this engine" surface for a
  * SQL-first user: after `GraftSession.attach(spark, dir)` every testdata
  * table is a view and the full custom-function surface is callable from
  * plain `spark.sql`:
  *
  *   - `dot_f32(a, b)`, `cosine_f32(a, b)`, `sign_lsh(v, bands, bits)` —
  *     codegen'd vector kernels (functions/VectorExpressions.scala)
  *   - `range_chunks(size, chunk)` — generator splitting a byte range into
  *     fetch units (plans/RangeChunks.scala, reference B5)
  *   - `interval_union(start, end)` — aggregate covered length over
  *     [start, end) intervals (functions/IntervalUnion.scala, reference B6)
  *
  * DataFrame users get the same things from the operator objects; this
  * facade only wires names, it owns no logic.
  */
object GraftSession {
  def attach(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerViews(spark, sfDir)
    graft.functions.VectorExpressions.register(spark)
    graft.plans.RangeChunks.register(spark)
    spark.udf.register("interval_union",
      udaf(new IntervalUnion, Encoders.product[Interval]))
  }
}
