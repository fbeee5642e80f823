package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys (SURVEY "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins; these cover the cases
  * it doesn't: single hot-key AGGREGATIONS (one reducer owns the hot key)
  * and broadcast-ineligible hot joins. The pattern is the standard two
  * phases: spray the hot key across `saltBuckets` partial groups, then
  * combine the partials — shuffle #1 carries (key, salt) so no single task
  * owns a hot key; shuffle #2 carries one row per (key, salt).
  */
object SkewOps {

  /** Salted count: exact counts per key, skew-proof.
    * count is re-aggregatable (sum of partial counts), as are sum/min/max —
    * the same two-phase shape applies to any commutative monoid. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int = 32): DataFrame = {
    require(saltBuckets > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("cnt"))
  }

  /** Salted sum over a numeric column (same two-phase shape). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 32): DataFrame = {
    require(saltBuckets > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("total"))
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right side
    * that is still too big (or ineligible) to broadcast: replicate each
    * right row `saltBuckets` times, salt the left rows randomly-but-
    * deterministically, join on (key, salt). Output cardinality is
    * identical to the plain join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(leftKey), spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // qualify BOTH key refs like the __salt comparison: a bare col(key)
    // is ambiguous whenever the name exists on both sides (self-joins —
    // the canonical skew case — or same-named keys) and fails analysis
    saltedLeft.join(explodedRight,
        saltedLeft("__salt") === explodedRight("__salt") &&
          saltedLeft(leftKey) === explodedRight(rightKey))
      .drop("__salt")
  }
}
