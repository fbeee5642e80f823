package graft

import org.apache.spark.sql.functions._

/** Data-layout levers for 100 TB: bucketing (co-located, shuffle-free
  * joins) and partition pruning (skip whole directories at plan time).
  * These are the storage-side halves of SURVEY §2.3's "Partitioning &
  * shuffle" commitments — asserted on physical plans, not prose. */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val line = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice")
    val supp = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey", "s_nationkey")
    line.write.mode("overwrite").option("path", s"$wh/line_bkt")
      .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
      .saveAsTable("line_bkt")
    supp.write.mode("overwrite").option("path", s"$wh/supp_bkt")
      .bucketBy(8, "s_suppkey").sortBy("s_suppkey")
      .saveAsTable("supp_bkt")
    // disable broadcast so the join would OTHERWISE shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("line_bkt")
        .join(spark.table("supp_bkt"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(sum("l_extendedprice").as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // co-located buckets: the ONLY exchange in the whole plan is the
      // post-join groupBy repartition — an unbucketed plan has three
      // (both join inputs + the groupBy)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected 1 exchange (groupBy only), found $exchanges — " +
          s"join sides shuffled despite bucketing:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and the result is right (vs the unbucketed plan)
      val expect = line.join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey").agg(sum("l_extendedprice").as("rev"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet &&
        got.forall { case (k, v) => math.abs(v - expect(k)) < 1e-6 })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition pruning reads only the filtered partition directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // the scan must report fewer files than the full table
    val scanAll = spark.read.parquet(out)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().map {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
        case _ => 0L
      }.sum
    val few = filesRead(pruned)
    val all = filesRead(scanAll)
    assert(few > 0 && few < all,
      s"pruning read $few of $all files — partition filter not applied")
    // correctness of the pruned read
    assert(pruned.count() ==
      Tables.t(spark, sfDir, "orders")
        .filter(year(col("o_orderdate")) === 1995).count())
  }
}
