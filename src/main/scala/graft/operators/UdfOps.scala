package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{Interval, IntervalUnion}
import graft.plans.RangeChunks

/** Extensibility surface (SURVEY §2.3 "UDF / UDAF / UDTF"; Q-U1..U3):
  * a scalar Scala UDF, a typed `Aggregator` (interval-mask union, the B6
  * region algebra), and a custom Catalyst `Generator` (B5 chunk splitting).
  *
  * 100 TB note: UDFs break codegen fusion and predicate pushdown — they are
  * the LAST resort (the rest of this repo uses built-ins). These three exist
  * to prove the extension points, and each picks the cheapest extension
  * tier: scalar UDF for a one-off kernel, Aggregator for partial-agg-capable
  * state, Generator for streaming row expansion.
  */
object UdfOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q-U1: scalar Scala UDF — sha256 prefix + bucket (the CAS shard-prefix
    // idea: blocks fan out into buckets by leading hash byte).
    "u1_udf_sha_bucket" -> ((s, d) => {
      val shaPrefix = udf { (v: String) =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.digest(v.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      }
      t(s, d, "customer")
        .withColumn("sha_prefix", shaPrefix(col("c_name")))
        .select(
          col("c_custkey"), col("sha_prefix"),
          (conv(col("sha_prefix"), 16, 10).cast("long") % 16).as("bucket"))
        .orderBy("c_custkey")
    }),

    // Q-U2: interval-union Aggregator over synthetic [start, end) ranges
    // derived from lineitem — per-supplier covered length.
    "u2_interval_union" -> ((s, d) => {
      val iu = udaf(new IntervalUnion, Encoders.product[Interval])
      t(s, d, "lineitem")
        .select(
          col("l_suppkey").as("g"),
          ((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 1000).as("start"),
          (((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 1000) +
            floor(col("l_quantity")).cast("long") % 50 + 1).as("end"))
        .groupBy("g")
        .agg(iu(col("start"), col("end")).as("covered"))
        .orderBy("g")
    }),

    // Q-U3: range-chunk Generator — split fake object sizes into 200 KiB
    // fetch units (reference chunk size, core/datastore.go:106).
    "u3_range_chunks" -> ((s, d) => {
      RangeChunks.register(s)
      t(s, d, "documents")
        .selectExpr("doc_id", "range_chunks(n_chars * 997, 204800)")
        .orderBy("doc_id", "chunk_idx")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "u1_udf_sha_bucket" ->
      """SELECT c_custkey, substr(sha256(c_name), 1, 2) AS sha_prefix,
        |  CAST('0x' || substr(sha256(c_name), 1, 2) AS BIGINT) % 16 AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "u2_interval_union" ->
      """WITH r AS (
        |  SELECT l_suppkey AS g,
        |    (l_orderkey * 7 + l_linenumber * 3) % 1000 AS s,
        |    (l_orderkey * 7 + l_linenumber * 3) % 1000
        |      + CAST(floor(l_quantity) AS BIGINT) % 50 + 1 AS e
        |  FROM lineitem),
        |m AS (
        |  SELECT g, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY g ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM r),
        |i AS (
        |  SELECT g, s, e, SUM(brk) OVER (PARTITION BY g ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m),
        |c AS (SELECT g, island, max(e) - min(s) AS cov FROM i GROUP BY g, island)
        |SELECT g, CAST(SUM(cov) AS BIGINT) AS covered
        |FROM c GROUP BY g ORDER BY g""".stripMargin,

    "u3_range_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars * 997 AS sz,
        |    unnest(generate_series(0,
        |      CAST(ceil((n_chars * 997) / 204800.0) AS BIGINT) - 1)) AS chunk_idx
        |  FROM documents)
        |SELECT doc_id, chunk_idx,
        |  chunk_idx * 204800 AS chunk_start,
        |  least(204800, sz - chunk_idx * 204800) AS chunk_len
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
