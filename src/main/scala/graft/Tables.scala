package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver testdata layout (`$dir/<name>.parquet`).
  *
  * All engine queries read through here so the scan path is a single
  * choke-point: when the `pufs://` FileSystem layer is active the same
  * loader resolves paths through it (SURVEY §1.4 — byte-stream payloads read
  * via `spark.read` over the lazily-caching filesystem).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. Parquet scan → Catalyst handles column
    * pruning + predicate pushdown; callers must NOT cache or collect.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; we read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType column (lossless for this data — the
    * generator emits whole microseconds). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view (for SQL-only surfaces such as
    * GROUPING SETS — Spark SQL shares the same Catalyst plans). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
