package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-table queries over the `pufs-meta` DSv2 source (Q-L5; the
  * reference's `ls` aggregation surface — M2 block stats,
  * reference core/datastore.go:445-466).
  *
  * No DuckDB oracle: a filesystem listing isn't SQL-expressible over the
  * parquet tables (driver records the rows-only check); MetaSourceSpec
  * asserts exact listings over a generated fixture tree instead. */
object MetaOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // per-extension file count + total size over the testdata dir itself
    "l5_meta_agg" -> ((s, d) => {
      s.read.format("pufs-meta").load(d)
        .filter(!col("isDir"))
        .groupBy("ext")
        .agg(count(lit(1)).as("n_files"), sum("size").as("total_size"))
        .orderBy("ext")
    }),
    // the catalog listing itself (paths + sizes, stable order)
    "l5b_meta_listing" -> ((s, d) => {
      s.read.format("pufs-meta").load(d)
        .select("path", "isDir", "size", "depth", "ext")
        .orderBy("path")
    }),
    // M2 extended listing: per-file cache-population state — how much of
    // each file the lazy pufs:// FS has pulled (reference
    // GetExtendedDirContents + BlockStats, core/freezer.go:249-263;
    // populated fields api/api.proto:18-19)
    "l5c_meta_cache_stats" -> ((s, d) => {
      s.read.format("pufs-meta").load(d)
        .filter(!col("isDir"))
        .select(col("path"), col("size"), col("populatedBytes"),
          col("regionCount"),
          (col("populatedBytes").cast("double") / col("size")).as("cached_frac"))
        .orderBy("path")
    }),
    // the table-maintenance planner's input: per-directory file count and
    // mean size, flagging small-file debris for LayoutOps.compact (the
    // catalog query that DRIVES compaction at fleet scale)
    "l5d_small_file_report" -> ((s, d) => {
      s.read.format("pufs-meta").load(d)
        .filter(!col("isDir"))
        .withColumn("dir",
          when(col("path").contains("/"),
            regexp_extract(col("path"), "^(.*)/[^/]+$", 1)).otherwise(lit(".")))
        .groupBy("dir")
        .agg(count(lit(1)).as("n_files"),
          sum("size").as("total_bytes"),
          (sum("size").cast("double") / count(lit(1))).as("avg_bytes"),
          max(col("size")).as("max_bytes"))
        .withColumn("needs_compaction",
          col("n_files") > 8 && col("avg_bytes") < 4.0 * 1024 * 1024)
        .orderBy("dir")
    })
  )

  val oracleSql: Map[String, String] = Map.empty
}
