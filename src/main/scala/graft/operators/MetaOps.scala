package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-table queries over the `pufs-meta` DSv2 source (Q-L5; the
  * reference's `ls` aggregation surface — M2 block stats,
  * reference core/datastore.go:445-466).
  *
  * l5 / l5b / l5d list a deterministic fixture tree that is a pure
  * function of the `nation` table, which makes a real DuckDB oracle
  * possible for a filesystem listing: the Spark side genuinely walks
  * directories through the DSv2 source, while the oracle recomputes the
  * expected listing/aggregates from `nation` alone. l5c (cache-population
  * stats) has no SQL-expressible oracle by nature — the driver records
  * the rows-only check and MetaSourceSpec asserts its semantics. */
object MetaOps {

  type Q = (SparkSession, String) => DataFrame

  /** Build (wipe + rebuild) the fixture tree under java.io.tmpdir:
    * for each nation row, three `r<region>/n<NK>_<j>.bin` files (j<3) of
    * size 64+13*nk+j bytes, and for nk%7==0 one `r<region>/deep/n<NK>.idx`
    * of size 32+nk — so every path, size, depth, and extension the meta
    * source reports is derivable from `nation` in SQL. Rebuilding on
    * every call keeps the listing deterministic even if an older fixture
    * shape is still on disk. */
  private[graft] def fixture(s: SparkSession, d: String): String = {
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_meta_fixture")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    val rows = s.read.parquet(s"$d/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect() // 25 rows: dim-sized
    rows.foreach { r =>
      val nk = r.getInt(0); val rk = r.getInt(1)
      val dir = new java.io.File(root, s"r$rk")
      dir.mkdirs()
      (0 until 3).foreach { j =>
        java.nio.file.Files.write(
          new java.io.File(dir, f"n$nk%02d_$j.bin").toPath,
          new Array[Byte](64 + 13 * nk + j))
      }
      if (nk % 7 == 0) {
        val deep = new java.io.File(dir, "deep")
        deep.mkdirs()
        java.nio.file.Files.write(
          new java.io.File(deep, f"n$nk%02d.idx").toPath,
          new Array[Byte](32 + nk))
      }
    }
    root.toString
  }

  val queries: Map[String, Q] = Map(
    // per-extension file count + total size over the fixture listing
    "l5_meta_agg" -> ((s, d) => {
      s.read.format("pufs-meta").load(fixture(s, d))
        .filter(!col("isDir"))
        .groupBy("ext")
        .agg(count(lit(1)).as("n_files"), sum("size").as("total_size"))
        .orderBy("ext")
    }),
    // the catalog listing itself: every row the walk produces — the root,
    // the directory nodes, and the files, in stable path order
    "l5b_meta_listing" -> ((s, d) => {
      s.read.format("pufs-meta").load(fixture(s, d))
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
    "l5d_small_file_report" -> ((s, d) => smallFileReport(s, fixture(s, d)))
  )

  /** Per-directory small-file report over ANY tree (the lane runs it over
    * the oracle fixture; operational callers point it at real data). */
  private[graft] def smallFileReport(s: SparkSession, root: String): DataFrame =
    s.read.format("pufs-meta").load(root)
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

  /** The fixture files recomputed from `nation` in SQL — shared CTE for
    * the three oracle queries. */
  private val FixtureFilesSql =
    """SELECT 'r' || n_regionkey || '/n' ||
      |         lpad(CAST(n_nationkey AS VARCHAR), 2, '0') || '_' || j ||
      |         '.bin' AS path,
      |       'r' || n_regionkey AS dir,
      |       CAST(64 + 13 * n_nationkey + j AS BIGINT) AS size,
      |       2 AS depth, 'bin' AS ext
      |FROM nation, (SELECT UNNEST([0, 1, 2]) AS j)
      |UNION ALL
      |SELECT 'r' || n_regionkey || '/deep/n' ||
      |         lpad(CAST(n_nationkey AS VARCHAR), 2, '0') || '.idx',
      |       'r' || n_regionkey || '/deep',
      |       CAST(32 + n_nationkey AS BIGINT), 3, 'idx'
      |FROM nation WHERE n_nationkey % 7 = 0""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "l5_meta_agg" ->
      s"""WITH files AS ($FixtureFilesSql)
         |SELECT ext, count(*) AS n_files, sum(size) AS total_size
         |FROM files GROUP BY ext ORDER BY ext""".stripMargin,
    "l5b_meta_listing" ->
      s"""WITH files AS ($FixtureFilesSql)
         |SELECT path, isDir, size, depth, ext FROM (
         |  SELECT path, false AS isDir, size, depth, ext FROM files
         |  UNION ALL
         |  SELECT '' AS path, true, CAST(0 AS BIGINT), 0, ''
         |  UNION ALL
         |  SELECT DISTINCT 'r' || n_regionkey, true, CAST(0 AS BIGINT), 1, ''
         |  FROM nation
         |  UNION ALL
         |  SELECT DISTINCT 'r' || n_regionkey || '/deep', true,
         |         CAST(0 AS BIGINT), 2, ''
         |  FROM nation WHERE n_nationkey % 7 = 0
         |) ORDER BY path""".stripMargin,
    "l5d_small_file_report" ->
      s"""WITH files AS ($FixtureFilesSql)
         |SELECT dir, count(*) AS n_files, sum(size) AS total_bytes,
         |       CAST(sum(size) AS DOUBLE) / count(*) AS avg_bytes,
         |       max(size) AS max_bytes,
         |       (count(*) > 8 AND
         |        CAST(sum(size) AS DOUBLE) / count(*) < 4194304.0)
         |         AS needs_compaction
         |FROM files GROUP BY dir ORDER BY dir""".stripMargin
  )
}
