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

  /** Build-if-absent the fixture tree under java.io.tmpdir: for each
    * nation row, three `r<region>/n<NK>_<j>.bin` files (j<3) of size
    * 64+13*nk+j bytes, and for nk%7==0 one `r<region>/deep/n<NK>.idx`
    * of size 32+nk — so every path, size, depth, and extension the meta
    * source reports is derivable from `nation` in SQL.
    *
    * Hermetic by construction: the directory name is content-addressed
    * (sha of the nation rows + fixture version), the tree is built into
    * a private temp dir and published with one atomic rename, and a
    * published fixture is NEVER modified or deleted — so any number of
    * concurrent lanes/processes see either nothing (and build their own
    * candidate) or a complete immutable tree. If the testdata is
    * regenerated with different nation rows, the sha changes and a new
    * fixture dir is built; stale ones are inert. */
  private[graft] def fixture(s: SparkSession, d: String): String = {
    val rows = s.read.parquet(s"$d/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect() // 25 rows: dim-sized
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(identity)
    val spec = "v2|" + rows.map { case (nk, rk) => s"$nk:$rk" }.mkString(",")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(spec.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val target = tmp.resolve(s"graft_meta_fixture_$sha")
    if (java.nio.file.Files.isDirectory(target)) return target.toString
    val build =
      java.nio.file.Files.createTempDirectory(tmp, s"graft_meta_build_$sha.")
    rows.foreach { case (nk, rk) =>
      val dir = build.resolve(s"r$rk")
      java.nio.file.Files.createDirectories(dir)
      (0 until 3).foreach { j =>
        java.nio.file.Files.write(
          dir.resolve(f"n$nk%02d_$j.bin"), new Array[Byte](64 + 13 * nk + j))
      }
      if (nk % 7 == 0) {
        val deep = dir.resolve("deep")
        java.nio.file.Files.createDirectories(deep)
        java.nio.file.Files.write(
          deep.resolve(f"n$nk%02d.idx"), new Array[Byte](32 + nk))
      }
    }
    try
      java.nio.file.Files.move(
        build, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        // if the target now exists, another lane/process published the
        // identical tree first: keep theirs, discard our candidate;
        // anything else is a real failure
        if (!java.nio.file.Files.isDirectory(target)) throw e
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(build.toFile)
    }
    target.toString
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
         |SELECT ext, count(*) AS n_files,
         |       CAST(sum(size) AS BIGINT) AS total_size
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
         |SELECT dir, count(*) AS n_files,
         |       CAST(sum(size) AS BIGINT) AS total_bytes,
         |       CAST(sum(size) AS DOUBLE) / count(*) AS avg_bytes,
         |       max(size) AS max_bytes,
         |       (count(*) > 8 AND
         |        CAST(sum(size) AS DOUBLE) / count(*) < 4194304.0)
         |         AS needs_compaction
         |FROM files GROUP BY dir ORDER BY dir""".stripMargin
  )
}
