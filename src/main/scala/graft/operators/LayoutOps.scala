package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-layout maintenance operators — the OPTIMIZE-style levers a 100 TB
  * table needs between writes and reads. The reference's model (write-once
  * immutable blocks, republish to change layout — README.md:5-17) maps to
  * rewrite-into-a-new-snapshot-dir here; publishing the result is
  * SnapshotStore.publish.
  *
  *  - compact: a streaming/ingest job drops thousands of small files per
  *    hour; scans then pay one task + one open per file. Rewriting into
  *    ~targetBytes files restores scan efficiency.
  *  - clusterBy: range-partition + sort so every output file covers a
  *    DISJOINT range of the cluster key — parquet min/max footer stats
  *    then let a range predicate skip whole files (the poor man's
  *    Z-order, exact for single-key clustering).
  */
object LayoutOps {

  private def dataFiles(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  /** Small-file compaction: rewrite `src` into ceil(bytes/targetBytes)
    * files at `dst`. Uses coalesce (no shuffle — each output task
    * concatenates input splits) when shrinking, which is the common case;
    * repartition only if the table must grow its file count. Returns
    * (files before, files after). */
  def compact(spark: SparkSession, src: String, dst: String,
      targetBytes: Long): (Int, Int) = {
    val pre = dataFiles(src)
    val totalBytes = pre.map(_.length).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(src)
    val out = if (n < pre.size) df.coalesce(n) else df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    (pre.size, dataFiles(dst).size)
  }

  /** Range-cluster `src` by `cols` into `numFiles` files at `dst`:
    * repartitionByRange gives disjoint key ranges per output partition
    * (sampled range boundaries — one pass, scale-safe), sortWithinPartitions
    * orders rows inside each file so row-group min/max stats are tight.
    * A later scan with a range predicate on the cluster key prunes whole
    * files from the footer stats alone. */
  def clusterBy(spark: SparkSession, src: String, dst: String,
      numFiles: Int, cols: String*): Unit =
    spark.read.parquet(src)
      .repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(dst)

  /** Copy-on-write DELETE — the file-granular DML primitive: find the
    * files that actually contain matching rows (one pushed-down scan over
    * `input_file_name`), hard-link/copy every untouched file into `dst`
    * unchanged, and rewrite only the touched ones with the predicate
    * inverted. At 100 TB a selective delete touches a sliver of files;
    * rewriting just those is the difference between O(matches') IO and a
    * full-table rewrite. The driver holds only the touched-file LIST
    * (bounded by file count). Combined with o7 (MERGE as a full-outer
    * join) and dynamic partition overwrite, this completes the DML story
    * over write-once storage. Returns (touched, untouched) file counts. */
  def deleteWhere(spark: SparkSession, src: String, dst: String,
      predicate: org.apache.spark.sql.Column): (Int, Int) =
    // keep = predicate FALSE or NULL (SQL DELETE removes only TRUE rows;
    // a bare !pred would also drop the NULL rows, and only in touched
    // files — making survival depend on file co-location)
    cowRewrite(spark, src, dst, predicate,
      df => df.filter(!coalesce(predicate, lit(false))))

  /** Copy-on-write UPDATE — deleteWhere's twin: touched files rewrite
    * with `assignments` applied to matching rows (non-matching rows in a
    * touched file rewrite unchanged — file granularity is the rewrite
    * unit), untouched files copy byte-identically. All assignments
    * evaluate against the ORIGINAL row (one projection via withColumns),
    * so an assignment can never see a sibling assignment's new value or
    * flip the predicate mid-update. Returns (touched, untouched). */
  def updateWhere(spark: SparkSession, src: String, dst: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): (Int, Int) =
    cowRewrite(spark, src, dst, predicate,
      df => df.withColumns(assignments.map { case (c, v) =>
        c -> when(predicate, v).otherwise(col(c))
      }))

  /** Shared CoW core: list data files RECURSIVELY (partition-dir layouts
    * like yr=1996/part-*.parquet included), copy untouched files into dst
    * preserving their relative paths, and rewrite touched files grouped
    * by their parent directory so rewritten rows land back in their own
    * partition directory. Caveat: the rewrite re-reads touched files
    * WITHOUT partition-inference, so `predicate` (and update values) must
    * reference file-resident data columns — a partition-column predicate
    * fails the rewrite loudly rather than corrupting the table. */
  private def cowRewrite(spark: SparkSession, src: String, dst: String,
      predicate: org.apache.spark.sql.Column,
      rewrite: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Int, Int) = {
    import org.apache.spark.sql.functions.input_file_name
    val srcRoot = new File(src).getCanonicalFile.toPath
    val dstRoot = new File(dst).getCanonicalFile.toPath
    java.nio.file.Files.createDirectories(dstRoot)
    val touched = spark.read.parquet(src)
      .filter(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect()
      .map(r => new File(new java.net.URI(r.getString(0))).getCanonicalFile.toPath)
      .toSet
    val (hit, keep) = dataFilesRecursive(srcRoot.toFile)
      .partition(f => touched.contains(f.getCanonicalFile.toPath))
    keep.foreach { f =>
      val target = dstRoot.resolve(srcRoot.relativize(f.getCanonicalFile.toPath))
      java.nio.file.Files.createDirectories(target.getParent)
      java.nio.file.Files.copy(f.toPath, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    hit.groupBy(f => srcRoot.relativize(f.getCanonicalFile.toPath).getParent)
      .foreach { case (relDir, fs) =>
        val out = Option(relDir).fold(dstRoot)(dstRoot.resolve)
        rewrite(spark.read.parquet(fs.map(_.getAbsolutePath): _*))
          .write.mode("append").parquet(out.toString)
      }
    (hit.size, keep.size)
  }

  private def dataFilesRecursive(dir: File): Seq[File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty[File])
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq ++
      here.filter(_.isDirectory).flatMap(dataFilesRecursive)
  }

  /** Z-order cluster `src` by TWO numeric keys into `numFiles` files:
    * each key is min-max normalized to 16-bit space (two tiny agg
    * broadcasts — rank-normalization via range buckets is the refinement
    * for skewed keys), Morton-interleaved by the codegen'd `zorder2`
    * kernel, then range-partitioned + sorted on the z-value. Every output
    * file covers a bounded RECTANGLE of (a, b) space, so parquet footer
    * min/max stats prune files for predicates on EITHER key — the
    * multi-dimensional upgrade of clusterBy's single-key ranges
    * (LayoutSpec measures the pruning on both dimensions). */
  def clusterByZOrder(spark: SparkSession, src: String, dst: String,
      numFiles: Int, colA: String, colB: String): Unit =
    clusterByZOrderN(spark, src, dst, numFiles, Seq(colA, colB))

  /** OPTIMIZE — compaction and clustering in ONE rewrite, the
    * Delta-style maintenance verb: the output file count comes from the
    * source's bytes (the [[compact]] sizing rule), the layout from
    * `cols` — none = pure compaction, one = range clustering
    * ([[clusterBy]]), two-plus = z-order ([[clusterByZOrderN]]). A
    * small-file table with a clustering need pays a single read+write
    * pass instead of compact-then-cluster's two; at 100 TB the second
    * full rewrite is exactly the cost worth deleting. Returns (files
    * before, files after). */
  /** Incremental OPTIMIZE — the 100 TB form of [[optimize]]: only src
    * part files added since the LAST pass are read and rewritten. A
    * `_OPTIMIZED` manifest at `dst` records which src files each pass
    * already represented; new files' rows cluster into a fresh
    * GENERATION of z-ordered files (`gen<K>-part-*`), copied in next to
    * the previous generations, whose bytes are never touched again —
    * the write-once model all the repo's storage keeps. Readers just
    * read `dst`. Layout quality is per-generation (each OPTIMIZE batch
    * is z-ordered independently — the Delta OPTIMIZE contract): every
    * file still covers a bounded box of key space, so footer pruning
    * holds; what incrementality forgoes is cross-generation file
    * merging, which a periodic FULL [[optimize]] restores. A streaming
    * ingest dropping small files per trigger pays O(new bytes) per
    * maintenance pass instead of O(table). Returns (src files
    * rewritten this pass, src files already represented). */
  def optimizeIncremental(spark: SparkSession, src: String, dst: String,
      targetBytes: Long, cols: Seq[String]): (Int, Int) = {
    require(cols.size >= 2, "optimizeIncremental clusters by 2+ columns")
    val manifest = Paths.get(dst, "_OPTIMIZED")
    java.nio.file.Files.createDirectories(Paths.get(dst))
    val done: Set[String] =
      if (java.nio.file.Files.exists(manifest))
        Files.readAllLines(manifest).asScala.filter(_.nonEmpty).toSet
      else Set.empty
    val fresh = dataFiles(src).filterNot(f => done(f.getName))
    if (fresh.isEmpty) return (0, done.size)
    val gen = done.size // monotone: manifest only grows
    val n = math.max(1,
      math.ceil(fresh.map(_.length).sum.toDouble / targetBytes).toInt)
    val tmp = s"$dst/.gen.tmp"
    zorderWrite(spark,
      spark.read.parquet(fresh.map(_.getAbsolutePath): _*), tmp, n, cols)
    // a predecessor that crashed after moving its gen files but before
    // its manifest write left THIS generation partially materialized —
    // and the retry's file count may differ, so stragglers would
    // double-count rows. Clear the generation before re-moving.
    dataFiles(dst).filter(_.getName.startsWith(s"gen$gen-part-"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    dataFiles(tmp).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath,
        Paths.get(dst, s"gen$gen-part-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new File(tmp))
    // manifest rewrite is temp + atomic move — a crash leaves the OLD
    // manifest, and the next pass re-clusters the same fresh files into
    // a recomputed gen dir (REPLACE_EXISTING above), never losing rows
    val mTmp = Paths.get(dst, "_OPTIMIZED.tmp")
    Files.write(mTmp,
      (done ++ fresh.map(_.getName)).toSeq.sorted.mkString("\n").getBytes)
    java.nio.file.Files.move(mTmp, manifest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    (fresh.size, done.size)
  }

  def optimize(spark: SparkSession, src: String, dst: String,
      targetBytes: Long, cols: Seq[String] = Nil): (Int, Int) =
    if (cols.isEmpty) compact(spark, src, dst, targetBytes)
    else {
      val pre = dataFiles(src)
      val n = math.max(1,
        math.ceil(pre.map(_.length).sum.toDouble / targetBytes).toInt)
      if (cols.size == 1) clusterBy(spark, src, dst, n, cols.head)
      else clusterByZOrderN(spark, src, dst, n, cols)
      (pre.size, dataFiles(dst).size)
    }

  /** N-dimensional z-order clustering (OPTIMIZE ZORDER BY c1, ..., cN):
    * each key min-max normalizes to min(16, 63/n)-bit space (one tiny
    * 2n-column agg broadcast; rank-normalization via range buckets is
    * the refinement for skewed keys), the `zorderN` kernel interleaves
    * — the 2-D and 3-D arities run the loop-free mask-shift kernels,
    * 4+ the generic bit loop — then range-partition + sort on the
    * z-value. Every output file covers a bounded BOX of the n-dim key
    * space, so parquet footer min/max stats prune files for predicates
    * on ANY clustered key (LayoutSpec measures per-dimension pruning at
    * n = 2 and n = 3). Resolution falls as 63/n bits per dimension —
    * the reason OPTIMIZE ZORDER guidance caps the column list. */
  def clusterByZOrderN(spark: SparkSession, src: String, dst: String,
      numFiles: Int, cols: Seq[String]): Unit =
    zorderWrite(spark, spark.read.parquet(src), dst, numFiles, cols)

  /** The frame-level z-order write shared by [[clusterByZOrderN]] and
    * [[optimizeIncremental]]: min-max normalize each key over THIS
    * frame, interleave via the arity-dispatched `zordern` kernel,
    * range-partition + sort on the z-value, write `numFiles` files. */
  private def zorderWrite(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, dst: String,
      numFiles: Int, cols: Seq[String]): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order clustering takes 2 to 8 columns, got ${cols.size}")
    val b = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("double"),
        max(col(c)).cast("double"))).head,
      cols.flatMap(c => Seq(min(col(c)).cast("double"),
        max(col(c)).cast("double"))).tail: _*).collect()(0)
    val bits = math.min(16, 63 / cols.size)
    val buckets = (1L << bits).toDouble
    def norm(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, 1e-300)
      least(floor((col(c).cast("double") - lo) / span * buckets),
        lit(buckets - 1)).cast("long")
    }
    graft.functions.ZOrder.register(spark)
    val z = call_function("zordern", cols.zipWithIndex.map { case (c, i) =>
      norm(c, b.getDouble(2 * i), b.getDouble(2 * i + 1))
    }: _*)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dst)
  }
}
