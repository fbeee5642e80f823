package graft.operators

import java.io.File

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
      predicate: org.apache.spark.sql.Column): (Int, Int) = {
    import org.apache.spark.sql.functions.input_file_name
    val touched = spark.read.parquet(src)
      .filter(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => new File(new java.net.URI(r.getString(0))).getName)
      .toSet
    val dstDir = new File(dst)
    dstDir.mkdirs()
    val (hit, keep) = dataFiles(src).partition(f => touched.contains(f.getName))
    keep.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new File(dstDir, f.getName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    if (hit.nonEmpty) {
      spark.read.parquet(hit.map(_.getAbsolutePath): _*)
        .filter(!predicate)
        .write.mode("append").parquet(dst)
    }
    (hit.size, keep.size)
  }

  /** Copy-on-write UPDATE — deleteWhere's twin: touched files rewrite
    * with `assignments` applied to matching rows (non-matching rows in a
    * touched file rewrite unchanged — file granularity is the rewrite
    * unit), untouched files copy byte-identically. Returns
    * (touched, untouched). */
  def updateWhere(spark: SparkSession, src: String, dst: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): (Int, Int) = {
    import org.apache.spark.sql.functions.{input_file_name, when => sqlWhen, col => sqlCol}
    val touched = spark.read.parquet(src)
      .filter(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => new File(new java.net.URI(r.getString(0))).getName)
      .toSet
    val dstDir = new File(dst)
    dstDir.mkdirs()
    val (hit, keep) = dataFiles(src).partition(f => touched.contains(f.getName))
    keep.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new File(dstDir, f.getName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    if (hit.nonEmpty) {
      val updated = assignments.foldLeft(
        spark.read.parquet(hit.map(_.getAbsolutePath): _*)) {
        case (df, (c, v)) =>
          df.withColumn(c, sqlWhen(predicate, v).otherwise(sqlCol(c)))
      }
      updated.write.mode("append").parquet(dst)
    }
    (hit.size, keep.size)
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
      numFiles: Int, colA: String, colB: String): Unit = {
    val df = spark.read.parquet(src)
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .collect()(0)
    def norm(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, 1e-300)
      least(floor((col(c).cast("double") - lo) / span * 65536.0), lit(65535.0))
        .cast("long")
    }
    graft.functions.ZOrder.register(spark)
    val z = call_function("zorder2",
      norm(colA, b.getDouble(0), b.getDouble(1)),
      norm(colB, b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dst)
  }
}
