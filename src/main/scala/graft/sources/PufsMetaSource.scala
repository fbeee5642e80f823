package graft.sources

import java.io.File
import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `pufs-meta` — DataSource V2 read-only table exposing a directory tree as
  * the catalog/metadata DataFrame of SURVEY §1.4 (the reference's `ls`
  * surface: GetDirContents/GetExtendedDirContents,
  * reference core/datastore.go:445-482, walk 391-443; Entry row shape
  * api/api.proto:9-24).
  *
  * Usage: `spark.read.format("pufs-meta").load("/some/dir")`.
  * Options:
  *   maxDepth — listing-depth budget (reference M19 deferred child fetch,
  *     core/datastore.go:498-735: don't explore what wasn't asked for).
  *     Directories at the budget edge are listed as entries but NOT
  *     descended into.
  *
  * Scale design: one InputPartition per top-level child → listing
  * parallelizes across executors instead of a driver-side walk. Within a
  * partition the walk is an explicit-stack lazy iterator: a directory's
  * children are fetched only when the scan actually reaches it, so a
  * LIMIT or an early-terminating consumer never materializes the full
  * subtree (M19's IsDeferredChildFetch, observable via `dirsListed`).
  * Column pruning is pushed down (SupportsPushDownRequiredColumns), so
  * `SELECT ext, size` never materializes paths or block ids.
  *
  * The `populatedBytes`/`regionCount` columns surface the block cache's
  * region masks per file (reference GetExtendedDirContents M2 +
  * BlockStats, core/freezer.go:249-263) — how much of each file the lazy
  * FS has actually pulled.
  */
class PufsMetaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pufs-meta"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PufsMetaTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "pufs-meta requires .load(<directory>)")
    val maxDepth = Option(properties.get("maxdepth")).orElse(
      Option(properties.get("maxDepth"))).map(_.toInt).getOrElse(Int.MaxValue)
    new PufsMetaTable(path, maxDepth)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object PufsMetaTable {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("parent", StringType, nullable = false),
    StructField("isDir", BooleanType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("modTime", TimestampType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("blockId", StringType, nullable = false),
    StructField("populatedBytes", LongType, nullable = false),
    StructField("regionCount", IntegerType, nullable = false)))

  /** Observable count of directory listings performed by meta readers —
    * lets tests pin the deferred-listing contract (a LIMIT must not walk
    * the world). */
  val dirsListed = new AtomicInteger(0)
}

class PufsMetaTable(root: String, maxDepth: Int) extends Table with SupportsRead {
  override def name(): String = s"pufs-meta:$root"
  override def schema(): StructType = PufsMetaTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PufsMetaScanBuilder(root, maxDepth)
}

class PufsMetaScanBuilder(root: String, maxDepth: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PufsMetaTable.schema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }
  override def build(): Scan = new PufsMetaScan(root, maxDepth, required)
}

class PufsMetaScan(root: String, maxDepth: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rootFile = new File(root)
    require(rootFile.isDirectory, s"not a directory: $root")
    val children = Option(rootFile.listFiles()).getOrElse(Array.empty)
    // one partition per top-level child subtree + one for root's own files;
    // at object-store scale each partition is an independent prefix listing
    val subs = children.filter(_.isDirectory)
      .filter(_ => maxDepth >= 1)
      .map(c => PufsMetaPartition(root, c.getName, maxDepth): InputPartition)
    subs :+ PufsMetaPartition(root, "", maxDepth)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PufsMetaReaderFactory(required)
}

case class PufsMetaPartition(root: String, sub: String, maxDepth: Int)
    extends InputPartition

class PufsMetaReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PufsMetaPartition]
    new PufsMetaReader(p.root, p.sub, p.maxDepth, required)
  }
}

class PufsMetaReader(root: String, sub: String, maxDepth: Int,
    required: StructType) extends PartitionReader[InternalRow] {

  private val rootFile = new File(root)

  /** One snapshot of the block-cache stats per partition reader (O(1)
    * lookup per row; a per-row scan over the mask map would be O(files ×
    * cached-blocks) on a large listing). Only built if the scan actually
    * projects the stats columns. */
  private lazy val statsById: Map[String, (Long, Int)] =
    PufsFileSystem.blockStats
      .groupBy { case (key, _, _) => key.substring(key.indexOf('|') + 1) }
      .map { case (id, rows) =>
        id -> rows.foldLeft((0L, 0)) { case ((b, r), (_, b2, r2)) => (b + b2, r + r2) }
      }
  private lazy val wantsStats =
    required.fieldNames.contains("populatedBytes") ||
      required.fieldNames.contains("regionCount")

  /** Explicit-stack DFS that lists a directory's children only when the
    * consumer reaches it (M19 deferred child fetch) and never descends
    * past the depth budget. Children are pushed name-sorted so listing
    * order is deterministic. */
  private final class LazyWalk(start: File, startDepth: Int)
      extends Iterator[(File, Int)] {
    private val stack = scala.collection.mutable.Stack((start, startDepth))
    override def hasNext: Boolean = stack.nonEmpty
    override def next(): (File, Int) = {
      val cur @ (f, depth) = stack.pop()
      if (f.isDirectory && depth < maxDepth) {
        PufsMetaTable.dirsListed.incrementAndGet()
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName)(Ordering[String].reverse)
          .foreach(c => stack.push((c, depth + 1)))
      }
      cur
    }
  }

  private val iter: Iterator[(File, Int)] =
    if (sub.isEmpty) {
      // root partition: root itself + its top-level NON-DIRECTORY entries
      // (subdirs are covered by their own partitions; non-regular entries
      // — dangling symlinks, fifos — are emitted like LazyWalk emits them
      // one level down, so visibility does not depend on depth). The
      // root's listing counts once, is name-sorted like LazyWalk's, and
      // is SKIPPED entirely at maxDepth = 0 — listing children every one
      // of which the budget discards would both waste the IO and break
      // the deferred-listing observable.
      Iterator.single((rootFile, 0)) ++ (
        if (maxDepth >= 1) {
          PufsMetaTable.dirsListed.incrementAndGet()
          Option(rootFile.listFiles()).getOrElse(Array.empty)
            .filter(!_.isDirectory).sortBy(_.getName).iterator.map(f => (f, 1))
        } else Iterator.empty)
    } else new LazyWalk(new File(rootFile, sub), 1)

  private var cur: (File, Int) = _

  override def next(): Boolean = {
    if (iter.hasNext) { cur = iter.next(); true } else false
  }

  /** Projected column ordinals resolved ONCE per reader (not a per-row
    * Map of boxed closures): the scan hot path fills the row from a
    * switch, and expensive fields stay lazy so pruning actually prunes —
    * `SELECT ext, size` never computes a path string or a per-row
    * SHA-256 block id (the class-doc promise; a strict per-row blockId
    * would pay hash+hex for every row of a million-file listing). */
  private val colIdx: Array[Int] =
    required.fields.map(fd => PufsMetaTable.schema.fieldIndex(fd.name))

  override def get(): InternalRow = {
    val (f, depth) = cur
    lazy val relPath = rootFile.toPath.relativize(f.toPath).toString
    lazy val blockId = PufsFileSystem.syntheticBlockId(root, relPath,
      if (f.isFile) f.length() else 0L,
      f.lastModified(), PufsFileSystem.generationOf(root, relPath))
    // M2: join the block cache's population state into the listing row
    lazy val stats =
      if (f.isFile && wantsStats) statsById.getOrElse(blockId, (0L, 0)) else (0L, 0)
    val vals = new Array[Any](colIdx.length)
    var i = 0
    while (i < colIdx.length) {
      vals(i) = colIdx(i) match {
        case 0 => UTF8String.fromString(relPath)
        case 1 => UTF8String.fromString(if (relPath.isEmpty) "." else f.getName)
        case 2 => UTF8String.fromString(
          Option(new File(relPath).getParent).getOrElse(""))
        case 3 => f.isDirectory
        case 4 => if (f.isFile) f.length() else 0L
        case 5 => f.lastModified() * 1000L // micros
        case 6 => depth
        case 7 =>
          val n = f.getName
          val d = n.lastIndexOf('.')
          UTF8String.fromString(
            if (!f.isFile || d <= 0) "" else n.substring(d + 1))
        case 8 => UTF8String.fromString(blockId)
        case 9 => stats._1
        case 10 => stats._2
      }
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
