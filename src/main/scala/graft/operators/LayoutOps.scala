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
      here.filter(d => d.isDirectory &&
          // skip metadata/staging dirs a writer leaves behind
          // (_spark_metadata, .gen.tmp) — Spark readers hide them too
          !d.getName.startsWith("_") && !d.getName.startsWith("."))
        .flatMap(dataFilesRecursive)
  }

  /** Z-order cluster `src` by TWO numeric keys into `numFiles` files:
    * each key is RANK-normalized via approx-quantile range buckets (one
    * quantile pass; robust under key skew — see [[zorderWrite]]),
    * Morton-interleaved by the codegen'd `zorder2`/`zordern` kernel,
    * then range-partitioned + sorted on the z-value. Every output
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
    * holds.
    *
    * FILE IDENTITY (advisor r16, tightened r18): a manifest entry is
    * `relativePath \t size \t mtime` — the same (path, length, mtime)
    * identity PufsFileSystem uses for block identity — not a bare file
    * name; mtime is recorded at NANOSECOND precision so a same-size
    * in-place replacement within one millisecond tick still trips the
    * guard (advisor r17). A src file whose bytes were REPLACED under the same name
    * (an upstream re-compaction, a non-write-once writer) fails the
    * pass LOUDLY instead of silently serving its stale rows: its OLD
    * rows already live in an earlier generation, so re-clustering the
    * new bytes would double-count and skipping them would serve the
    * old table — neither is silently correct. A src file that
    * DISAPPEARED keeps its rows in dst (the verb optimizes an
    * append-only ingest dir; deletion is [[deleteWhere]]'s job).
    * Pre-r17 name-only manifest lines still match by name.
    *
    * PARTITIONED SOURCES: src files are listed RECURSIVELY, so a
    * Hive-partitioned streaming sink (`date=…/part-*.parquet`) — the
    * verb's target use case — is visible; partition values are read
    * back (basePath inference) and land in the generation files as
    * ordinary columns, so dst serves the same rows as src with the
    * partition columns physical.
    *
    * GENERATION FOLD (`maxGenerations`, TIERED since r19): each pass
    * adds a generation, and a per-trigger streaming ingest would
    * accumulate exactly the small-generation debris OPTIMIZE exists to
    * kill. Once `dst` holds `maxGenerations` live generations, the
    * pass FOLDS — but SIZE-TIERED (LSM-style, VERDICT r17 #3 / r18
    * #2), not all-at-once: the SMALLEST generations (always enough to
    * bring the live count back under `maxGenerations`, then more while
    * the folded bytes stay within [[FoldFraction]] of the live table)
    * plus the fresh rows rewrite through one z-order into a single new
    * generation; the big generations' bytes are NOT touched. The old
    * full fold staged the ENTIRE table through one shuffle+sort with
    * no intermediate commit — at 100 TB that is the single giant pass
    * tiering exists to forbid. Any one pass now stages at most
    * max(FoldFraction × live bytes, the k-smallest the count bound
    * forces); a byte migrates into ever-larger generations and so
    * rewrites O(log(table / trigger)) times over any ingest history —
    * the LSM amortization — instead of every `maxGenerations` passes.
    * The fold is crash-safe via a `_FOLD` intent marker written only
    * after the folded bytes are fully staged: the marker names the
    * folded source generations, every step after it is idempotent, the
    * next pass completes a crashed fold before doing its own work, and
    * no already-committed row is ever lost (the recovery window shows
    * readers DUPLICATED rows, never missing ones — resolved by the
    * folded-generation delete the recovery replays; surviving
    * generations are never touched). A pre-r19 marker (no fold-src
    * line) recovers with the old all-generations semantics.
    *
    * A streaming ingest dropping small files per trigger pays O(new
    * bytes) per maintenance pass, O(FoldFraction × table) at a fold.
    * Returns (src files rewritten this pass, src files already
    * represented). */
  def optimizeIncremental(spark: SparkSession, src: String, dst: String,
      targetBytes: Long, cols: Seq[String],
      maxGenerations: Int = 8): (Int, Int) = {
    require(cols.size >= 2, "optimizeIncremental clusters by 2+ columns")
    require(maxGenerations >= 1, "maxGenerations must be >= 1")
    java.nio.file.Files.createDirectories(Paths.get(dst))
    if (java.nio.file.Files.exists(Paths.get(dst, FoldMarker)))
      foldRecover(dst) // finish a crashed fold before this pass's work
    else
      // a fold that crashed BEFORE its marker left only staged debris
      org.apache.commons.io.FileUtils.deleteQuietly(new File(foldTmp(dst)))
    val (nextGen, done) = readManifest(dst)
    val srcRoot = new File(src).getCanonicalFile.toPath
    val current = dataFilesRecursive(srcRoot.toFile).map { f =>
      val p = f.getCanonicalFile.toPath
      (srcRoot.relativize(p).toString, f)
    }
    val doneByPath = done.collect { case e @ ManifestEntry(p, _, _) => p -> e }
      .toMap
    val legacyNames = done.collect {
      case ManifestEntry(p, -1, -1) => p }.toSet
    current.foreach { case (rel, f) =>
      doneByPath.get(rel).filter(e => e.size >= 0).foreach { e =>
        // nanosecond mtime (advisor r17): a same-size in-place byte
        // replacement within one MILLISECOND tick passed the old guard —
        // exactly the stale-rows hazard the check exists to catch. New
        // entries store nanos; a pre-r18 entry (millis magnitude) still
        // matches at its own recorded granularity.
        val nowMt = if (e.mtime < MtimeNsFloor) f.lastModified else mtimeNs(f)
        require(e.size == f.length && e.mtime == nowMt,
          s"write-once violation: $rel was optimized at (size=${e.size}, " +
            s"mtime=${e.mtime}) but now reads (size=${f.length}, " +
            s"mtime=$nowMt) — its old rows already live in an " +
            "earlier generation; rewrite dst via a full optimize()")
      }
    }
    val fresh = current.filterNot { case (rel, f) =>
      doneByPath.contains(rel) || legacyNames(f.getName)
    }
    val liveGens = dataFiles(dst).flatMap(f => genOf(f.getName)).distinct
    if (liveGens.size >= maxGenerations && (fresh.nonEmpty || liveGens.size > 1)) {
      val genBytes = dataFiles(dst)
        .flatMap(f => genOf(f.getName).map(_ -> f.length))
        .groupBy(_._1).map { case (g, fs) => g -> fs.map(_._2).sum }.toSeq
      foldTier(spark, srcRoot, dst, targetBytes, cols, nextGen, done, fresh,
        foldSelection(genBytes, maxGenerations).toSet)
      return (fresh.size, done.size)
    }
    if (fresh.isEmpty) return (0, done.size)
    val n = math.max(1,
      math.ceil(fresh.map(_._2.length).sum.toDouble / targetBytes).toInt)
    val tmp = s"$dst/.gen.tmp"
    zorderWrite(spark, readRelative(spark, srcRoot, fresh), tmp, n, cols)
    // a predecessor that crashed after moving its gen files but before
    // its manifest write left THIS generation partially materialized —
    // and the retry's file count may differ, so stragglers would
    // double-count rows. Clear the generation before re-moving.
    dataFiles(dst).filter(_.getName.startsWith(s"gen$nextGen-part-"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    dataFiles(tmp).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath,
        Paths.get(dst, s"gen$nextGen-part-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new File(tmp))
    // manifest rewrite is temp + atomic move — a crash leaves the OLD
    // manifest, and the next pass re-clusters the same fresh files into
    // a recomputed gen dir (REPLACE_EXISTING above), never losing rows
    writeManifest(dst, nextGen + 1, done ++ fresh.map { case (rel, f) =>
      ManifestEntry(rel, f.length, mtimeNs(f)) })
    (fresh.size, done.size)
  }

  /** One `_OPTIMIZED` line: where the file sat under src, and the
    * (size, mtime) pair that detects a same-named byte replacement.
    * mtime is NANOSECONDS since the epoch (advisor r17 — millisecond
    * granularity let a same-size in-place replacement within one tick
    * pass the guard); a pre-r18 entry holds millis and is compared at
    * millis, told apart by magnitude ([[MtimeNsFloor]]). (-1, -1) marks
    * a pre-r17 name-only entry (matched by name, unverifiable — the
    * identity gap this format closed). */
  private[operators] case class ManifestEntry(path: String, size: Long,
      mtime: Long) {
    def line: String = s"$path\t$size\t$mtime"
  }

  /** Any stored mtime at or above this is nanoseconds: 5·10¹⁶ ns is
    * mid-1971, while 5·10¹⁶ ms is ~1.58 million years after the epoch —
    * no real file timestamp is ambiguous between the two readings. */
  private val MtimeNsFloor = 50_000_000_000_000_000L
  private def mtimeNs(f: File): Long =
    java.nio.file.Files.getLastModifiedTime(f.toPath)
      .to(java.util.concurrent.TimeUnit.NANOSECONDS)

  /** Per-pass fold budget: a tiered fold stages at most this fraction
    * of the live generation bytes (plus whatever the count bound
    * forces — see [[foldSelection]]). 1/2 keeps the LSM invariant (the
    * folded output is comparable to the surviving big tier, so tiers
    * keep roughly doubling) while capping any single shuffle+sort at
    * half the table. */
  private[graft] val FoldFraction = 0.5

  /** Which generations a fold pass rewrites — the size-tiered rule:
    * smallest-first, (a) ALWAYS enough that the post-fold live count
    * (survivors + the one fold output) drops below `maxGenerations`,
    * then (b) keep absorbing the next-smallest while the folded bytes
    * stay within [[FoldFraction]] of the live total. Smallest-first is
    * the LSM discipline that gives each byte O(log) total rewrites: a
    * big generation only refolds once its smaller peers have
    * accumulated comparable volume. Returns the fold's source gen ids
    * (≥ 2 whenever more than one generation is live). */
  private[graft] def foldSelection(genBytes: Seq[(Int, Long)],
      maxGenerations: Int): Seq[Int] = {
    val g = genBytes.size
    if (g <= 1) return genBytes.map(_._1)
    val kMin = math.min(g, math.max(2, g - maxGenerations + 2))
    val total = genBytes.map(_._2).sum
    val sorted = genBytes.sortBy { case (gen, b) => (b, gen) }
    val picked = scala.collection.mutable.ArrayBuffer[Int]()
    var cum = 0L
    var stop = false
    sorted.foreach { case (gen, b) =>
      if (!stop) {
        if (picked.size < kMin || cum + b <= total * FoldFraction) {
          picked += gen; cum += b
        } else stop = true // size-sorted: everything later is bigger
      }
    }
    picked.toSeq
  }

  private val FoldMarker = "_FOLD"
  private def foldTmp(dst: String) = s"$dst/.fold.tmp"
  private val GenFile = "gen(\\d+)-part-.*\\.parquet".r
  private def genOf(name: String): Option[Int] = name match {
    case GenFile(g) => Some(g.toInt)
    case _ => None
  }

  /** Parse `_OPTIMIZED` → (next generation number, entries). The v2
    * header `#gen=K` pins the next generation number across crash
    * retries; a pre-r17 manifest (bare names, no header) implies
    * K = line count — exactly the number the old code would have used. */
  private def readManifest(dst: String): (Int, Seq[ManifestEntry]) = {
    val manifest = Paths.get(dst, "_OPTIMIZED")
    if (!java.nio.file.Files.exists(manifest)) return (0, Nil)
    val lines = Files.readAllLines(manifest).asScala.filter(_.nonEmpty).toSeq
    val gen = lines.collectFirst { case l if l.startsWith("#gen=") =>
      l.stripPrefix("#gen=").toInt }
    val entries = lines.filterNot(_.startsWith("#")).map { l =>
      l.split("\t", -1) match {
        case Array(p, s, m) => ManifestEntry(p, s.toLong, m.toLong)
        case _ => ManifestEntry(l, -1L, -1L) // pre-r17 name-only line
      }
    }
    (gen.getOrElse(entries.size), entries)
  }

  private def manifestText(nextGen: Int, entries: Seq[ManifestEntry]): String =
    (s"#gen=$nextGen" +: entries.map(_.line).sorted).mkString("\n")

  private def writeManifest(dst: String, nextGen: Int,
      entries: Seq[ManifestEntry]): Unit = {
    val mTmp = Paths.get(dst, "_OPTIMIZED.tmp")
    Files.write(mTmp, manifestText(nextGen, entries).getBytes)
    java.nio.file.Files.move(mTmp, Paths.get(dst, "_OPTIMIZED"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Read `files` back preserving partition-dir values: basePath makes
    * Spark infer `k=v` path segments under srcRoot as ordinary columns,
    * so a Hive-partitioned ingest dir folds into flat generations
    * row-complete. */
  private def readRelative(spark: SparkSession,
      srcRoot: java.nio.file.Path,
      files: Seq[(String, File)]): org.apache.spark.sql.DataFrame =
    spark.read.option("basePath", srcRoot.toString)
      .parquet(files.map(_._2.getAbsolutePath): _*)

  /** Crash-point probe for fold tests (the AnnIndex.crashProbe
    * discipline): labels fire between the fold protocol's steps. */
  private[graft] var crashProbe: String => Unit = _ => ()

  /** The tiered generation fold: stage the SELECTED generations + the
    * fresh rows through one z-order into `.fold.tmp`, then commit via
    * the `_FOLD` intent marker. The marker is written only after the
    * staged bytes are complete and carries the fold generation number,
    * the folded SOURCE generation ids, AND the post-fold manifest
    * text, so [[foldRecover]] — the only code that touches committed
    * files — can replay from any crash point without ever touching a
    * surviving generation. */
  private def foldTier(spark: SparkSession, srcRoot: java.nio.file.Path,
      dst: String, targetBytes: Long, cols: Seq[String], foldGen: Int,
      done: Seq[ManifestEntry], fresh: Seq[(String, File)],
      srcGens: Set[Int]): Unit = {
    val genFiles = dataFiles(dst)
      .filter(f => genOf(f.getName).exists(srcGens.contains))
    val prior = spark.read.parquet(genFiles.map(_.getAbsolutePath): _*)
    val df =
      if (fresh.isEmpty) prior
      else prior.unionByName(readRelative(spark, srcRoot, fresh),
        allowMissingColumns = true)
    val bytes = genFiles.map(_.length).sum + fresh.map(_._2.length).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    zorderWrite(spark, df, foldTmp(dst), n, cols)
    crashProbe("fold_staged") // tmp complete, no marker: debris, no fold
    val entries = done ++ fresh.map { case (rel, f) =>
      ManifestEntry(rel, f.length, mtimeNs(f)) }
    val marker = (s"#fold-gen=$foldGen" + "\n" +
      s"#fold-src=${srcGens.toSeq.sorted.mkString(",")}" + "\n" +
      manifestText(foldGen + 1, entries)).getBytes
    val mTmp = Paths.get(dst, s"$FoldMarker.tmp")
    Files.write(mTmp, marker)
    java.nio.file.Files.move(mTmp, Paths.get(dst, FoldMarker),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    crashProbe("fold_committed") // marker down: recovery MUST complete it
    foldRecover(dst)
  }

  /** Complete a committed fold from its `_FOLD` marker — every step
    * idempotent, rerunnable from any crash point: (re)copy the staged
    * files in as the fold generation, delete exactly the FOLDED source
    * generations (a pre-r19 marker has no fold-src line and deletes
    * every non-fold generation — the old full-fold semantics),
    * install the post-fold manifest, drop the marker, drop the staging
    * dir. Until the folded-generation delete lands, a reader sees
    * DUPLICATED rows (never missing ones); after it, exactly the
    * folded table. Surviving generations are never written, moved, or
    * deleted. */
  private def foldRecover(dst: String): Unit = {
    val lines = Files.readAllLines(Paths.get(dst, FoldMarker)).asScala
    val g = lines.head.stripPrefix("#fold-gen=").toInt
    val srcGens: Option[Set[Int]] = lines.lift(1)
      .filter(_.startsWith("#fold-src="))
      .map(_.stripPrefix("#fold-src=").split(",").filter(_.nonEmpty)
        .map(_.toInt).toSet)
    val manifest = lines.tail
      .dropWhile(_.startsWith("#fold-src=")).mkString("\n")
    val folds: Int => Boolean =
      gen => srcGens.fold(gen != g)(s => s.contains(gen))
    dataFiles(dst).filter(f => genOf(f.getName).contains(g))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    dataFiles(foldTmp(dst)).sortBy(_.getName).zipWithIndex.foreach {
      case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          Paths.get(dst, s"gen$g-part-$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
    }
    crashProbe("fold_copied") // duplicate window: folded gens + fold gen
    dataFiles(dst).filter(f => genOf(f.getName).exists(gen =>
        gen != g && folds(gen)))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    val mTmp = Paths.get(dst, "_OPTIMIZED.tmp")
    Files.write(mTmp, manifest.getBytes)
    java.nio.file.Files.move(mTmp, Paths.get(dst, "_OPTIMIZED"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    crashProbe("fold_manifested")
    java.nio.file.Files.delete(Paths.get(dst, FoldMarker))
    org.apache.commons.io.FileUtils.deleteQuietly(new File(foldTmp(dst)))
    ()
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

  /** Frame-level OPTIMIZE — the [[optimize]] sizing-and-layout rule for
    * callers whose input is not a directory (SnapshotStore.optimizeTable
    * reads a mounted snapshot's parquet blocks straight out of the CAS):
    * file count from `totalBytes`, layout from `cols` (none = pure
    * compaction, one = range clustering, two-plus = z-order). */
  private[graft] def optimizeFrame(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, totalBytes: Long, dst: String,
      targetBytes: Long, cols: Seq[String]): Unit = {
    val n = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (cols.isEmpty)
      df.coalesce(n).write.mode("overwrite").parquet(dst)
    else if (cols.size == 1)
      df.repartitionByRange(n, col(cols.head))
        .sortWithinPartitions(col(cols.head))
        .write.mode("overwrite").parquet(dst)
    else zorderWrite(spark, df, dst, n, cols)
  }

  /** N-dimensional z-order clustering (OPTIMIZE ZORDER BY c1, ..., cN):
    * each key rank-normalizes to ≤ min(16, 63/n)-bit bucket space via
    * approx-quantile range buckets (one pass — skew-robust, see
    * [[zorderWrite]]), the `zorderN` kernel interleaves
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
    * [[optimizeIncremental]]: RANK-normalize each key over THIS frame
    * (approx-quantile range buckets — VERDICT r16 #3: min-max scaling
    * collapses a zipfian key into a handful of buckets and per-file
    * extents stop being tight boxes; quantile buckets hold ~1/B of the
    * ROWS whatever the distribution), interleave via the
    * arity-dispatched `zordern` kernel, range-partition + sort on the
    * z-value, write `numFiles` files. One quantile pass replaces the
    * old min/max agg — same one-touch cost — and the per-row bucket
    * lookup is a codegen'd binary search ([[graft.functions.RangeBucket]]). */
  private def zorderWrite(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, dst: String,
      numFiles: Int, cols: Seq[String]): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order clustering takes 2 to 8 columns, got ${cols.size}")
    val bits = math.min(16, 63 / cols.size)
    // 1024 rank buckets per dimension saturate any realistic file count
    // (pruning granularity needs ~numFiles^(1/n) buckets per dim) while
    // keeping the quantile summary small; never more than the kernel's
    // per-dimension bit budget
    val nBuckets = math.min(1 << bits, 1024)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val dd = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val bounds = dd.stat.approxQuantile(cols.toArray, probs,
      0.5 / nBuckets)
    graft.functions.ZOrder.register(spark)
    graft.functions.RangeBucket.register(spark)
    val z = call_function("zordern", cols.zipWithIndex.map { case (c, i) =>
      val bs = Option(bounds(i)).getOrElse(Array.empty[Double])
        .distinct.sorted
      // a constant or all-null key has no boundaries — it carries no
      // clustering information; give it the constant bucket
      if (bs.isEmpty) lit(0L)
      else {
        val bucket = call_function("range_bucket", col(c).cast("double"),
          array(bs.map(lit(_)): _*))
        // scale bucket ids onto the FULL per-dimension bit budget: a
        // low-cardinality key (10 distinct values → 10 buckets) would
        // otherwise occupy only the interleave's LOW bits while a
        // high-cardinality partner fills all of them, erasing the small
        // key from the file-level z-ranges. bucket·(2^bits−1)/m is
        // monotone and exact in double (≤ 2^26).
        val top = (1L << bits) - 1
        floor(bucket * lit(top.toDouble) / lit(bs.length.toDouble))
          .cast("long")
      }
    }: _*)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dst)
  }
}
