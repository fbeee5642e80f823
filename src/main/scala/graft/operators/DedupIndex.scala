package graft.operators


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persisted cross-run exact-dedup index — the operational form of l1/l29:
  * a 100 TB corpus is deduped ONCE, its content hashes become a standing
  * index, and each day's arrivals are checked against the index without
  * ever rescanning the corpus.
  *
  * Layout at `indexDir`:
  *   hashes/   parquet (sha, keeper_id) — one row per distinct content
  *   bloom.bin serialized Bloom over xxhash64(sha) — always a SUPERSET of
  *             hashes/ (append puts new hashes before writing rows), so a
  *             bloom miss proves a document is new and skips the join
  *             entirely; bloom hits (~dup rate + fpp of the batch) are the
  *             only rows that reach the exact anti-join confirm.
  *
  * At scale: the index is hash-partitioned parquet the confirm join
  * shuffles against; the bloom is a fixed-size broadcast (9.6 bits per
  * indexed doc at 1% fpp). Append merges a batch-built bloom into the
  * standing one (same size/seed → mergeInPlace), keeping the screen
  * superset invariant without rebuilding.
  */
object DedupIndex {

  private val Fpp = 0.01
  /** Fixed capacity so every bloom ever built for an index is mergeable
    * (mergeInPlace requires identical bit size + hash count). Sized for
    * the test corpus tier; a production index would shard by hash prefix
    * with one bloom per shard at this capacity. */
  private val BloomCapacity = 1L << 20

  // coalesce: sha2(NULL) is NULL, and NULL = NULL never matches in the
  // confirm join — a NULL-text doc would pass the anti-join as "new" on
  // EVERY batch (while build() groups all NULLs into one keeper), so the
  // index would re-admit it forever. NULL text dedups as the empty string.
  private def withSha(docs: DataFrame): DataFrame =
    docs.withColumn("sha", sha2(coalesce(col("text"), lit("")), 256))
      .withColumn("h", xxhash64(col("sha")))

  private def bloomOf(df: DataFrame): BloomFilter = {
    // build at the SHARED capacity via the aggregate path (stat.bloomFilter
    // sizes bits from expectedItems, so pass the fixed capacity)
    df.stat.bloomFilter("h", BloomCapacity, Fpp)
  }

  // Bloom I/O rides the Hadoop FileSystem of the indexDir's scheme so a
  // non-local index (hdfs://, pufs://) works end-to-end — java.nio would
  // treat "hdfs://x" as a relative local path and silently write a local
  // directory literally named "hdfs:" (ADVICE r5 class of bug).
  private def fsFor(spark: SparkSession, indexDir: String) = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "bloom.bin")
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def writeBloom(spark: SparkSession, indexDir: String,
      bf: BloomFilter): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val (fs, p) = fsFor(spark, indexDir)
    val out = fs.create(p, true)
    try out.write(bos.toByteArray) finally out.close()
  }

  private def readBloom(spark: SparkSession, indexDir: String): BloomFilter = {
    val (fs, p) = fsFor(spark, indexDir)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Exclusive lock around the bloom read-merge-write when the index is
    * on a lockable local filesystem; elsewhere the single-writer contract
    * applies (see append's scaladoc). */
  private def withBloomLock[A](spark: SparkSession, indexDir: String)(body: => A): A = {
    val (fs, _) = fsFor(spark, indexDir)
    if (fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]) {
      val lockPath = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(indexDir).toUri.getPath, ".bloom.lock")
      java.nio.file.Files.createDirectories(lockPath.getParent)
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val l = ch.lock(); try body finally l.release() }
      finally ch.close()
    } else body
  }

  /** Dedup `docs` internally (min doc_id survives) and persist the index.
    * Returns the number of distinct contents indexed. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Long = {
    // persist: the sha-aggregation feeds the parquet write, the bloom
    // build, and the count — one scan+shuffle instead of three
    val hashes = withSha(docs)
      .groupBy("sha").agg(min(col("doc_id")).as("keeper_id"),
        first(col("h")).as("h"))
      .persist()
    try {
      hashes.select("sha", "keeper_id")
        .write.mode("overwrite").parquet(s"$indexDir/hashes")
      writeBloom(spark, indexDir, bloomOf(hashes))
      hashes.count()
    } finally { hashes.unpersist(); () }
  }

  /** Rows of `docs` whose content is NOT in the index. Bloom misses are
    * new by construction (no false negatives) and never reach the join;
    * only bloom hits are confirmed against hashes/ (left_anti kills the
    * false positives). */
  def newAgainst(spark: SparkSession, indexDir: String,
      docs: DataFrame): DataFrame = {
    import graft.functions.BloomMembership
    val bos = new java.io.ByteArrayOutputStream()
    readBloom(spark, indexDir).writeTo(bos)
    val bloomLit = lit(bos.toByteArray)
    val hashed = withSha(docs)
    val maybeSeen = BloomMembership.mightContain(spark, bloomLit, col("h"))
    val definitelyNew = hashed.filter(!maybeSeen)
    val confirmed = hashed.filter(maybeSeen)
      .join(spark.read.parquet(s"$indexDir/hashes").select("sha"),
        Seq("sha"), "left_anti")
    // drop BOTH internal columns — leaking sha would pollute the
    // documented rows-of-docs output schema (append recomputes it)
    definitelyNew.unionByName(confirmed).drop("h", "sha")
  }

  /** Index a batch of (already internally-deduped) new rows: bloom first
    * (screen stays a superset of hashes/ at every instant), then rows.
    *
    * The bloom update is a read-merge-write; concurrent appenders to ONE
    * index would lose each other's bits and break the superset invariant
    * ("bloom miss proves new" would then admit duplicates silently). A
    * local-FS index takes an exclusive file lock around the merge so two
    * JVMs serialize; on object stores without locks the contract is
    * single-writer-per-index (the streaming builders satisfy it: one
    * query owns one indexDir). */
  def append(spark: SparkSession, indexDir: String, docs: DataFrame): Unit = {
    val hashes = withSha(docs)
      .groupBy("sha").agg(min(col("doc_id")).as("keeper_id"),
        first(col("h")).as("h"))
      .persist()
    withBloomLock(spark, indexDir) {
      val merged = readBloom(spark, indexDir)
      merged.mergeInPlace(bloomOf(hashes))
      writeBloom(spark, indexDir, merged)
    }
    hashes.select("sha", "keeper_id")
      .write.mode("append").parquet(s"$indexDir/hashes")
    hashes.unpersist()
    ()
  }
}
