package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted cross-run SIMHASH near-dup index — the standing form of the
  * l54w crawl-width screen, and the third member of the near-dup index
  * family: NearDupIndex answers set-similarity approximately (MinHash
  * buckets, verify left to policy), JaccardIndex answers it exactly
  * (prefix-filtered postings), and this one answers weighted-feature
  * Hamming similarity from the cheapest standing key a crawl can hold —
  * EIGHT BYTES per document (the 64-bit SimHash; Manku et al. 2007, the
  * production web-crawl design). A 10^10-doc corpus keeps an 80 GB
  * signature table where Jaccard's shingle postings would be tens of TB.
  *
  * Layout at `indexDir`:
  *   sigs/   parquet (doc_id, simhash LONG) — one row per doc, the
  *           authoritative 8-byte-floor table, bit-identical to the l54w
  *           lane's fixture (shared LlmOps.simhash64Of), so screening
  *           composes exactly with inline discovery:
  *             pairs(old ∪ batch) = pairs(old) ∪ pairsWithin(batch)
  *                                  ∪ neighborsAgainst(index, batch)
  *           (SimHashIndexSpec pins that identity on two generations).
  *   bands/  derived PROBE-LOCALITY projection (since round 11): the four
  *           16-bit band tables materialized as one parquet dataset
  *           hive-partitioned by (band 0..3, pb = bv >> 8), rows
  *           (bv, doc_id, simhash). This is Manku et al. §3's "multiple
  *           sorted copies of the signature table" realized in Spark's
  *           storage model: 4× the stored bytes bought back as per-batch
  *           scan pruning. Absent on pre-round-11 indexes → the legacy
  *           full-scan path below still answers exactly.
  *
  * Why the projection exists (VERDICT r10 #3): the in-plan derivation
  * made every screen scan + SHUFFLE 4×|corpus| exploded band rows — the
  * one serve lane whose cost was corpus-linear by construction. The
  * banded path removes both terms:
  *   - no shuffle: the arriving batch's band rows are broadcast, so the
  *     standing side flows scan→BHJ→partial-agg inside one codegen stage;
  *   - pruned scan: the driver collects the batch's distinct (band, pb)
  *     prefix values — bounded at 4·256 = 1024 values, independent of
  *     batch size — and pushes them as a static partition filter, so the
  *     scan reads only the directories the batch can possibly collide
  *     with (a B-doc batch touches ≤ min(4B, 1024) of 1024 dirs; small
  *     batches prune hardest, exactly the steady-state serve shape).
  *
  * Crash/append discipline: bands/ is written FIRST, sigs/ LAST, and
  * bands/ may only ever LEAD sigs/. Orphan band rows (append crashed
  * between the two writes) carry their own signatures, so the only
  * effect is screening a batch against a doc whose admission hadn't
  * finished committing — over-screening, the conservative direction for
  * dedup; the streaming replay (marker-last, StreamJobs) then re-appends
  * both tables, and the screen dedups pair candidates before the verify
  * so duplicate rows in either table change nothing. An append to a
  * LEGACY index (no bands/) deliberately does NOT create the projection:
  * a bands/ table covering only new generations would silently miss the
  * old corpus — migrate() (or a rebuild) creates it atomically from
  * sigs/, which also doubles as compaction for the one-file-per-touched-
  * partition growth that high-frequency small appends accumulate. */
object SimHashIndex {

  /** Band-value prefix width: pb = bv >> 8 → 256 partition dirs per band,
    * 1024 total. Coarse enough that a build writes ~one file per dir,
    * fine enough that a small serve batch prunes most of the corpus. */
  private val PbShift = 8

  private def fs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** (doc_id, simhash) → (band, pb, bv, doc_id, simhash), 4 rows/doc. */
  private[operators] def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      // mask, don't bare-shift: band 3 carries the sign bit and an
      // arithmetic shiftright alone would sign-extend it negative
      .withColumn("bv", expr("shiftright(simhash, band * 16) & 65535").cast("int"))
      .withColumn("pb", expr(s"shiftright(bv, $PbShift)").cast("int"))

  private def writeBands(sigs: DataFrame, indexDir: String,
      mode: String): Unit =
    bandRows(sigs)
      // co-locate each (band, pb) group in one task so every touched
      // partition dir receives one file, not one per upstream task
      .repartition(col("band"), col("pb"))
      .write.mode(mode).partitionBy("band", "pb")
      .parquet(s"$indexDir/bands")

  /** Signature the corpus and persist the index (bands first, sigs last —
    * sigs/ is the publish). Returns indexed-doc count. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Long = {
    val sigs = LlmOps.simhash64Of(
      docs.select(col("doc_id"), col("text"))).persist()
    try {
      writeBands(sigs, indexDir, "overwrite")
      sigs.write.mode("overwrite").parquet(s"$indexDir/sigs")
      sigs.count()
    } finally { sigs.unpersist(); () }
  }

  /** Derive (or compact) the bands/ projection from the authoritative
    * sigs/ table — upgrades a pre-round-11 index in place, and rewrites
    * an append-fragmented projection back to ~one file per partition. */
  def migrate(spark: SparkSession, indexDir: String): Unit = {
    AppendLock.withLock(spark, indexDir) {
      writeBands(spark.read.parquet(s"$indexDir/sigs"), indexDir, "overwrite")
    }
    ()
  }

  /** The batch's possible collision directories as a static partition
    * predicate: per band, the distinct pb prefixes its signatures hash
    * to. The driver-side collect is bounded by the KEY SPACE (4·256
    * values), never by batch or corpus size. */
  private[operators] def partitionPredicate(batchBands: DataFrame): Column = {
    val pbs: Map[Int, Seq[Int]] = batchBands.select("band", "pb").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSeq }
    pbs.map { case (b, vs) =>
      col("band") === b && col("pb").isin(vs: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** VERIFIED near-dup pairs (hamming ≤ 3) between `docs` (new batch) and
    * the standing index: (new_id, index_id, hamming). Batch-internal
    * pairs are NOT included — compose with `pairsWithin` when the batch
    * itself needs deduping before append. An unbuilt index screens
    * nothing (streaming bootstrap; existence probed through the Hadoop
    * FS so hdfs://pufs:// index dirs resolve correctly). */
  def neighborsAgainst(spark: SparkSession, indexDir: String,
      docs: DataFrame): DataFrame = {
    // eager localCheckpoint: the batch signatures feed the driver-side
    // prefix collect AND the join probe — one computation, and blocks
    // release via the ContextCleaner when the plan is GC'd
    val batchSigs = LlmOps.simhash64Of(
      docs.select(col("doc_id"), col("text"))).localCheckpoint(true)
    val batch = bandRows(batchSigs)
      .select(col("doc_id").as("new_id"), col("simhash").as("hn"),
        col("band"), col("bv"), col("pb"))
    val (hfs, sigsPath) = fs(spark, s"$indexDir/sigs")
    if (!hfs.exists(sigsPath))
      return batch.select(col("new_id"), col("new_id").as("index_id"),
        lit(0L).as("hamming")).limit(0)
    val (_, bandsPath) = fs(spark, s"$indexDir/bands")
    val stored =
      if (hfs.exists(bandsPath))
        spark.read.parquet(s"$indexDir/bands")
          .filter(partitionPredicate(batch))
          .select(col("band").as("band2"), col("bv").as("bv2"),
            col("doc_id").as("index_id"), col("simhash").as("hi"))
      else // legacy index: derive bands in-plan over the full sigs scan
        bandRows(spark.read.parquet(s"$indexDir/sigs"))
          .select(col("band").as("band2"), col("bv").as("bv2"),
            col("doc_id").as("index_id"), col("simhash").as("hi"))
    // broadcast the BATCH side: the standing table must never shuffle —
    // it streams scan→BHJ→partial-agg in one codegen stage, so serve
    // cost tracks the (pruned) scan, not a corpus-wide exchange
    broadcast(batch.select("new_id", "hn", "band", "bv"))
      .join(stored,
        col("band") === col("band2") && col("bv") === col("bv2") &&
          col("new_id") =!= col("index_id"))
      .select("new_id", "index_id", "hn", "hi").distinct()
      .withColumn("hamming", expr("bit_count(hn ^ hi)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("new_id", "index_id", "hamming")
  }

  /** Verified pairs WITHIN a frame (a < b) — the l54w screen over fresh
    * signatures (shared simhash64BandScreen, so in-index and in-batch
    * semantics cannot drift). */
  def pairsWithin(docs: DataFrame): DataFrame =
    LlmOps.simhash64BandScreen(
      LlmOps.simhash64Of(docs.select(col("doc_id"), col("text")))
        .localCheckpoint(true))

  /** Add a batch's signatures (the caller applies its dedup policy
    * first, as with NearDupIndex.append). Serialized under the shared
    * AppendLock — concurrent appenders to one directory clobber each
    * other's _temporary commit staging. Bands (if the projection exists)
    * append FIRST, sigs last — see the crash-discipline scaladoc. */
  def append(spark: SparkSession, indexDir: String, docs: DataFrame): Unit = {
    AppendLock.withLock(spark, indexDir) {
      val sigs = LlmOps.simhash64Of(docs.select(col("doc_id"), col("text")))
        .localCheckpoint(true)
      val (hfs, bandsPath) = fs(spark, s"$indexDir/bands")
      val (_, sigsPath) = fs(spark, s"$indexDir/sigs")
      // dual-write when the projection exists, OR when NOTHING exists —
      // a streaming bootstrap's first append founds the index and must
      // found it banded (coverage starts at zero, so no gap is possible);
      // only a pre-existing sigs-only index stays legacy until migrate()
      if (hfs.exists(bandsPath) || !hfs.exists(sigsPath))
        writeBands(sigs, indexDir, "append")
      sigs.write.mode("append").parquet(s"$indexDir/sigs")
    }
    ()
  }
}
