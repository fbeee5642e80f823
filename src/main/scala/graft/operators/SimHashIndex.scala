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
  *     The screen picks pruned-vs-plain per batch by COST (see
  *     [[preferPruned]] and [[PrunedMinSigsBytes]]): the pruned arm is
  *     taken only when the batch's prefixes are narrow AND the corpus
  *     is big enough that touched dirs hold real row groups; otherwise
  *     the plain 8-byte sigs/ table is read — same broadcast join, no
  *     shuffle either way, so the projection can only ever help.
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
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Long =
    buildFromSigs(spark, LlmOps.simhash64Of(
      docs.select(col("doc_id"), col("text"))), indexDir)

  /** Persist an index from PRE-COMPUTED signatures (doc_id, simhash) —
    * the index is signature-agnostic: any 64-bit Hamming-comparable key
    * rides the same layout, which is how image aHash64 signatures share
    * the standing near-dup machinery with text SimHash64
    * (idx_image_screen; MediaOps.aHashSigsOf produces the sigs). */
  def buildFromSigs(spark: SparkSession, sigs0: DataFrame,
      indexDir: String): Long = {
    val sigs = sigs0.select(col("doc_id"), col("simhash")).persist()
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

  /** The batch's distinct (band, pb) prefixes — its possible collision
    * directories. The driver-side collect is bounded by the KEY SPACE
    * (4·256 values), never by batch or corpus size. */
  private[operators] def collectPrefixes(
      batchBands: DataFrame): Map[Int, Seq[Int]] =
    batchBands.select("band", "pb").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSeq }

  private[operators] def predicateOf(pbs: Map[Int, Seq[Int]]): Column =
    pbs.map { case (b, vs) =>
      col("band") === b && col("pb").isin(vs: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** The batch's possible collision directories as a static partition
    * predicate. */
  private[operators] def partitionPredicate(batchBands: DataFrame): Column =
    predicateOf(collectPrefixes(batchBands))

  /** Cost-based path choice, term 1 — prefix width: a screen whose
    * batch touches `c` of the 1024 (band, pb) dirs reads ~(c/1024)·4n
    * rows of (bv, doc_id, simhash) ≈ 20 B via the pruned bands/ scan,
    * vs n rows of (doc_id, simhash) ≈ 16 B via the sigs/ path with
    * bands derived in-plan (a narrow codegen'd explode — no shuffle
    * either way, the batch side is always broadcast). Bytes break even
    * at c = 1024·16/(4·20) ≈ 205; above it "pruning" pays 4× row width
    * and ~1024 dir reads to skip a minority of one table. Both sides
    * scale linearly in n, so this term is corpus-independent. */
  private[operators] def preferPruned(c: Int): Boolean = c * 5 <= 1024

  /** Cost-based path choice, term 2 — corpus floor: below this sigs/
    * size the pruned scan loses on FIXED costs regardless of c. The
    * banded dataset spreads over ≤1024 dirs whose listing, parquet
    * footers, and task setup are paid per touched dir.
    *
    * MEASURED (round 13, SimHashScaleProbe over uniform-hash adversarial
    * corpora of 10^7..4·10^8 sigs, batch 8/32, min-of-2, SCALE.md
    * "Round-13"): the pruned arm's cost is FLAT at ~2.0-2.4 s (the
    * per-dir constant) across every corpus size, while the plain scan
    * grows linearly at ~5.7 ns/doc from a 0.26 s floor — 0.30 s at 10^7,
    * 0.84 s at 10^8, 3.34 s at 4·10^8. They cross at ≈3.4·10^8 docs
    * ≈ 4 GiB of sigs, and at 4·10^8 the pruned arm RECORDS ITS FIRST
    * WIN: 2.44 s vs 3.34 s (0.73×) at batch 8. The floor is set just
    * under the measured crossover; Manku's crawl regime (10^10 docs =
    * 80 GB of sigs) sits 20× past it, where the linear term dwarfs the
    * flat one. Tunable per deployment (and set to 0 by specs to
    * exercise the pruned arm on test-sized corpora) via
    * `spark.graft.simhash.prunedMinSigsBytes`. */
  private[graft] val PrunedMinSigsBytes: Long = 15L << 28 // 3.75 GiB
  private[graft] val PrunedMinSigsBytesKey =
    "spark.graft.simhash.prunedMinSigsBytes"

  /** VERIFIED near-dup pairs (hamming ≤ 3) between `docs` (new batch) and
    * the standing index: (new_id, index_id, hamming). Batch-internal
    * pairs are NOT included — compose with `pairsWithin` when the batch
    * itself needs deduping before append. An unbuilt index screens
    * nothing (streaming bootstrap; existence probed through the Hadoop
    * FS so hdfs://pufs:// index dirs resolve correctly). */
  def neighborsAgainst(spark: SparkSession, indexDir: String,
      docs: DataFrame): DataFrame =
    // no eager checkpoint here (r20): on the plain arm the batch
    // signatures have exactly ONE consumer (the broadcast probe), so the
    // former caller-side localCheckpoint was a whole extra blocking job
    // per serve; the pruned arm — the only path that reads the batch
    // twice — materializes internally (see neighborsAgainstSigs)
    neighborsAgainstSigs(spark, indexDir,
      LlmOps.simhash64Of(docs.select(col("doc_id"), col("text"))))

  /** Pinned physical layout of sigs/ (part of the index contract since
    * r20): explicit read schemas skip per-serve parquet footer
    * inference on the standing side. The build writes exactly these
    * types; an externally-built dir must match them. */
  private val SigsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("simhash",
      org.apache.spark.sql.types.LongType)))

  /** bands/ data columns; band/pb are hive partition dirs. */
  private val BandsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bv",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("simhash",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("pb",
      org.apache.spark.sql.types.IntegerType)))

  /** Same screen from pre-computed batch signatures (doc_id, simhash) —
    * for callers that already hold signatures (re-screens, the
    * crossover probe's synthetic corpora). `batchSigs` may be lazy: the
    * plain arm consumes it once (the broadcast probe) and the pruned
    * arm — which also feeds the driver prefix collect — materializes it
    * internally via localCheckpoint. */
  private[graft] def neighborsAgainstSigs(spark: SparkSession,
      indexDir: String, batchSigs: DataFrame): DataFrame = {
    def batchOf(sigs: DataFrame) = bandRows(sigs)
      .select(col("doc_id").as("new_id"), col("simhash").as("hn"),
        col("band"), col("bv"), col("pb"))
    val (hfs, sigsPath) = fs(spark, s"$indexDir/sigs")
    if (!hfs.exists(sigsPath))
      return batchOf(batchSigs).select(col("new_id"),
        col("new_id").as("index_id"), lit(0L).as("hamming")).limit(0)
    val (_, bandsPath) = fs(spark, s"$indexDir/bands")
    // in-plan fallback: full sigs scan, bands derived narrow (also the
    // legacy-index path and the big-batch arm of the cost rule)
    def fromSigs =
      bandRows(spark.read.schema(SigsSchema).parquet(s"$indexDir/sigs"))
        .select(col("band").as("band2"), col("bv").as("bv2"),
          col("doc_id").as("index_id"), col("simhash").as("hi"))
    // broadcast the BATCH side: the standing table must never shuffle —
    // it streams scan→BHJ→partial-agg in one codegen stage, so serve
    // cost tracks the (pruned) scan, not a corpus-wide exchange.
    // hamming is computed and filtered BEFORE the pair distinct (r20):
    // it is a pure function of the pair's two signatures, so the filter
    // commutes with the dedup — and the distinct's exchange then
    // carries only true near-dup rows (3 narrow columns) instead of
    // every band collision with both 8-byte signatures attached.
    def screen(batch: DataFrame, stored: DataFrame) =
      broadcast(batch.select("new_id", "hn", "band", "bv"))
        .join(stored,
          col("band") === col("band2") && col("bv") === col("bv2") &&
            col("new_id") =!= col("index_id"))
        .withColumn("hamming", expr("bit_count(hn ^ hi)").cast("long"))
        .filter(col("hamming") <= 3)
        .select("new_id", "index_id", "hamming").distinct()
    val minSigs = spark.conf.getOption(PrunedMinSigsBytesKey)
      .map(_.toLong).getOrElse(PrunedMinSigsBytes)
    // corpus floor first: when sigs/ is small the plain scan wins on
    // fixed costs alone, and skipping collectPrefixes also saves the
    // screen its one extra driver-side job
    if (!hfs.exists(bandsPath) ||
        hfs.getContentSummary(sigsPath).getLength < minSigs)
      screen(batchOf(batchSigs), fromSigs)
    else {
      // the pruned arm reads the batch twice (prefix collect + probe):
      // materialize once; blocks release via the ContextCleaner
      val batch = batchOf(batchSigs.localCheckpoint(true))
      val pbs = collectPrefixes(batch)
      val stored =
        if (!preferPruned(pbs.valuesIterator.map(_.size).sum)) fromSigs
        else spark.read.schema(BandsSchema).parquet(s"$indexDir/bands")
          .filter(predicateOf(pbs))
          .select(col("band").as("band2"), col("bv").as("bv2"),
            col("doc_id").as("index_id"), col("simhash").as("hi"))
      screen(batch, stored)
    }
  }

  /** Verified pairs WITHIN a frame (a < b) — the l54w screen over fresh
    * signatures (shared simhash64BandScreen, so in-index and in-batch
    * semantics cannot drift). No checkpoint (r20): the one-shuffle band
    * screen consumes the signature frame exactly once. */
  def pairsWithin(docs: DataFrame): DataFrame =
    LlmOps.simhash64BandScreen(
      LlmOps.simhash64Of(docs.select(col("doc_id"), col("text"))))

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
