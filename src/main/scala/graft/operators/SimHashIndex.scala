package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   sigs/  parquet (doc_id, simhash LONG) — one row per doc,
  *          bit-identical to the l54w lane's fixture (shared
  *          LlmOps.simhash64Of), so screening composes exactly with
  *          inline discovery:
  *            pairs(old ∪ batch) = pairs(old) ∪ pairsWithin(batch)
  *                                 ∪ neighborsAgainst(index, batch)
  *          (SimHashIndexSpec pins that identity on two generations).
  *
  * Bands are NOT materialized: both sides derive their 4×16-bit band
  * values in-plan (two codegen'd shifts per row) — trading 4× stored
  * rows for negligible CPU, so the standing table stays at its 8-byte
  * floor and an append is a plain signature-row append. Unlike MinHash,
  * the exact verify is NOT a policy choice here: bit_count(xor) over
  * the two carried signatures is total and costs one instruction, so
  * pairs come out VERIFIED (hamming ≤ 3), never as raw candidates. */
object SimHashIndex {

  /** Signature the corpus and persist the index. Returns indexed-doc count. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Long = {
    val sigs = LlmOps.simhash64Of(
      docs.select(col("doc_id"), col("text"))).persist()
    try {
      sigs.write.mode("overwrite").parquet(s"$indexDir/sigs")
      sigs.count()
    } finally { sigs.unpersist(); () }
  }

  private def bandsOf(sigs: DataFrame, idCol: String, sigCol: String) =
    sigs.select(col("doc_id").as(idCol), col("simhash").as(sigCol),
        explode(sequence(lit(0), lit(3))).as("band"))
      // mask, don't bare-shift: band 3 carries the sign bit and an
      // arithmetic shiftright alone would sign-extend it negative
      .withColumn("bv", expr(s"shiftright($sigCol, band * 16) & 65535"))

  /** VERIFIED near-dup pairs (hamming ≤ 3) between `docs` (new batch) and
    * the standing index: (new_id, index_id, hamming). Batch-internal
    * pairs are NOT included — compose with `pairsWithin` when the batch
    * itself needs deduping before append. An unbuilt index screens
    * nothing (streaming bootstrap; existence probed through the Hadoop
    * FS so hdfs://pufs:// index dirs resolve correctly). */
  def neighborsAgainst(spark: SparkSession, indexDir: String,
      docs: DataFrame): DataFrame = {
    val batch = bandsOf(LlmOps.simhash64Of(
      docs.select(col("doc_id"), col("text"))), "new_id", "hn")
    val sigsPath = new org.apache.hadoop.fs.Path(s"$indexDir/sigs")
    val fs = sigsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(sigsPath))
      return batch.select(col("new_id"), col("new_id").as("index_id"),
        lit(0L).as("hamming")).limit(0)
    val stored = bandsOf(spark.read.parquet(s"$indexDir/sigs"),
        "index_id", "hi")
      .select(col("band").as("band2"), col("bv").as("bv2"),
        col("index_id"), col("hi"))
    batch.join(stored,
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
    * other's _temporary commit staging. */
  def append(spark: SparkSession, indexDir: String, docs: DataFrame): Unit = {
    AppendLock.withLock(spark, indexDir) {
      LlmOps.simhash64Of(docs.select(col("doc_id"), col("text")))
        .write.mode("append").parquet(s"$indexDir/sigs")
    }
    ()
  }
}
