package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index — the build/query split of a production vector
  * store: `build` computes the multi-table sign-LSH signatures ONCE and
  * writes them as a parquet index table next to the vectors; `query`
  * serves kNN from the stored index without touching `sign_lsh` on the
  * corpus again. At 100 TB the index build is the expensive scan (one
  * pass, embarrassingly parallel, no shuffle) and queries are
  * bucket-joins against the stored table — rebuild only on corpus
  * change (or incrementally via append, signatures are per-row).
  *
  * Same index family and parameters as the l13 query lane (24 tables ×
  * 8 bits, Hamming≤1 multiprobe, exact cosine re-rank, bounded-heap
  * top-k), so results match l13 exactly — NearDupSpec pins the parity.
  */
object AnnIndex {

  private val Tables = 24
  private val Bits = 8

  /** One pass over the vectors: (vec_id, band, sig) signature rows plus
    * a co-located copy of the vectors, written under `dir`. */
  def build(spark: SparkSession, sfDir: String, dir: String): Unit =
    writeIndex(spark, graft.Tables.t(spark, sfDir, "embeddings"),
      dir, mode = "overwrite")

  /** Incremental maintenance: signatures are per-row, so new vectors
    * append without touching the existing index (the write-once model —
    * no rebuild, no rewrite). `newVecs`: (vec_id, embedding).
    *
    * NOT atomic across signatures/ and vectors/ and NOT idempotent: a
    * crash between the writes leaves the batch un-servable but harmless
    * (signature rows without vectors drop at the candidate-vector inner
    * join; vectors without signatures are never candidates), while
    * blindly re-running the whole append duplicates rows — duplicate
    * VECTOR rows reach the top-k heap twice and can occupy two result
    * slots. Recovery from a failed append is re-appending only the
    * missing table's rows, or a rebuild; replay-safe ingestion belongs
    * behind a committed-batch marker (the StreamJobs discipline). */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Unit =
    writeIndex(spark, newVecs, dir, mode = "append")

  /** Shared write half: the input is PERSISTED across the two writes —
    * signatures/ and vectors/ must come from the SAME evaluation, or a
    * non-deterministic input (sample/limit, a re-read table that changed
    * between writes) leaves them inconsistent and queryProbes' inner join
    * silently drops or strands vectors. Also one corpus scan, not two. */
  private def writeIndex(spark: SparkSession, vecs: DataFrame, dir: String,
      mode: String): Unit = {
    graft.functions.VectorExpressions.register(spark)
    val e = vecs.select(col("vec_id"), col("embedding")).persist()
    try {
      e.select(col("vec_id"), posexplode(
          expr(s"sign_lsh(embedding, $Tables, $Bits)")).as(Seq("band", "sig")))
        .write.mode(mode).parquet(s"$dir/signatures")
      e.write.mode(mode).parquet(s"$dir/vectors")
    } finally { e.unpersist(); () }
  }

  /** Top-k neighbors for every vector with `vec_id < nProbes`, served
    * from the stored index. */
  def query(spark: SparkSession, dir: String, nProbes: Int, k: Int): DataFrame = {
    val vecs = spark.read.parquet(s"$dir/vectors")
    queryProbes(spark, dir, vecs.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv")), k)
  }

  /** Top-k neighbors for an ARBITRARY probe set `(probe_id, pv)`, served
    * from the stored index: probe signatures are computed for the probe
    * rows only (tiny); candidates come from the bucket-join against the
    * signatures table; exact cosine re-ranks. This is the serving path —
    * batch callers pass a slice of the corpus (`query`), streaming
    * callers pass each arriving micro-batch of probes.
    *
    * `excludeSelf` (default true) drops candidates whose vec_id equals
    * the probe_id — correct when probes ARE corpus vectors. Pass false
    * for EXTERNAL probes whose ids merely share the corpus's id space,
    * or a corpus vector that happens to carry a probe's number silently
    * vanishes from that probe's results. */
  def queryProbes(spark: SparkSession, dir: String, probeVecs: DataFrame,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val sigs = spark.read.parquet(s"$dir/signatures")
    val vecs = spark.read.parquet(s"$dir/vectors")
    val probeSigs = probeVecs.select(col("probe_id"), col("pv"), posexplode(
        expr(s"sign_lsh(pv, $Tables, $Bits)")).as(Seq("pband", "psig")))
    val probeBuckets = probeSigs.withColumn("bsig",
      explode(array(col("psig") +: (0 until Bits).map(b =>
        col("psig").bitwiseXOR(lit(1L << b))): _*)))
    val cands = broadcast(probeBuckets.select("probe_id", "pband", "bsig"))
      .join(sigs,
        col("pband") === col("band") && col("bsig") === col("sig") &&
          (if (excludeSelf) col("probe_id") =!= col("vec_id") else lit(true)))
      .select("probe_id", "vec_id").distinct()
    val topk = udaf(new graft.functions.TopK(k),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    cands
      .join(vecs, "vec_id")
      .join(broadcast(probeVecs), "probe_id")
      .withColumn("cos", expr("cosine_f32(pv, embedding)"))
      .groupBy("probe_id")
      .agg(topk(col("cos"), col("vec_id")).as("nb"))
      .select(col("probe_id"), posexplode(col("nb")).as(Seq("pos", "hit")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("hit.id").as("neighbor_id"), round(col("hit.score"), 4).as("sim"))
      .orderBy("probe_id", "rnk")
  }
}
