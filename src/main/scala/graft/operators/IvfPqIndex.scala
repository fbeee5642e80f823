package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF+PQ index — the composition of the coarse inverted-file
  * quantizer (the l20 IVF family) with product-quantization codes (the
  * l53/[[PqIndex]] family): FAISS's IVFADC layout, the standard
  * billion-vector serving design.
  *
  * Why the composition exists: [[PqIndex]]'s ADC pass scans the WHOLE
  * codes table per probe batch — 32× fewer bytes than the vectors, but
  * still linear in the corpus (the round-9 K=100 probe measured exactly
  * that: idx_pq_probe 6.2× at a 100× corpus, the steepest serve lane).
  * Restricting the scan to each probe's nprobe nearest cells makes the
  * ADC cost O(corpus × nprobe/cells) instead: with k = √n cells and
  * nprobe = k/3, a 100× corpus costs a fixed probe batch ~√100/… — the
  * scan term drops by the cell selectivity at any scale.
  *
  * Layout at `dir` (all write-once, the AnnIndex/PqIndex build/serve
  * split):
  *
  *   centroids/  (cell, cvec) — k = max(4, √n) coarse centers,
  *               broadcast-sized by construction
  *   codebooks/  (sub, code, cvec) — the PQ model (m·k rows)
  *   cells/      (vec_id, cell) — the inverted file; TOP-2
  *               multi-assignment (each vector listed under its two
  *               nearest cells — the l20 trick that roughly squares the
  *               boundary-miss probability, measured 0.60 → 0.88
  *               recall@5 on the clusterless benchmark corpus)
  *   codes/      (vec_id, sub, code) — PQ codes stored ONCE, not per
  *               cell: candidate (probe, vec) pairs resolve against the
  *               narrow cells/ table first (a two-long distinct), and
  *               only the surviving pairs expand to their m code rows —
  *               multi-assignment never inflates the code join or the
  *               dedup shuffle
  *   vectors/    raw vectors, touched only by the bounded exact re-rank
  *
  * Codes quantize the RAW vectors (shared encode with PqIndex, so codes
  * can't drift between the families); classic IVFADC encodes residuals
  * v − centroid for a tighter quantization — that refinement changes
  * only the encode/distance-table inputs and is the documented
  * production knob, not a structural change.
  *
  * HONEST SCALE NOTE (measured, SCALE.md): the scan saving is exactly
  * the cell selectivity nprobe/cells × assignment factor. The default
  * nprobe = cells/3 is tuned for RECALL on the clusterless benchmark
  * corpus (no structure for a coarse quantizer to exploit — IVF's
  * adversarial case), where it buys only a constant ~2/3 fraction. A
  * real embedding corpus clusters, and production serves at a small
  * FIXED nprobe (tens of cells out of √n) — pass `nprobe` explicitly
  * there; the scan term then falls with corpus growth instead of
  * tracking it.
  */
object IvfPqIndex {

  import LlmOps.PqRerank

  /** nprobe for a k-cell index: k/3 with top-2 assignment reaches the
    * l20-measured 0.88 recall@5 on the adversarial (clusterless)
    * benchmark corpus; real embedding corpora use far smaller
    * fractions. */
  def defaultNprobe(cells: Int): Int = math.max(3, cells / 3)

  /** Corpus size the quantizers were FITTED on, recorded at build time
    * (`_FITTED_N`) — what a refit-at-N× policy (AnnIndex.append) compares
    * the grown corpus against. Absent on pre-r15 dirs → no auto-refit. */
  def fittedN(spark: SparkSession, dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_FITTED_N")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in)).trim.toLong)
      finally in.close()
    }
  }

  private def writeFittedN(spark: SparkSession, dir: String, n: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_FITTED_N")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes)
    finally out.close()
  }

  def build(spark: SparkSession, sfDir: String, dir: String): Unit =
    buildFrom(spark, graft.Tables.t(spark, sfDir, "embeddings"), dir)

  def buildFrom(spark: SparkSession, vecsIn: DataFrame, dir: String): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.VectorExpressions.register(spark)
    // persisted: the fit, the assignment, and the PQ encode all read it
    val vecs = vecsIn.select(col("vec_id"), col("embedding")).persist()
    try {
      val n = vecs.count()
      val k = math.max(4, math.sqrt(n.toDouble).toInt)
      val model = LlmOps.fitKMeansOnSample(
        new KMeans().setK(k).setSeed(7).setMaxIter(8),
        vecs.select(col("vec_id"),
          array_to_vector(col("embedding")).as("features")),
        "vec_id", n)
      val centers = {
        import spark.implicits._
        model.clusterCenters.zipWithIndex.toSeq
          .map { case (v, i) => (i.toLong, v.toArray.map(_.toFloat)) }
          .toDF("cell", "cvec")
      }
      // top-2 multi-assignment — bounded-heap agg, no window
      val top2 = udaf(new graft.functions.TopK(2),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      val cells = vecs.crossJoin(broadcast(centers))
        .withColumn("csim", expr("cosine_f32(embedding, cvec)"))
        .groupBy("vec_id")
        .agg(top2(col("csim"), col("cell")).as("nb"))
        .select(col("vec_id"), explode(col("nb.id")).as("cell"))
      val (cb, codes) = PqIndex.buildFrames(spark, vecs)
      centers.write.mode("overwrite").parquet(s"$dir/centroids")
      cb.write.mode("overwrite").parquet(s"$dir/codebooks")
      cells.write.mode("overwrite").parquet(s"$dir/cells")
      // wide, like PqIndex (round 13): the ADC scores one row per
      // candidate pair, no per-subspace fan-out or (probe, vec) re-agg
      PqIndex.widen(codes).write.mode("overwrite").parquet(s"$dir/codes")
      vecs.write.mode("overwrite").parquet(s"$dir/vectors")
      writeFittedN(spark, dir, n)
      codes.unpersist()
      ()
    } finally { vecs.unpersist(); () }
  }

  /** Incremental maintenance under the FROZEN build-time models: new
    * vectors assign to their top-2 cells under the stored centroids and
    * encode under the stored codebooks (PqIndex.encode — one shared
    * definition, so appended codes can never drift from built ones),
    * then append per-row to cells/, codes/ and vectors/. Same contract
    * as PqIndex.append: not atomic across the three tables and not
    * idempotent — a crash leaves the batch partially visible but
    * harmless (cells without codes produce candidates whose ADC rows
    * drop at the codes join; codes without cells are never candidates),
    * and replay-safe ingestion belongs behind a committed-batch marker
    * (the StreamJobs discipline). Quantizer drift (a corpus that
    * outgrows the build-time centroids/codebooks) is a REBUILD, the
    * FAISS contract. */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Unit = {
    graft.functions.VectorExpressions.register(spark)
    val centers = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebooks")
    val subDim = cb.select(size(col("cvec"))).first().getInt(0)
    val vecs = newVecs.select(col("vec_id"), col("embedding")).persist()
    try {
      val top2 = udaf(new graft.functions.TopK(2),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      vecs.crossJoin(broadcast(centers))
        .withColumn("csim", expr("cosine_f32(embedding, cvec)"))
        .groupBy("vec_id")
        .agg(top2(col("csim"), col("cell")).as("nb"))
        .select(col("vec_id"), explode(col("nb.id")).as("cell"))
        .write.mode("append").parquet(s"$dir/cells")
      // match the stored codes layout (wide r13+ / long pre-r13) — see
      // PqIndex.encodeMatchingLayout for why mixing schemas is fatal
      PqIndex.encodeMatchingLayout(spark, s"$dir/codes", cb, subDim, vecs)
        .write.mode("append").parquet(s"$dir/codes")
      vecs.write.mode("append").parquet(s"$dir/vectors")
    } finally { vecs.unpersist(); () }
  }

  /** Top-k neighbors for a probe set (probe_id, pv), served from the
    * store: per-probe nearest cells from the broadcast centroid table,
    * candidate (probe, vec) pairs from the narrow cells/ join (distinct
    * at PAIR granularity — a probe reaching BOTH cells of a
    * multi-assigned vector would otherwise sum its distance table
    * twice), cell-restricted ADC over codes/, bounded exact re-rank. */
  def queryProbes(spark: SparkSession, dir: String, probeVecs: DataFrame,
      k: Int, nprobe: Int = 0, excludeSelf: Boolean = true,
      sq8Codes: Option[DataFrame] = None): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    // the two MODEL tables are collected once per dir and held resident
    // (ServeModelCache, file-signature guarded): the pre-r19 serve paid
    // a centroid-count job, a subDim job, and a distance-table
    // crossJoin-collect job per probe batch — driver-blocking scheduling
    // latency, not compute, at any batch size
    val centersArr = ServeModelCache.cached(spark, s"$dir/centroids") {
      spark.read.parquet(s"$dir/centroids").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    }
    val cbArr = ServeModelCache.cached(spark, s"$dir/codebooks") {
      PqIndex.collectCodebooks(spark.read.parquet(s"$dir/codebooks"))
    }
    val subDim = cbArr.head._3.length
    val cells = spark.read.schema("vec_id BIGINT, cell BIGINT")
      .parquet(s"$dir/cells")
    val codes = spark.read.parquet(s"$dir/codes")
    val vecs = spark.read.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .parquet(s"$dir/vectors")
    val np = if (nprobe > 0) nprobe else defaultNprobe(centersArr.length)
    val (probeArr, probeLocal) = PqIndex.collectProbes(spark, probeVecs)
    // probe cells ON THE DRIVER — |probes| × k cosines against the
    // resident centroids, replicating the former crossJoin + row_number
    // plan exactly: cosine via the bit-identical driver twin, ordering
    // (csim DESC with NaN largest-first — Spark's double ordering —
    // then cell ASC), top-np per probe
    val cellOrd = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    val pcRows: Seq[org.apache.spark.sql.Row] = probeArr.toSeq.flatMap {
      case (pid, pv) =>
        centersArr
          .map { case (cell, cv) => (cell, PqIndex.cosineF32(pv, cv)) }
          .sorted(cellOrd).take(np)
          .map { case (cell, _) => org.apache.spark.sql.Row(pid, cell) }
    }
    val probeCells = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.Arrays.asList(pcRows: _*),
        StructType(Seq(StructField("probe_id", LongType),
          StructField("cell", LongType))))
    }
    // per-probe distance tables + ADC scoring + re-rank are the SHARED
    // PqIndex kernel pieces (round 14, VERDICT r13 #3: the interim
    // per-row Scala UDF boxed a Seq[Int] and probed a Map per candidate
    // row — one ADC implementation now serves both families)
    val bcTabs = PqIndex.distTablesLocal(spark, cbArr, probeArr, subDim)
    // accept both code layouts: wide (r13 builds) and pre-r13 long dirs
    val codesWide =
      if (codes.schema.fieldNames.contains("sub")) PqIndex.widen(codes)
      else codes
    // the IVF restriction: candidate pairs from the narrow inverted
    // file (two-long rows), deduped, then ONE wide code row per pair —
    // the kernel scores each pair's probe only (m table lookups), so
    // nothing ever re-aggregates at (probe, vec) granularity and the
    // only shuffled relations are the candidate pairs and the kernel's
    // ≤C-per-probe heap survivors (the pre-r13 per-subspace expansion +
    // groupBy(probe, vec) carried m× the pairs)
    val cands = cells.join(broadcast(probeCells), Seq("cell"))
      .filter(if (excludeSelf) col("probe_id") =!= col("vec_id") else lit(true))
      .select("probe_id", "vec_id").distinct()
    val scored = PqIndex.adcKernel(cands.join(codesWide, "vec_id"),
      bcTabs, PqRerank, excludeSelf = false) // self-pairs already filtered
    // sq8Codes: the exact re-rank reads 1-byte codes (cosine_i8)
    // instead of vectors/ — the AnnIndex router passes its gated SQ8
    // sidecar through here so BOTH serving arms honor serveSq8
    PqIndex.rerankTopK(scored, vecs, probeLocal, k, PqRerank, sq8Codes)
  }
}
