package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 5-way broadcast star join + aggregation — exercises scan, broadcast
    * join, partial aggregation, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    JoinOps.queries("j5_star_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanOps.queries ++ JoinOps.queries ++ AggOps.queries ++
      WindowOps.queries ++ LlmOps.queries ++ UdfOps.queries ++
      StreamOps.queries ++ MetaOps.queries ++ MediaOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanOps.oracleSql ++ JoinOps.oracleSql ++ AggOps.oracleSql ++
      WindowOps.oracleSql ++ LlmOps.oracleSql ++ UdfOps.oracleSql ++
      StreamOps.oracleSql ++ MetaOps.oracleSql ++ MediaOps.oracleSql

  /** The DECLARED no-oracle set: every lane whose output DuckDB cannot
    * recompute, each with the reason and the spec that verifies it
    * instead. CoverageSpec pins `oracleSql.keySet ∪ noOracle ==
    * queries.keySet` as a DISJOINT union, so a lane can never silently
    * fall out of both verification paths (the r12 l19 failure mode:
    * a crashed lane simply vanished from the correctness artifact). */
  val noOracle: Map[String, String] = Map(
    "a7_approx_distinct" -> "HLL sketch state; ±10% bounds in QueriesSpec",
    "a8_approx_percentile" -> "t-digest state; bounds vs exact in QueriesSpec",
    "a38_approx_percentiles" -> "t-digest state; bounds in QueriesSpec",
    "a39_approx_mad" -> "t-digest state; bounds in QueriesSpec",
    "t12_approx_interarrival" -> "t-digest state; bounds in QueriesSpec",
    "o12_incremental_hll" -> "HLL merge state; bounds in QueriesSpec",
    "l14_tfidf" -> "JVM murmur3 feature hashing; pinned in QueriesSpec",
    "l5c_meta_cache_stats" -> "runtime cache counters; MetaSourceSpec")

  /** Lanes whose oracle SQL is GENERATED at run time from an
    * engine-emitted fixture (the l54w pattern): the lane dumps its
    * model/signature table as parquet and the oracle replays the rest of
    * the computation from that fixture in DuckDB. Their entries appear in
    * [[oracleSql]] only after the lane has run in this process — Verify
    * runs every lane before dumping the map, so the driver always sees
    * them; a dev-filtered run that skips the lane just omits the entry.
    * VerifyGateSpec treats these as their own leg of the covering union
    * (registry == static-oracle ∪ no-oracle ∪ generated-oracle). */
  val generatedOracle: Map[String, String] = Map(
    "l54w_simhash64" -> "oracle replays the emitted simhash fixture",
    "l64_image_neardup" -> "oracle replays the emitted aHash fixture",
    "l53_ann_pq" ->
      "oracle replays encode+ADC+rerank from the frozen codebook fixture",
    "l20_ann_ivf" ->
      "oracle replays assignment+probe-cells+rerank from the frozen centroids",
    "l66_pca_project" ->
      "oracle replays center+project from the frozen PCA axes+mean fixture",
    "l70_kmeans_cluster" ->
      "oracle replays nearest-centroid assignment from the frozen k-means fixture",
    "l71_cluster_coreset" ->
      "oracle replays assignment + per-cluster nearest-5 from the k-means fixture")
}
