package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Standing 64-bit SimHash index: screened composition ≡ inline
  * discovery across generations, bootstrap, append. */
class SimHashIndexSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def doc(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ")

  private def norm(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Long)] =
    rows.map { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (math.min(a, b), math.max(a, b), r.getLong(2))
    }.toSet

  test("index screen ∪ within-batch ≡ inline screen over the union corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-idx").toString
    val gen0 = Seq(1L -> doc("alpha"), 2L -> doc("bravo"),
      3L -> doc("civic")).toDF("doc_id", "text")
    // exact dup (hamming 0, guaranteed pair), a one-token tweak (may or
    // may not land within radius 3 — the identity must hold either way),
    // and a novel doc
    val batch = Seq(
      10L -> doc("alpha"),
      11L -> doc("alpha").replace("alpha17", "tweaked"),
      12L -> doc("delta")).toDF("doc_id", "text")

    assert(SimHashIndex.build(spark, gen0, dir) == 3L)
    val against = SimHashIndex.neighborsAgainst(spark, dir, batch).collect()
    assert(norm(against).contains((1L, 10L, 0L)),
      s"exact dup must surface at hamming 0: ${norm(against)}")

    val union = gen0.unionByName(batch)
    val inline = norm(SimHashIndex.pairsWithin(union).collect())
    val composed = norm(SimHashIndex.pairsWithin(gen0).collect()) ++
      norm(SimHashIndex.pairsWithin(batch).collect()) ++ norm(against)
    assert(inline == composed,
      s"composition broke: inline-only=${inline -- composed} " +
        s"composed-only=${composed -- inline}")

    // append the batch; a later arrival matches BOTH generations
    SimHashIndex.append(spark, dir, batch)
    val batch2 = Seq(20L -> doc("alpha")).toDF("doc_id", "text")
    val hits = norm(SimHashIndex.neighborsAgainst(spark, dir, batch2).collect())
    assert(hits.contains((1L, 20L, 0L)) && hits.contains((10L, 20L, 0L)),
      s"post-append screen must know both generations: $hits")
  }

  test("4 concurrent same-JVM appenders lose no signature rows") {
    // pure parquet-append indexes stage commits in a shared _temporary
    // tree — without the AppendLock serialization one job's cleanup
    // deletes another's staged files and rows vanish silently
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-hammer").toString
    SimHashIndex.build(spark,
      Seq(1L -> doc("seed")).toDF("doc_id", "text"), dir)
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val batch = (0 until 25).map { i =>
          (1000L + t * 100 + i, doc(s"t$t-d$i-"))
        }.toDF("doc_id", "text")
        SimHashIndex.append(spark, dir, batch)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val stored = spark.read.parquet(s"$dir/sigs")
    assert(stored.count() == 1 + 4 * 25, "lost signature rows")
    assert(stored.select("doc_id").distinct().count() == 1 + 4 * 25)
  }

  test("unbuilt index screens nothing (streaming bootstrap)") {
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-empty").toString + "/never-built"
    val batch = Seq(1L -> doc("alpha")).toDF("doc_id", "text")
    assert(SimHashIndex.neighborsAgainst(spark, dir, batch).count() == 0)
  }

  /** Run `body` with the corpus-size floor disabled, so test-sized
    * corpora exercise the pruned arm the floor reserves for ≥1 GiB
    * sigs/ tables. */
  private def withPrunedFloorOff[T](body: => T): T = {
    spark.conf.set(SimHashIndex.PrunedMinSigsBytesKey, "0")
    try body finally spark.conf.unset(SimHashIndex.PrunedMinSigsBytesKey)
  }

  test("banded screen prunes partitions and answers identically to legacy full-scan")(
      withPrunedFloorOff {
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-banded").toString
    val corpus = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text")
    SimHashIndex.build(spark, corpus, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")),
      "build must materialize the bands/ projection")
    val batch = Seq(
      777001L -> doc("alpha"),
      777002L -> (doc("bravo") + " tail")).toDF("doc_id", "text")
    val banded = SimHashIndex.neighborsAgainst(spark, dir, batch)
    // the scan carries a static partition filter on (band, pb): the plan
    // must show non-trivial PartitionFilters, and the files actually read
    // must be a strict subset of the 1024-dir projection
    val plan = banded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pb"),
      s"banded screen lost its partition filter:\n$plan")
    // the JOIN must broadcast the batch — the standing table streams
    // scan→BHJ with no exchange (the only Exchange in the plan is the
    // candidate-pair distinct(), which runs after partial aggregation
    // and is proportional to collisions, not corpus)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "standing side must stream through a broadcast join, never shuffle")
    // inputFiles lists the FileIndex pre-pruning, so measure the pruned
    // scan directly: the same partition predicate the screen pushes,
    // applied to the projection, touches a strict subset of its files
    val allBandFiles = spark.read.parquet(s"$dir/bands").inputFiles.length
    val pred = SimHashIndex.partitionPredicate(SimHashIndex.bandRows(
      LlmOps.simhash64Of(batch)))
    val readFiles = spark.read.parquet(s"$dir/bands").filter(pred)
      .select(input_file_name()).distinct().count()
    assert(readFiles < allBandFiles,
      s"no pruning: read $readFiles of $allBandFiles band files")
    // identity vs the legacy path: hide bands/ and re-screen
    val bandedPairs = norm(banded.collect())
    val hidden = java.nio.file.Paths.get(dir, "bands-hidden")
    java.nio.file.Files.move(java.nio.file.Paths.get(dir, "bands"), hidden)
    val legacyScreen = SimHashIndex.neighborsAgainst(spark, dir, batch)
    assert(!legacyScreen.queryExecution.executedPlan.toString.contains("pb"),
      "without bands/ the screen must take the in-plan legacy path")
    assert(norm(legacyScreen.collect()) == bandedPairs,
      "banded and legacy screens diverged")
    java.nio.file.Files.move(hidden, java.nio.file.Paths.get(dir, "bands"))
  })

  test("test-sized corpus takes the plain sigs scan (cost-based path choice)") {
    // term 1 (prefix width): a batch touching most of the 1024 dirs
    // must never take the "pruned" scan — it would read 4x row width to
    // skip a minority of one table
    assert(!SimHashIndex.preferPruned(630) && SimHashIndex.preferPruned(200))
    // term 2 (corpus floor): at test scale every (band, pb) dir is
    // sub-row-group small, so fixed per-dir costs dominate — measured
    // 2.5-2.7 s banded vs 0.42-0.44 s plain at BOTH 50 K and 5 M docs
    // (this exact shape regressed the sf0.1 serve lane 3.9x when the
    // projection was always-on); under the default floor the screen
    // must route to sigs/ even for a batch with narrow prefixes
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-wide").toString
    val corpus = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text")
    SimHashIndex.build(spark, corpus, dir)
    val wide = corpus.filter(col("doc_id") < 250)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val screen = SimHashIndex.neighborsAgainst(spark, dir, wide)
    val files = screen.inputFiles.filter(_.contains(dir))
    assert(files.nonEmpty && files.forall(_.contains("/sigs")),
      s"wide batch must scan sigs/, not the banded projection: ${files.take(3).mkString(",")}")
    val plan = screen.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the sigs arm must still broadcast the batch — standing side never shuffles")
  }

  test("legacy index: append stays sigs-only until migrate() builds bands/") {
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-legacy").toString
    val gen0 = Seq(1L -> doc("alpha"), 2L -> doc("bravo"))
      .toDF("doc_id", "text")
    // a pre-round-11 index: sigs/ only
    graft.operators.LlmOps.simhash64Of(gen0)
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val gen1 = Seq(10L -> doc("civic")).toDF("doc_id", "text")
    SimHashIndex.append(spark, dir, gen1)
    // a bands/ projection covering only gen1 would silently miss gen0 —
    // append must NOT create it
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")),
      "append to a legacy index must not create a partial bands/ projection")
    val probe = Seq(90L -> doc("alpha"), 91L -> doc("civic"))
      .toDF("doc_id", "text")
    val legacy = norm(SimHashIndex.neighborsAgainst(spark, dir, probe).collect())
    assert(legacy.contains((1L, 90L, 0L)) && legacy.contains((10L, 91L, 0L)),
      s"legacy screen must know both generations: $legacy")
    // migrate: bands/ appears, answers are unchanged, appends now dual-write
    SimHashIndex.migrate(spark, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")))
    assert(norm(SimHashIndex.neighborsAgainst(spark, dir, probe).collect())
      == legacy, "migrate changed screen results")
    SimHashIndex.append(spark, dir,
      Seq(20L -> doc("delta")).toDF("doc_id", "text"))
    val post = norm(SimHashIndex.neighborsAgainst(spark, dir,
      Seq(92L -> doc("delta")).toDF("doc_id", "text")).collect())
    assert(post.contains((20L, 92L, 0L)),
      s"post-migrate append must reach the banded screen: $post")
  }

  test("image aHash sigs ride the same standing index: screen ≡ brute force, resizes surface") {
    // the index is signature-agnostic — buildFromSigs persists aHash64
    // signatures of REAL decoded pixels into the same sigs/+bands/
    // layout, and the idx_image_screen serve path is byte-for-byte
    // neighborsAgainstSigs (no image-specific screen code to drift)
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-image").toString
    val ids = graft.Tables.t(spark, sfDir, "documents").select("doc_id")
    val nCorpus = ids.count()
    val corpusSigs = MediaOps.aHashSigsOf(ids).localCheckpoint(true)
    assert(SimHashIndex.buildFromSigs(spark, corpusSigs, dir) == nCorpus)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")),
      "image index must materialize the same bands/ projection")
    // arriving batch: REALLY-resized copies of 20 corpus images
    val batchSigs = MediaOps.aHashSigsOf(
      ids.filter(col("doc_id") < 20), resizeMaxDim = 64,
      idShift = 10000000L).localCheckpoint(true)
    val screened = norm(
      SimHashIndex.neighborsAgainstSigs(spark, dir, batchSigs).collect())
    // identity: unscreened brute-force Hamming ≤ 3 across corpus × batch
    val brute = corpusSigs.as("c").join(batchSigs.as("b"),
        expr("bit_count(c.simhash ^ b.simhash) <= 3"))
      .select(col("b.doc_id"), col("c.doc_id"),
        expr("CAST(bit_count(c.simhash ^ b.simhash) AS LONG)"))
      .collect()
    assert(screened == norm(brute),
      s"image screen diverged from brute force: screened=${screened.size} brute=${brute.length}")
    // aHash is resize-stable: a healthy majority of the 20 planted
    // resize pairs must land within the radius (l64's measured ~3-in-4)
    val caught = screened.count { case (a, b, _) => b == a + 10000000L }
    assert(caught * 2 > 20, s"only $caught of 20 planted resize pairs caught")
  }

  test("serve plan joins band keys — no cartesian, reads the stored sigs") {
    val dir = java.nio.file.Files
      .createTempDirectory("simhash-plan").toString
    SimHashIndex.build(spark,
      graft.Tables.t(spark, sfDir, "documents").select("doc_id", "text"), dir)
    val screen = SimHashIndex.neighborsAgainst(spark, dir,
      Seq(999999L -> doc("probe")).toDF("doc_id", "text"))
    val plan = screen.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(screen.inputFiles.exists(_.contains(dir)),
      "screen must scan the persisted signature table")
  }
}
