package graft

import org.apache.spark.sql.functions._

/** Data-layout levers for 100 TB: bucketing (co-located, shuffle-free
  * joins) and partition pruning (skip whole directories at plan time).
  * These are the storage-side halves of SURVEY §2.3's "Partitioning &
  * shuffle" commitments — asserted on physical plans, not prose. */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val line = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice")
    val supp = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey", "s_nationkey")
    line.write.mode("overwrite").option("path", s"$wh/line_bkt")
      .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
      .saveAsTable("line_bkt")
    supp.write.mode("overwrite").option("path", s"$wh/supp_bkt")
      .bucketBy(8, "s_suppkey").sortBy("s_suppkey")
      .saveAsTable("supp_bkt")
    // disable broadcast so the join would OTHERWISE shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("line_bkt")
        .join(spark.table("supp_bkt"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(sum("l_extendedprice").as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // co-located buckets: the ONLY exchange in the whole plan is the
      // post-join groupBy repartition — an unbucketed plan has three
      // (both join inputs + the groupBy)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected 1 exchange (groupBy only), found $exchanges — " +
          s"join sides shuffled despite bucketing:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and the result is right (vs the unbucketed plan)
      val expect = line.join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey").agg(sum("l_extendedprice").as("rev"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet &&
        got.forall { case (k, v) => math.abs(v - expect(k)) < 1e-6 })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction: fragmented table rewrites into target-size files, rows intact") {
    val frag = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft-comp").toString
    // simulate a streaming ingest's small-file debris: 64 files
    Tables.t(spark, sfDir, "lineitem").repartition(64)
      .write.mode("overwrite").parquet(frag)
    def checksum(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
      val r = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val before = checksum(frag)
    val (pre, post) = operators.LayoutOps.compact(
      spark, frag, compacted, targetBytes = 512L * 1024 * 1024)
    assert(pre == 64, s"fragmentation setup produced $pre files")
    assert(post < pre && post <= 2, s"compaction left $post files")
    assert(checksum(compacted) == before,
      "compaction changed row content (count or row-hash sum differs)")
  }

  test("clusterBy: output files cover disjoint ranges of the cluster key") {
    val out = java.nio.file.Files.createTempDirectory("graft-clust").toString
    operators.LayoutOps.clusterBy(spark, s"$sfDir/lineitem.parquet", out,
      numFiles = 8, "l_orderkey")
    val files = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length > 1, "clustering produced a single file — no ranges to check")
    // per-file key ranges must be pairwise disjoint: that is exactly what
    // lets parquet footer min/max stats prune whole files on a range scan
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: hi=$hi lo2=$lo2")
      case _ => ()
    }
    // row preservation
    assert(spark.read.parquet(out).count() ==
      Tables.t(spark, sfDir, "lineitem").count())
  }

  test("z-order clustering bounds BOTH dimensions per file (2-D pruning)") {
    // single-key range clustering prunes on l_orderkey only — every file
    // spans ~the full l_partkey domain. Z-order interleaving bounds each
    // file's extent in both dimensions, so a footer-stats scan can skip
    // files for a predicate on either column.
    val nFiles = 16
    val zout = java.nio.file.Files.createTempDirectory("graft-z").toString
    operators.LayoutOps.clusterByZOrder(spark, s"$sfDir/lineitem.parquet",
      zout, nFiles, "l_orderkey", "l_partkey")
    val files = new java.io.File(zout).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length > 4, s"want many files, got ${files.length}")
    val exts = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey"),
          min("l_partkey"), max("l_partkey")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val okSpan = exts.map(e => e._2 - e._1).sum.toDouble / exts.length
    val pkSpan = exts.map(e => e._4 - e._3).sum.toDouble / exts.length
    val okDomain = exts.map(_._2).max - exts.map(_._1).min
    val pkDomain = exts.map(_._4).max - exts.map(_._3).min
    // each file's extent must be a strict sub-rectangle on average: with
    // 16 z-tiles both dimensions shrink to well under the full domain
    assert(okSpan < 0.5 * okDomain, s"l_orderkey not bounded: $okSpan / $okDomain")
    assert(pkSpan < 0.75 * pkDomain, s"l_partkey not bounded: $pkSpan / $pkDomain")
    // a mid-domain range predicate on the SECOND key skips files entirely
    val pkLo = exts.map(_._3).min + pkDomain / 8
    val pkHi = pkLo + pkDomain / 8
    val hit = exts.count(e => e._4 >= pkLo && e._3 <= pkHi)
    assert(hit < files.length,
      s"no file pruned on l_partkey: $hit of ${files.length} files overlap")
    // row preservation
    assert(spark.read.parquet(zout).count() ==
      Tables.t(spark, sfDir, "lineitem").count())
  }

  test("OPTIMIZE: one rewrite compacts small-file debris AND z-orders the layout") {
    val frag = java.nio.file.Files.createTempDirectory("graft-opt-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-opt-dst").toString
    Tables.t(spark, sfDir, "lineitem").repartition(64)
      .write.mode("overwrite").parquet(frag)
    def checksum(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
      val r = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val before = checksum(frag)
    val fragBytes = new java.io.File(frag).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target ~8 output files from the measured source bytes
    val (pre, post) = operators.LayoutOps.optimize(spark, frag, dst,
      targetBytes = math.max(1L, fragBytes / 8),
      cols = Seq("l_orderkey", "l_partkey"))
    assert(pre == 64, s"fragmentation setup produced $pre files")
    assert(post < 16 && post > 1, s"optimize left $post files")
    assert(checksum(dst) == before,
      "optimize changed row content (count or row-hash sum differs)")
    // the single rewrite also delivered the layout: per-file extents are
    // strict sub-rectangles on BOTH cluster keys (the 2-D z-order claim)
    val files = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val exts = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey"),
          min("l_partkey"), max("l_partkey")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val okSpan = exts.map(e => e._2 - e._1).sum.toDouble / exts.length
    val pkSpan = exts.map(e => e._4 - e._3).sum.toDouble / exts.length
    val okDomain = (exts.map(_._2).max - exts.map(_._1).min).toDouble
    val pkDomain = (exts.map(_._4).max - exts.map(_._3).min).toDouble
    assert(okSpan < 0.75 * okDomain, s"l_orderkey not bounded: $okSpan / $okDomain")
    assert(pkSpan < 0.75 * pkDomain, s"l_partkey not bounded: $pkSpan / $pkDomain")
  }

  test("incremental OPTIMIZE rewrites only files added since the last pass") {
    val src = java.nio.file.Files.createTempDirectory("graft-incr-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-incr-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem")
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // generation 1: first half of the table lands as 8 part files
    li.filter(col("l_orderkey") % 2 === 0).repartition(8)
      .write.mode("append").parquet(src)
    val bytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = math.max(1L, bytes / 4)
    val (rw1, seen1) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, target, Seq("l_orderkey", "l_partkey"))
    assert(rw1 == 8 && seen1 == 0, s"first pass: ($rw1, $seen1)")
    assert(checksum(spark.read.parquet(dst)) ==
      checksum(spark.read.parquet(src)))
    val gen0 = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(gen0.keySet.forall(_.startsWith("gen0-")))

    // generation 2: streaming-style debris — the other half appends
    li.filter(col("l_orderkey") % 2 === 1).repartition(4)
      .write.mode("append").parquet(src)
    val (rw2, seen2) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, target, Seq("l_orderkey", "l_partkey"))
    assert(rw2 == 4 && seen2 == 8,
      s"second pass must touch only the 4 new files: ($rw2, $seen2)")
    // earlier generation bytes are UNTOUCHED (the write-once claim)
    new java.io.File(dst).listFiles()
      .filter(f => f.getName.startsWith("gen0-")).foreach { f =>
        assert(java.nio.file.Files.readAllBytes(f.toPath).toSeq == gen0(f.getName),
          s"incremental pass rewrote prior-generation bytes: ${f.getName}")
      }
    // the union is complete and every file still bounds its keys
    assert(checksum(spark.read.parquet(dst)) == checksum(li))
    val exts = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
        r.getLong(1) - r.getLong(0)
      }
    val domain = li.agg(max("l_orderkey") - min("l_orderkey"))
      .collect()(0).getLong(0).toDouble
    assert(exts.sum / exts.length < 0.75 * domain,
      "per-generation z-order must still bound file extents")

    // third pass: nothing new — a no-op that reports the standing state
    assert(operators.LayoutOps.optimizeIncremental(
      spark, src, dst, target, Seq("l_orderkey", "l_partkey")) == (0, 12))
  }

  test("incremental OPTIMIZE fails loudly when an optimized src file's bytes change") {
    // advisor r16: name-only identity silently skipped a replaced
    // file's new bytes. The manifest now records (relpath, size, mtime)
    // and a write-once violation is an ERROR, not silent staleness —
    // the old rows already live in a committed generation, so neither
    // re-clustering (double-count) nor skipping (stale) is silently
    // correct.
    val src = java.nio.file.Files.createTempDirectory("graft-wo-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-wo-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem").limit(2000)
    li.repartition(2).write.mode("append").parquet(src)
    val (rw1, _) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))
    assert(rw1 == 2)
    // replace one part file IN PLACE under the same name
    val victim = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val alt = java.nio.file.Files.createTempDirectory("graft-wo-alt").toString
    li.limit(7).coalesce(1).write.mode("overwrite").parquet(alt)
    val replacement = new java.io.File(alt).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(replacement.toPath, victim.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val ex = intercept[IllegalArgumentException] {
      operators.LayoutOps.optimizeIncremental(
        spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))
    }
    assert(ex.getMessage.contains("write-once violation"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("write-once guard catches a same-size replacement within one millisecond tick") {
    // advisor r17: identity compared mtime at MILLISECOND granularity,
    // so a same-size in-place byte replacement landing in the same tick
    // passed the guard and silently served stale rows. Entries now
    // record nanoseconds; reproduce the exact failure by pinning the
    // replacement's mtime into the original file's millisecond.
    val src = java.nio.file.Files.createTempDirectory("graft-ns-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-ns-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem").limit(500)
    li.coalesce(1).write.mode("append").parquet(src)
    assert(operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))._1 == 1)
    val victim = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val t0 = java.nio.file.Files.getLastModifiedTime(victim)
    val bytes = java.nio.file.Files.readAllBytes(victim)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x1).toByte
    java.nio.file.Files.write(victim, bytes) // same size, new content
    // same millisecond as the original, different nanosecond remainder
    val ns0 = t0.to(java.util.concurrent.TimeUnit.NANOSECONDS)
    val nsNew = (ns0 / 1000000L) * 1000000L + (ns0 % 1000000L + 1) % 1000000L
    java.nio.file.Files.setLastModifiedTime(victim,
      java.nio.file.attribute.FileTime.from(
        nsNew, java.util.concurrent.TimeUnit.NANOSECONDS))
    val back = java.nio.file.Files.getLastModifiedTime(victim)
    assume(back.to(java.util.concurrent.TimeUnit.NANOSECONDS) == nsNew &&
      back.toMillis == t0.toMillis,
      "filesystem must store nanosecond mtimes for this reproduction")
    val ex = intercept[IllegalArgumentException] {
      operators.LayoutOps.optimizeIncremental(
        spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))
    }
    assert(ex.getMessage.contains("write-once violation"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("pre-r18 millisecond manifest entries still match unchanged files") {
    val src = java.nio.file.Files.createTempDirectory("graft-ms-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-ms-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem").limit(500)
    li.repartition(2).write.mode("append").parquet(src)
    assert(operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))._1 == 2)
    // rewrite the manifest with millisecond mtimes — a pre-r18 layout
    val mf = java.nio.file.Paths.get(dst, "_OPTIMIZED")
    val legacy = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .split("\n").map { l =>
        val a = l.split("\t")
        if (l.startsWith("#") || a.length != 3) l
        else s"${a(0)}\t${a(1)}\t${a(2).toLong / 1000000L}"
      }.mkString("\n")
    java.nio.file.Files.write(mf, legacy.getBytes("UTF-8"))
    // unchanged files must still match (at their recorded granularity)
    assert(operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue,
      Seq("l_orderkey", "l_partkey")) == (0, 2))
  }

  test("incremental OPTIMIZE sees Hive-partitioned sources, keeps partition values") {
    // the verb's own target use case — a partitioned streaming sink —
    // was invisible to the r16 non-recursive listing (advisor r16)
    val src = java.nio.file.Files.createTempDirectory("graft-part-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-part-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem").limit(4000)
      .withColumn("bucket", (col("l_orderkey") % 3).cast("int"))
    li.filter(col("l_orderkey") % 2 === 0)
      .write.partitionBy("bucket").mode("append").parquet(src)
    val (rw1, seen1) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))
    assert(rw1 > 0 && seen1 == 0)
    li.filter(col("l_orderkey") % 2 === 1)
      .write.partitionBy("bucket").mode("append").parquet(src)
    val (rw2, seen2) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, Seq("l_orderkey", "l_partkey"))
    assert(rw2 > 0 && seen2 == rw1,
      s"second pass must touch only the new partition files: ($rw2, $seen2)")
    // row-complete INCLUDING the partition column, now physical
    val got = spark.read.parquet(dst)
    assert(got.columns.contains("bucket"),
      "partition values must land in the generation files")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("l_orderkey"), col("l_linenumber"), col("bucket").cast("int"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(key(got) == key(li), "partitioned src must fold row-complete")
  }

  test("incremental OPTIMIZE folds generations at the bound, crash-safe at every step") {
    val src = java.nio.file.Files.createTempDirectory("graft-fold-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-fold-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem")
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def gens(): Seq[Int] = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .flatMap(f => "gen(\\d+)-".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .distinct.sorted.toSeq
    val cols = Seq("l_orderkey", "l_partkey")
    // three passes at maxGenerations=2: pass 3 must FOLD, not append a
    // third generation — the bound is the whole point (VERDICT r16 #2)
    for (m <- 0 to 1) {
      li.filter(col("l_orderkey") % 3 === m).repartition(3)
        .write.mode("append").parquet(src)
      operators.LayoutOps.optimizeIncremental(
        spark, src, dst, Long.MaxValue, cols, maxGenerations = 2)
    }
    assert(gens() == Seq(0, 1), s"two incremental generations first: ${gens()}")
    li.filter(col("l_orderkey") % 3 === 2).repartition(3)
      .write.mode("append").parquet(src)

    // crash INSIDE the fold at each labeled point; re-run must heal and
    // the final table must be exactly one folded generation, row-exact
    val crashPoints = Seq("fold_staged", "fold_committed", "fold_copied",
      "fold_manifested")
    for (point <- crashPoints) {
      operators.LayoutOps.crashProbe = lbl =>
        if (lbl == point) throw new RuntimeException(s"simulated crash at $lbl")
      val ex = intercept[RuntimeException] {
        operators.LayoutOps.optimizeIncremental(
          spark, src, dst, Long.MaxValue, cols, maxGenerations = 2)
      }
      assert(ex.getMessage.contains(point))
      operators.LayoutOps.crashProbe = _ => ()
      // no committed row lost in ANY crash window: dst either still has
      // the old generations, the fold, or (transiently) both
      assert(checksum(spark.read.parquet(dst))._1 >=
        checksum(li.filter(col("l_orderkey") % 3 < 2))._1,
        s"crash at $point lost committed rows")
    }
    // clean re-run completes the fold (recovery + this pass's work)
    val (rw, _) = operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, cols, maxGenerations = 2)
    assert(gens().size == 1 && gens().head >= 2,
      s"fold must leave ONE new generation: ${gens()}")
    assert(checksum(spark.read.parquet(dst)) == checksum(li),
      "folded table must be row-exact vs the full source")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "_FOLD")), "marker must be gone")
    // and the verb keeps working incrementally AFTER a fold
    val extra = li.filter(col("l_orderkey") % 97 === 0)
    extra.repartition(2).write.mode("append").parquet(src)
    operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, cols, maxGenerations = 2)
    assert(checksum(spark.read.parquet(dst)) ==
      checksum(li.unionByName(extra)),
      "post-fold incremental pass must stay row-exact")
  }

  test("foldSelection: smallest-first, count floor, fraction budget") {
    // VERDICT r17 #3 / r18 #2: the fold must never be the one giant
    // O(table) shuffle — selection folds the smallest generations,
    // always enough to restore the count bound, then more only while
    // the staged bytes stay within FoldFraction of the live table.
    import operators.LayoutOps.foldSelection
    // 8 equal generations at the bound: the fraction budget stops the
    // fold at half the table — never all of it
    val equal = (0 until 8).map(g => g -> 10L)
    assert(foldSelection(equal, 8).toSet == Set(0, 1, 2, 3),
      "equal sizes: fold exactly up to the half-table budget")
    // one huge + 7 tiny: the whole small tier folds, the huge gen is
    // untouched (it re-folds only once its peers reach its scale)
    val skewed = (0 until 7).map(g => g -> 1L) :+ (7 -> 1000L)
    assert(foldSelection(skewed, 8).toSet == (0 until 7).toSet,
      "the big generation must survive a tiered fold")
    // two big + six tiny where even the six tiny exceed the fraction:
    // the count floor still folds at least 2
    val fat = Seq(0 -> 100L, 1 -> 100L, 2 -> 90L, 3 -> 90L, 4 -> 90L,
      5 -> 90L, 6 -> 90L, 7 -> 90L)
    val f = foldSelection(fat, 8)
    assert(f.size >= 2, "count floor: a fold always merges >= 2 gens")
    // a crashed history with MORE than maxGenerations live gens must
    // fold enough to get back under the bound in one pass
    val over = (0 until 11).map(g => g -> 10L)
    assert(11 - foldSelection(over, 8).size + 1 < 8,
      "post-fold live count must drop below maxGenerations")
    // degenerate single-generation table: fold it alone (fresh rows
    // still need a target)
    assert(foldSelection(Seq(5 -> 10L), 8) == Seq(5))
  }

  test("tiered fold rewrites only the small tier; the big generation survives byte-identical") {
    val src = java.nio.file.Files.createTempDirectory("graft-tier-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-tier-dst").toString
    val li = Tables.t(spark, sfDir, "lineitem")
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def gens(): Seq[Int] = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .flatMap(f => "gen(\\d+)-".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .distinct.sorted.toSeq
    val cols = Seq("l_orderkey", "l_partkey")
    // gen0 = 10/12 of the table (the big tier); gen1/gen2 = slivers
    li.filter(col("l_orderkey") % 12 < 10).repartition(3)
      .write.mode("append").parquet(src)
    operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, cols, maxGenerations = 3)
    for (m <- Seq(10, 11)) {
      li.filter(col("l_orderkey") % 12 === m).repartition(1)
        .write.mode("append").parquet(src)
      operators.LayoutOps.optimizeIncremental(
        spark, src, dst, Long.MaxValue, cols, maxGenerations = 3)
    }
    assert(gens() == Seq(0, 1, 2), s"setup: three live gens, got ${gens()}")
    def gen0State(): Set[(String, Long, Long)] =
      new java.io.File(dst).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("gen0-"))
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    val g0 = gen0State()
    val liveBytes = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length).sum
    val smallBytes = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && (f.getName.startsWith("gen1-") ||
        f.getName.startsWith("gen2-"))).map(_.length).sum
    assert(smallBytes * 2 < liveBytes,
      "setup: the small tier must sit inside the fold budget")
    // a fourth sliver triggers the fold — crash it at every labeled
    // point first; recovery must never touch the surviving gen0
    li.filter(col("l_orderkey") % 97 === 3).repartition(1)
      .write.mode("append").parquet(src)
    for (point <- Seq("fold_staged", "fold_committed", "fold_copied",
        "fold_manifested")) {
      operators.LayoutOps.crashProbe = lbl =>
        if (lbl == point) throw new RuntimeException(s"simulated crash at $lbl")
      val ex = intercept[RuntimeException] {
        operators.LayoutOps.optimizeIncremental(
          spark, src, dst, Long.MaxValue, cols, maxGenerations = 3)
      }
      assert(ex.getMessage.contains(point))
      operators.LayoutOps.crashProbe = _ => ()
      assert(gen0State() == g0,
        s"crash at $point must leave the surviving big generation alone")
      assert(checksum(spark.read.parquet(dst))._1 >= checksum(li)._1,
        s"crash at $point lost committed rows")
    }
    // clean run completes the tiered fold
    operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, cols, maxGenerations = 3)
    assert(gens() == Seq(0, 3),
      s"small tier + fresh fold into ONE new gen, gen0 survives: ${gens()}")
    assert(gen0State() == g0,
      "the surviving generation must be byte-identical (name, size, mtime)")
    assert(checksum(spark.read.parquet(dst)) ==
      checksum(li.unionByName(li.filter(col("l_orderkey") % 97 === 3))),
      "tiered-folded table must be row-exact")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "_FOLD")), "marker must be gone")
    // the verb keeps working after a tiered fold
    val extra = li.filter(col("l_orderkey") % 101 === 7)
    extra.repartition(1).write.mode("append").parquet(src)
    operators.LayoutOps.optimizeIncremental(
      spark, src, dst, Long.MaxValue, cols, maxGenerations = 3)
    assert(checksum(spark.read.parquet(dst)) == checksum(
      li.unionByName(li.filter(col("l_orderkey") % 97 === 3))
        .unionByName(extra)),
      "post-fold incremental pass must stay row-exact")
  }

  test("range_bucket: codegen'd binary search matches the count-of-boundaries-<=x law") {
    graft.functions.RangeBucket.register(spark)
    import graft.SparkSpec.spark.implicits._
    val bs = Array(2.0, 5.0, 5.0, 9.0) // duplicate collapses at build
    val got = Seq(1.0, 2.0, 3.0, 5.0, 8.9, 9.0, 100.0, Double.NaN)
      .toDF("x")
      .selectExpr("range_bucket(x, array(2.0D, 5.0D, 5.0D, 9.0D)) AS b")
      .collect().map(_.getLong(0)).toSeq
    val law = Seq(1.0, 2.0, 3.0, 5.0, 8.9, 9.0, 100.0).map(x =>
      bs.distinct.count(_ <= x).toLong)
    assert(got.take(7) == law, s"got $got, law $law")
    assert(got(7) == 3L, "NaN lands in the top bucket (sorts last)")
    // null in, null out
    val n = Seq[Option[Double]](None).toDF("x")
      .selectExpr("range_bucket(x, array(1.0D))").collect()(0)
    assert(n.isNullAt(0))
    // kernel law directly (the codegen and interpreted paths share it)
    val arr = Array(2.0, 5.0, 9.0)
    for (x <- Seq(-1.0, 2.0, 4.9, 5.0, 5.1, 9.0, 9.1))
      assert(graft.functions.RangeBucketKernel.bucket(x, arr) ==
        arr.count(_ <= x).toLong, s"kernel law broke at $x")
  }

  test("z-order rank normalization prunes tail queries under a zipfian key") {
    // VERDICT r16 #3: min-max normalization puts a zipfian key's entire
    // body in bucket 0 (here a < 1024 is 99.9% of rows but < 0.1% of
    // the [1, 2^20] value domain), so the z-key carries NO information
    // about `a` and a selective tail query overlaps EVERY file's
    // footer — measured 64/64 files hit. Rank (quantile) buckets give
    // each bucket ~1/B of the ROWS, the tail gets its own top buckets,
    // and the same query pruned ~half the files (34/64 measured on this
    // exact corpus). Head POINT-queries can't prune at this file
    // granularity under either scheme — a thin fixed-`a` slice's Morton
    // cells scatter across the full z-range (intrinsic to interleaving,
    // not to the normalization).
    val src = java.nio.file.Files.createTempDirectory("graft-zipf-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-zipf-dst").toString
    // a = floor(2^20 / (1 + e)), e ~ uniform: P(a >= t) ~ 1/t — a
    // heavy-headed zipf-like key (a=1 holds ~half the rows). b uniform.
    spark.range(200000)
      .selectExpr(
        "CAST(1048576 / (1 + (abs(hash(id)) % 1048576)) AS BIGINT) AS a",
        "CAST(abs(hash(id, 7L)) % 100000 AS BIGINT) AS b")
      .write.mode("overwrite").parquet(src)
    operators.LayoutOps.clusterByZOrderN(spark, src, dst, 64, Seq("a", "b"))
    val files = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length >= 48, s"want ~64 files, got ${files.length}")
    def extents(c: String): Seq[(Long, Long)] = files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)), max(col(c))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val extA = extents("a")
    def hitsAtLeast(t: Long): Int = extA.count { case (_, hi) => hi >= t }
    // tail range queries — the selective scans a zone-map reader runs
    assert(hitsAtLeast(1024) <= (0.65 * files.length).toInt,
      s"a>=1024 (0.1% of rows) must prune: ${hitsAtLeast(1024)}/${files.length}")
    assert(hitsAtLeast(32) <= (0.65 * files.length).toInt,
      s"a>=32 (3% of rows) must prune: ${hitsAtLeast(32)}/${files.length}")
    // the uniform dimension keeps bounded boxes too (the 2-D contract)
    val extB = extents("b")
    val meanSpanB = extB.map { case (lo, hi) => (hi - lo).toDouble }.sum /
      extB.size
    assert(meanSpanB < 0.8 * 100000.0,
      s"uniform dim must stay bounded under a skewed partner: $meanSpanB")
    // row-lossless, layout-only
    assert(spark.read.parquet(dst).count() == 200000L)
  }

  test("zorder3/zorderN kernels agree with the naive bit interleave and stay monotone") {
    import graft.functions.ZOrderKernels
    // reference semantics: bit i of vals(j) lands at position i*n + j
    def naive(vals: Seq[Long], bits: Int): Long =
      vals.zipWithIndex.map { case (v, j) =>
        (0 until bits).map(i => ((v >>> i) & 1L) << (i * vals.size + j)).sum
      }.sum
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val Seq(a, b, c, d) = Seq.fill(4)(rnd.nextLong(1L << 21))
      assert(ZOrderKernels.interleave3(a, b, c) == naive(Seq(a, b, c), 21),
        s"interleave3($a, $b, $c) diverges from the bit-loop reference")
      assert(ZOrderKernels.interleave(a & 0xFFFF, b & 0xFFFF) ==
        naive(Seq(a & 0xFFFF, b & 0xFFFF), 16))
      val quad = Array(a, b, c, d).map(_ & 0x7FFF) // 63/4 = 15 bits
      assert(ZOrderKernels.interleaveDyn(quad) == naive(quad.toSeq, 15))
    }
    // monotone per dimension when the others are fixed — the property
    // that makes a z-range a box intersection
    (1 to 100).foreach { _ =>
      val Seq(a1, a2, b, c) = Seq.fill(4)(rnd.nextLong(1L << 21))
      val (lo, hi) = (math.min(a1, a2), math.max(a1, a2))
      assert(ZOrderKernels.interleave3(lo, b, c) <=
        ZOrderKernels.interleave3(hi, b, c))
      assert(ZOrderKernels.interleave3(b, lo, c) <=
        ZOrderKernels.interleave3(b, hi, c))
      assert(ZOrderKernels.interleave3(b, c, lo) <=
        ZOrderKernels.interleave3(b, c, hi))
    }
    // SQL surface: single-bit sanity + the variadic dispatch
    graft.functions.ZOrder.register(spark)
    val r = spark.sql(
      """SELECT zorder3(CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)) AS z3a,
        |  zorder3(CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(0 AS BIGINT)) AS z3b,
        |  zorder3(CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT)) AS z3c,
        |  zordern(CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)) AS z4
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 9L, s"zorder3(0b11,0,0) must be 0b001001, got ${r.getLong(0)}")
    assert(r.getLong(1) == 18L)
    assert(r.getLong(2) == 36L)
    assert(r.getLong(3) == 15L, s"zordern(1,1,1,1) must be 0b1111, got ${r.getLong(3)}")
    // null propagation on both the codegen'd ternary and the fallback
    // variadic path — a clustering key with a NULL component must not
    // silently interleave as zero
    val nulls = spark.sql(
      """SELECT zorder3(CAST(NULL AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)) AS a,
        |  zordern(CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS BIGINT)) AS b
        |""".stripMargin).collect()(0)
    assert(nulls.isNullAt(0), "zorder3 must be null on a null input")
    assert(nulls.isNullAt(1), "zorderN must be null on a null input")
  }

  test("3-D z-order clustering bounds ALL THREE dimensions per file") {
    // the N-dimensional generalization (VERDICT r15 #6): OPTIMIZE ZORDER
    // users routinely cluster 3+ columns; with 21 bits × 3 the same
    // mask-shift discipline bounds every file in a BOX of the three-key
    // space, so footer stats prune on any of the three
    val nFiles = 64
    val zout = java.nio.file.Files.createTempDirectory("graft-z3").toString
    operators.LayoutOps.clusterByZOrderN(spark, s"$sfDir/lineitem.parquet",
      zout, nFiles, Seq("l_orderkey", "l_partkey", "l_suppkey"))
    val files = new java.io.File(zout).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length > 16, s"want many files, got ${files.length}")
    val dims = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val exts = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(dims(0)), max(dims(0)), min(dims(1)), max(dims(1)),
          min(dims(2)), max(dims(2))).collect()(0)
      (0 until 6).map(r.getLong)
    }
    dims.indices.foreach { j =>
      val span = exts.map(e => e(2 * j + 1) - e(2 * j)).sum.toDouble / exts.length
      val domain = (exts.map(_(2 * j + 1)).max - exts.map(_(2 * j)).min).toDouble
      // with 64 z-tiles each dimension gets ~2 of the 6 split bits —
      // average extent must be a strict sub-box on every axis
      assert(span < 0.75 * domain,
        s"${dims(j)} not bounded: avg span $span of domain $domain")
      // a narrow mid-domain predicate on THIS key skips files entirely
      val lo = exts.map(_(2 * j)).min + (domain / 8).toLong
      val hi = lo + (domain / 8).toLong
      val hit = exts.count(e => e(2 * j + 1) >= lo && e(2 * j) <= hi)
      assert(hit < files.length,
        s"no file pruned on ${dims(j)}: $hit of ${files.length} overlap")
    }
    assert(spark.read.parquet(zout).count() ==
      Tables.t(spark, sfDir, "lineitem").count())
  }

  test("copy-on-write delete rewrites only the files containing matches") {
    import org.apache.spark.sql.functions._
    // cluster first so the delete predicate is file-aligned — the point
    // of CoW DML: a selective delete over clustered data touches a sliver
    val clustered = java.nio.file.Files.createTempDirectory("graft-cow-src").toString
    operators.LayoutOps.clusterBy(spark, s"$sfDir/lineitem.parquet",
      clustered, 8, "l_orderkey")
    val dst = java.nio.file.Files.createTempDirectory("graft-cow-dst").toString
    val pred = col("l_orderkey") < 100
    val before = spark.read.parquet(clustered)
    val expectKeep = before.filter(!pred).count()
    val (hit, keep) = operators.LayoutOps.deleteWhere(spark, clustered, dst, pred)
    assert(hit >= 1 && hit <= 2, s"range-clustered delete should touch ~1 file, hit $hit")
    assert(hit + keep >= 8, s"file accounting off: $hit + $keep")
    // untouched files are byte-identical copies, not rewrites
    val srcFiles = new java.io.File(clustered).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f).toMap
    val dstFiles = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val copied = dstFiles.filter(f => srcFiles.contains(f.getName))
    assert(copied.length == keep, "every kept file must appear under its own name")
    copied.foreach { f =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.file.Files.readAllBytes(srcFiles(f.getName).toPath)),
        s"untouched file ${f.getName} was rewritten")
    }
    // the table after delete = exactly the non-matching rows
    val after = spark.read.parquet(dst)
    assert(after.count() == expectKeep, "row count after delete is wrong")
    assert(after.filter(pred).isEmpty, "matching rows survived the delete")
  }

  test("copy-on-write update patches matching rows, copies the rest") {
    import org.apache.spark.sql.functions._
    val clustered = java.nio.file.Files.createTempDirectory("graft-cowu-src").toString
    operators.LayoutOps.clusterBy(spark, s"$sfDir/lineitem.parquet",
      clustered, 8, "l_orderkey")
    val dst = java.nio.file.Files.createTempDirectory("graft-cowu-dst").toString
    val pred = col("l_orderkey") < 100
    val (hit, keep) = operators.LayoutOps.updateWhere(spark, clustered, dst,
      pred, Map("l_quantity" -> lit(0.0)))
    assert(hit >= 1 && hit <= 2, s"expected ~1 touched file, got $hit")
    val before = spark.read.parquet(clustered)
    val after = spark.read.parquet(dst)
    assert(after.count() == before.count(), "update must not change row count")
    assert(after.filter(pred && col("l_quantity") =!= 0.0).isEmpty,
      "matching rows not updated")
    // non-matching rows keep their original quantity sum exactly
    val sumBefore = before.filter(!pred)
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val sumAfter = after.filter(!pred)
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(sumBefore == sumAfter, "non-matching rows were altered")
    assert(keep + hit >= 8)
  }

  test("copy-on-write delete handles partition-dir layouts and NULL predicates") {
    import org.apache.spark.sql.functions._
    import graft.SparkSpec.spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-cowp-src").toString
    // partitioned layout (files under yr=.../) with a nullable data column
    Seq((1L, Some(5.0), 1996), (2L, None, 1996), (3L, Some(9.0), 1996),
        (4L, Some(5.0), 1997), (5L, None, 1997), (6L, Some(2.0), 1997))
      .toDF("id", "x", "yr")
      .write.partitionBy("yr").mode("overwrite").parquet(src)
    val dst = java.nio.file.Files.createTempDirectory("graft-cowp-dst").toString
    // DELETE WHERE x = 5.0: NULL-x rows must SURVIVE (predicate NULL, not
    // TRUE) even when they share a file with a matching row
    val (hit, keep) = operators.LayoutOps.deleteWhere(
      spark, src, dst, col("x") === 5.0)
    assert(hit >= 1, "partitioned layout: touched files must be found")
    val after = spark.read.parquet(dst)
    assert(after.count() == 4, s"expected 4 survivors, got ${after.count()}")
    assert(after.filter(col("x").isNull).count() == 2,
      "NULL-predicate rows must survive a DELETE")
    assert(after.filter(col("x") === 5.0).isEmpty)
    // partition column survives via directory structure
    assert(after.filter(col("yr") === 1997).count() == 2)
    assert(keep >= 1, s"files without matches must copy, not rewrite: $hit + $keep")
  }

  test("copy-on-write update evaluates all assignments against the original row") {
    import org.apache.spark.sql.functions._
    import graft.SparkSpec.spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-cowu2-src").toString
    Seq((1L, 1.0, 10.0), (2L, 7.0, 20.0)).toDF("id", "q", "tax")
      .write.mode("overwrite").parquet(src)
    val dst = java.nio.file.Files.createTempDirectory("graft-cowu2-dst").toString
    // assignment sets q to 99 — the tax assignment must still see the
    // ORIGINAL q < 5 predicate outcome, not the updated q
    operators.LayoutOps.updateWhere(spark, src, dst, col("q") < 5,
      Map("q" -> lit(99.0), "tax" -> lit(0.0)))
    val row = spark.read.parquet(dst).filter(col("id") === 1).head()
    assert(row.getDouble(1) == 99.0, "q must update")
    assert(row.getDouble(2) == 0.0,
      "tax must update too — assignments saw a post-update q")
    val row2 = spark.read.parquet(dst).filter(col("id") === 2).head()
    assert(row2.getDouble(1) == 7.0 && row2.getDouble(2) == 20.0)
  }

  test("dynamic partition overwrite rewrites only the touched partition") {
    // the lakehouse backfill primitive: restate ONE partition of a
    // partitioned table without rewriting (or even listing) the others —
    // static overwrite mode would truncate the whole table first
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val orders = Tables.t(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
    orders.write.partitionBy("yr").mode("overwrite").parquet(out)
    val total = orders.count()
    def filesOf(yr: Int): Set[(String, Long)] =
      new java.io.File(s"$out/yr=$yr").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length)).toSet
    val others = Seq(1995, 1997, 1998).map(y => y -> filesOf(y)).toMap
    // restate 1996 with bumped prices
    orders.filter(col("yr") === 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .write.partitionBy("yr").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(out)
    // untouched partitions keep their exact files; nothing was truncated
    others.foreach { case (y, before) =>
      assert(filesOf(y) == before, s"partition yr=$y was rewritten")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == total, "dynamic overwrite lost rows")
    val bumped = back.filter(col("yr") === 1996)
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val expect = orders.filter(col("yr") === 1996)
      .agg(sum(col("o_totalprice") + 1.0)).collect()(0).getDouble(0)
    assert(math.abs(bumped - expect) < 1e-6, s"1996 not restated: $bumped vs $expect")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    import graft.SparkSpec.spark.implicits._
    // 200k rows of one hot key vs 5k spread keys — one shuffle partition
    // carries ~40x the median
    val hot = spark.range(200000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(5000).select((col("id") % 100 + 2).as("k"), col("id").as("v")))
    val dim = spark.range(200).select(col("id").as("k"), (col("id") * 10).as("w"))
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    try {
      // force a sort-merge join and make the hot partition count as skewed
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // aggregate on the DIM attribute, not the join key: a same-key
      // groupBy could reuse the join's partitioning, and AQE refuses to
      // split skewed partitions when that would cost an extra shuffle.
      // sum("v") keeps the fact payload column alive through the shuffle —
      // a pruned-to-one-constant-column hot partition compresses below
      // any skew threshold
      val joined = hot.join(dim, "k").groupBy("w")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      // collect() executes joined's OWN query execution (count() would
      // build a separate one and leave this plan un-finalized)
      assert(joined.collect().length == 101)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables.t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    import graft.SparkSpec.spark.implicits._
    // dim carries the year filter; the fact side has NO static filter —
    // only DPP can skip its partition directories. The dim must be a
    // FILE-backed scan with a real pushed predicate: an in-memory Seq
    // constant-folds the filter away and DPP sees no selective predicate.
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dppdim").toString
    (1992 to 1998).map(y => (y, if (y == 1995) "pick" else "skip"))
      .toDF("d_year", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "pick")
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"),
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" ->
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats", "true"),
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" ->
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "0.5"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      // the test tables are a few KB, below the stats heuristic's radar —
      // use the ratio fallback so the DPP decision reflects plan SHAPE
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "5.0")
      val joined = spark.read.parquet(out)
        .join(dim, col("o_year") === col("d_year"))
        .groupBy("o_year").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.length == 1 && rows(0).getInt(0) == 1995)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"no dynamic-pruning subquery in plan:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("partition pruning reads only the filtered partition directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // the scan must report fewer files than the full table
    val scanAll = spark.read.parquet(out)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().map {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
        case _ => 0L
      }.sum
    val few = filesRead(pruned)
    val all = filesRead(scanAll)
    assert(few > 0 && few < all,
      s"pruning read $few of $all files — partition filter not applied")
    // correctness of the pruned read
    assert(pruned.count() ==
      Tables.t(spark, sfDir, "orders")
        .filter(year(col("o_orderdate")) === 1995).count())
  }
}
