package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pufs-meta DSv2: exact listing over a generated fixture tree (the `ls`
  * contract — reference core/datastore.go:445-482) + pruning pushdown. */
class MetaSourceSpec extends SparkSpec {

  private lazy val fixture: String = {
    val root = Files.createTempDirectory("meta-fix").toString
    Files.createDirectories(Paths.get(root, "d1/d2"))
    Files.write(Paths.get(root, "top.csv"), "x,y".getBytes)
    Files.write(Paths.get(root, "d1/one.parquet"), Array.fill(10)(1.toByte))
    Files.write(Paths.get(root, "d1/d2/two.txt"), Array.fill(20)(2.toByte))
    root
  }

  test("listing matches the tree exactly") {
    val df = spark.read.format("pufs-meta").load(fixture)
    val rows = df.select("path", "isDir", "size", "depth", "ext")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      ("", true, 0L, 0, ""),
      ("d1", true, 0L, 1, ""),
      ("d1/d2", true, 0L, 2, ""),
      ("d1/d2/two.txt", false, 20L, 3, "txt"),
      ("d1/one.parquet", false, 10L, 2, "parquet"),
      ("top.csv", false, 3L, 1, "csv")))
  }

  test("aggregation over the metadata table") {
    val agg = spark.read.format("pufs-meta").load(fixture)
      .filter(!col("isDir"))
      .groupBy("ext").agg(count(lit(1)).as("n"), sum("size").as("sz"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(agg == Seq(("csv", 1L, 3L), ("parquet", 1L, 10L), ("txt", 1L, 20L)))
  }

  test("column pruning is pushed to the reader") {
    val df = spark.read.format("pufs-meta").load(fixture).select("ext", "size")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.columns.toSeq == Seq("ext", "size"))
    assert(df.count() == 6)
  }

  test("l5 lanes aggregate the nation-derived fixture tree") {
    // expectations recomputed HERE from the nation table — the same
    // derivation the DuckDB oracle uses
    val nations = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val idxNations = nations.filter(_._1 % 7 == 0)
    val agg = graft.operators.MetaOps.queries("l5_meta_agg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val binTotal = nations.map { case (nk, _) =>
      (0 until 3).map(j => 64L + 13 * nk + j).sum }.sum
    assert(agg == Seq(
      ("bin", 3L * nations.length, binTotal),
      ("idx", idxNations.length.toLong, idxNations.map(32L + _._1).sum)))
    val listing = graft.operators.MetaOps.queries("l5b_meta_listing")(spark, sfDir)
    val expectRows = 1 + nations.map(_._2).distinct.length +
      idxNations.map(_._2).distinct.length +
      3 * nations.length + idxNations.length
    assert(listing.count() == expectRows)
  }

  test("l5 fixture is content-addressed, build-once, and immutable") {
    val p1 = graft.operators.MetaOps.fixture(spark, sfDir)
    assert(p1.matches(".*graft_meta_fixture_[0-9a-f]{16}$"),
      s"fixture dir is not content-addressed: $p1")
    // record a file's mtime, then re-invoke concurrently from many
    // threads — the published tree must never be rebuilt or touched
    val probe = Files.walk(Paths.get(p1)).filter(Files.isRegularFile(_))
      .findFirst().get()
    val mtime = Files.getLastModifiedTime(probe)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val paths = Await.result(
      Future.sequence((1 to 8).map(_ =>
        Future(graft.operators.MetaOps.fixture(spark, sfDir)))), 60.seconds)
    assert(paths.forall(_ == p1), s"concurrent fixture paths diverge: $paths")
    assert(Files.getLastModifiedTime(probe) == mtime,
      "an existing published fixture was modified by a later call")
    // no half-built debris left behind by the losing builders
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val debris = Files.list(tmp).toArray.map(_.toString)
      .filter(_.contains("graft_meta_build_"))
    assert(debris.isEmpty, s"builder temp dirs leaked: ${debris.toSeq}")
  }

  test("l5d small-file report flags debris dirs and clears healthy ones") {
    val root = Files.createTempDirectory("meta-smallfiles").toString
    Files.createDirectories(Paths.get(root, "debris"))
    Files.createDirectories(Paths.get(root, "healthy"))
    (1 to 12).foreach(i =>
      Files.write(Paths.get(root, s"debris/p$i.parquet"), Array.fill(100)(i.toByte)))
    (1 to 2).foreach(i =>
      Files.write(Paths.get(root, s"healthy/big$i.parquet"),
        Array.fill(8 * 1024 * 1024)(i.toByte)))
    val report = graft.operators.MetaOps.smallFileReport(spark, root)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(r.fieldIndex("needs_compaction")))).toMap
    assert(report("debris") == ((12L, true)), report.toString)
    assert(report("healthy") == ((2L, false)), report.toString)
  }

  test("M2 extended listing surfaces cache population after a partial read") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val backing = Files.createTempDirectory("meta-m2").toString
    val data = new Array[Byte](200 * 1024)
    new scala.util.Random(31).nextBytes(data)
    Files.write(Paths.get(backing, "hot.bin"), data)
    Files.write(Paths.get(backing, "cold.bin"), data)
    // pull a slice of hot.bin through pufs://
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.pufs.impl", classOf[PufsFileSystem].getName)
    conf.set("fs.pufs.backing", backing)
    conf.set("fs.pufs.cache", Files.createTempDirectory("meta-m2-cache").toString)
    conf.setLong("fs.pufs.chunk.size", 8192)
    conf.setLong("fs.pufs.readahead", 0)
    conf.setBoolean("fs.pufs.impl.disable.cache", true)
    val fs = FileSystem.get(java.net.URI.create("pufs:///"), conf)
    val in = fs.open(new Path("/hot.bin"))
    in.readFully(0L, new Array[Byte](10000), 0, 10000)
    in.close(); fs.close()
    // the listing row for hot.bin shows the pulled bytes; cold.bin shows 0
    val rows = graft.operators.MetaOps.queries("l5c_meta_cache_stats")(spark, backing)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(rows("hot.bin")._1 == 16384 && rows("hot.bin")._2 == 1,
      s"expected two pulled 8KiB chunks as one region, got ${rows("hot.bin")}")
    assert(rows("cold.bin") == ((0L, 0)), s"unread file shows ${rows("cold.bin")}")
  }

  test("maxDepth budget lists the frontier without descending past it") {
    val rows = spark.read.format("pufs-meta").option("maxDepth", "1")
      .load(fixture).select("path", "isDir")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1).toSeq
    // d1 appears as an entry (the frontier) but d1/* was never listed
    assert(rows == Seq(("", true), ("d1", true), ("top.csv", false)))
  }

  test("maxDepth=0 performs NO listings at all") {
    PufsMetaTable.dirsListed.set(0)
    val rows = spark.read.format("pufs-meta").option("maxDepth", "0")
      .load(fixture).select("path").collect().map(_.getString(0)).toSeq
    assert(rows == Seq(""), s"only the root row can be emitted, got $rows")
    assert(PufsMetaTable.dirsListed.get() == 0,
      "a zero budget still listed children it must discard")
  }

  test("deferred listing: a LIMIT over a wide tree doesn't walk the world") {
    // 200 dirs x 5 files = 1200 entries; a limit(3) scan must list only a
    // tiny fraction of the directories (M19: fetch children on touch)
    val root = Files.createTempDirectory("meta-wide").toString
    (0 until 200).foreach { i =>
      val d = Paths.get(root, f"d$i%03d")
      Files.createDirectories(d)
      (0 until 5).foreach(j => Files.write(d.resolve(s"f$j.bin"), Array[Byte](1)))
    }
    PufsMetaTable.dirsListed.set(0)
    val few = spark.read.format("pufs-meta").load(root).limit(3).collect()
    assert(few.length == 3)
    val listed = PufsMetaTable.dirsListed.get()
    assert(listed < 40,
      s"limit(3) listed $listed of 201 directories — listing is not deferred")
  }
}
