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

  test("l5 queries run over testdata") {
    val agg = graft.operators.MetaOps.queries("l5_meta_agg")(spark, sfDir).collect()
    assert(agg.length == 1 && agg.head.getString(0) == "parquet"
      && agg.head.getLong(1) == 10L)
    val listing = graft.operators.MetaOps.queries("l5b_meta_listing")(spark, sfDir)
    assert(listing.count() == 11) // root + 10 parquet files
  }
}
