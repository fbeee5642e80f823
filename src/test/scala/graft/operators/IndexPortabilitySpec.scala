package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.{FakeGcs, GcsAuth, GcsRefRegistry, PufsFileSystem,
  RemoteSnapshotRepo, SnapshotStore}
import org.apache.spark.sql.functions._

/** The standing indexes are scheme-portable: every path they touch goes
  * through the Hadoop FileSystem of the indexDir's scheme (the fsFor
  * seam), so an index can live on a pufs:// mount, and an index tree
  * published + pushed to a remote registry label answers queries
  * identically after the pull. Local-path specs prove semantics;
  * THIS spec proves the non-local claim those scaladocs make. */
class IndexPortabilitySpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def pufsRoot(tag: String): String = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.pufs.impl", classOf[PufsFileSystem].getName)
    hc.set("fs.pufs.backing",
      Files.createTempDirectory(s"$tag-backing").toString)
    hc.set("fs.pufs.cache", Files.createTempDirectory(s"$tag-cache").toString)
    hc.set("fs.pufs.impl.disable.cache", "true")
    s"pufs:///$tag"
  }

  test("DedupIndex lives on a pufs:// mount: build, screen, append, re-screen") {
    val indexDir = pufsRoot("dedup-idx")
    val corpus = Seq(
      (1L, "alpha content"), (2L, "beta content"), (3L, "alpha content")
    ).toDF("doc_id", "text")
    assert(DedupIndex.build(spark, corpus, indexDir) == 2)
    // bloom shards landed behind the scheme, not on a literal local path
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/blooms/shard-0.bin")))
    assert(!Files.exists(Paths.get("pufs:")),
      "a java.nio fallback wrote a local dir literally named pufs:")

    val batch = Seq(
      (10L, "alpha content"), (11L, "novel one"), (12L, "novel two")
    ).toDF("doc_id", "text")
    val fresh = DedupIndex.newAgainst(spark, indexDir, batch)
    assert(fresh.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(11L, 12L))
    DedupIndex.append(spark, indexDir, fresh)
    assert(DedupIndex.newAgainst(spark, indexDir, batch).isEmpty,
      "appended contents must screen as known through the pufs scheme")
  }

  test("AnnIndex built on pufs:// answers identically to the local build") {
    val localDir = Files.createTempDirectory("ann-local").toString
    val remoteDir = pufsRoot("ann-idx")
    AnnIndex.build(spark, sfDir, localDir)
    AnnIndex.build(spark, sfDir, remoteDir)
    def answers(dir: String) =
      AnnIndex.query(spark, dir, nProbes = 10, k = 5)
        .collect().map(_.toSeq).toSet
    assert(answers(remoteDir) == answers(localDir),
      "the pufs-resident index must serve the same neighbors")
  }

  test("NearDupIndex round-trips a remote registry label intact") {
    val keyPair = {
      val g = java.security.KeyPairGenerator.getInstance("RSA")
      g.initialize(2048)
      g.generateKeyPair()
    }
    val srv = new FakeGcs(keyPair)
    try {
      val reg = new GcsRefRegistry(srv.endpoint, "bkt", "idx/",
        new GcsAuth.TokenProvider(srv.account))
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val gen1 = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)

      // producer: build locally, publish the index TREE, push the label
      val dirA = Files.createTempDirectory("neardup-src").toString
      NearDupIndex.build(spark, gen1, dirA)
      val repo = Files.createTempDirectory("neardup-repo").toString
      SnapshotStore.publish(dirA, repo, "neardup")
      RemoteSnapshotRepo.push(repo, "neardup", reg, "neardup")

      // consumer: mount the label, pull every entry, query the replica
      val dirB = Files.createTempDirectory("neardup-pulled").toString
      val cache = Files.createTempDirectory("neardup-cache").toString
      val (_, entries) = RemoteSnapshotRepo.mount(reg, "neardup")
      entries.foreach { e =>
        val dst = Paths.get(dirB, e.path)
        Files.createDirectories(dst.getParent)
        val buf = new Array[Byte](e.size.toInt)
        if (e.size > 0) {
          val in = RemoteSnapshotRepo.openFile(reg, e, cache, chunkSize = 64 * 1024)
          try in.readFully(0L, buf, 0, buf.length) finally in.close()
        }
        Files.write(dst, buf)
      }
      def pairs(dir: String) =
        NearDupIndex.candidatesAgainst(spark, dir, batch)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs(dirB)
      assert(got == pairs(dirA),
        "registry-distributed index must screen identically to the source")
      assert(got.nonEmpty, "fixture must actually produce candidates")
    } finally srv.stop()
  }
}
