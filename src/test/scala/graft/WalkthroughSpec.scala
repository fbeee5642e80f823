package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Executes the README's "End-to-end walkthrough" section verbatim
  * (VERDICT r9 #6): every capability exists and is separately spec'd,
  * but nothing else proves the DOCUMENTED journey composes — init a
  * repo, link remote data, publish a corpus, query the snapshot with
  * `Cli sql` over pufs://, bootstrap the standing indexes from the
  * snapshot, run a streaming curation batch against them, and screen
  * the next day's arrivals. Keep this test and the README section in
  * lockstep: the section documents exactly these steps in order. */
class WalkthroughSpec extends SparkSpec {

  private def captureOut(body: => Int): (Int, String) = {
    val bos = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      val saved = System.out
      System.setOut(new java.io.PrintStream(bos, true, "UTF-8"))
      try body finally System.setOut(saved)
    }
    (code, bos.toString("UTF-8"))
  }

  private def doc(prefix: String): String =
    (1 to 40).map(i => s"$prefix$i").mkString(" ")

  test("README walkthrough: init → link → push → sql → index bootstrap → curate → screen") {
    import graft.SparkSpec.spark.implicits._
    val root = Files.createTempDirectory("walkthrough")

    // ── 1. initialize a content-addressed snapshot repo ─────────────────
    val repo = root.resolve("repo").toString
    val (cInit, oInit) = captureOut(
      Cli.run(List("init", repo, "datalake", "corpora/demo")))
    assert(cInit == 0 && oInit.contains("initialized"), oInit)

    // ── 2. link an external HTTP object into a backing tree (lazy,
    //       ETag-pinned; bytes move only when read) ──────────────────────
    val rawBytes = "raw external corpus drop".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/drop", { (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        ex.getResponseHeaders.set("ETag", "\"drop-v1\"")
        if (ex.getRequestMethod == "HEAD") {
          ex.getResponseHeaders.set("Content-Length", rawBytes.length.toString)
          ex.sendResponseHeaders(200, -1)
        } else {
          ex.sendResponseHeaders(200, rawBytes.length)
          ex.getResponseBody.write(rawBytes)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val backing = root.resolve("backing").toString
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/drop"
      val (cLink, oLink) = captureOut(
        Cli.run(List("link", backing, "/ext/drop.bin", url)))
      assert(cLink == 0 && oLink.contains(s"${rawBytes.length} bytes"), oLink)
      // read the linked bytes back through the lazily-caching pufs:// FS
      spark.sparkContext.hadoopConfiguration
        .set("fs.pufs.impl", "graft.sources.PufsFileSystem")
      val prefix =
        graft.sources.PufsFileSystem.registerBacking("walkthrough", backing)
      val pulled = spark.sparkContext
        .binaryFiles(s"$prefix/ext/drop.bin").first()._2.toArray()
      assert(java.util.Arrays.equals(pulled, rawBytes),
        "linked object must read back byte-identical through pufs://")

      // ── 3. publish the day-0 corpus as a labeled snapshot ─────────────
      val corpus = Seq(
        10L -> doc("alpha"), 15L -> doc("bravo"), 17L -> doc("delta"))
        .toDF("doc_id", "text")
      val srcDir = root.resolve("day0").toString
      corpus.write.parquet(s"$srcDir/documents")
      val (cPush, oPush) = captureOut(
        Cli.run(List("push", srcDir, repo, "corpus")))
      assert(cPush == 0 && oPush.contains("published corpus root="), oPush)

      // ── 4. query the published snapshot in place: Cli sql mounts the
      //       label through pufs:// and registers each table dir ─────────
      val (cSql, oSql) = captureOut(Cli.run(List("sql", repo, "corpus",
        "SELECT count(*) AS n_docs, min(doc_id) AS first_id FROM documents")))
      assert(cSql == 0 && oSql.contains("3") && oSql.contains("10"), oSql)

      // ── 5. bootstrap the standing curation state FROM the snapshot:
      //       exact + near-dup indexes over the corpus, plus the eval
      //       decontamination model — into the dirs the streaming
      //       pipeline owns ──────────────────────────────────────────────
      graft.sources.PufsFileSystem.mountSnapshot("snap/corpus", repo, "corpus")
      val mounted = spark.read.parquet("pufs:///snap/corpus/documents")
      val pipe = root.resolve("pipe").toString
      graft.operators.DedupIndex.build(spark, mounted, s"$pipe/exact")
      graft.operators.JaccardIndex.build(spark, mounted, s"$pipe/jaccard")
      val evalDoc = "benchmark question secret one two three four five " +
        "six seven eight"
      graft.streaming.StreamJobs.buildDecontamModel(
        Seq(1L -> evalDoc).toDF("doc_id", "text"), s"$pipe/eval-model")

      // ── 6. stream a day-1 batch through the curation pipeline: quality
      //       gate → exact dedup (vs index) → near-dup (vs index) →
      //       decontam → split; accepted/ lands, BOTH indexes advance ────
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamJobs.curateIngest(
          mem.toDF().toDF("doc_id", "text"), s"$pipe/eval-model", pipe)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
      mem.addData(
        100L -> doc("alpha"),                        // exact dup of snapshot 10
        // "alpha17" matches exactly one token (unlike e.g. "alpha3",
        // which also rewrites alpha30..alpha39 and sinks Jaccard below τ)
        101L -> doc("alpha").replace("alpha17", "x"), // near dup of snapshot 10
        102L -> (("pad " * 15).trim + " " + evalDoc), // eval-contaminated
        103L -> "too short",                          // fails quality
        104L -> doc("golf"))                          // novel → accepted
      q.processAllAvailable()
      q.stop()
      val accepted = spark.read.parquet(s"$pipe/accepted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(accepted == Set(104L),
        s"curation must accept exactly the clean novel doc: $accepted")

      // ── 7. next-day screens hit the ADVANCED indexes: yesterday's
      //       accepted doc is now a known content / near-dup target ──────
      val day2 = Seq(200L -> doc("golf"), 201L -> doc("hotel"))
        .toDF("doc_id", "text")
      val novel = graft.operators.DedupIndex
        .newAgainst(spark, s"$pipe/exact", day2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(novel == Set(201L),
        s"exact screen must know yesterday's acceptance: $novel")
      val nd = graft.operators.JaccardIndex.pairsAgainst(
          spark, s"$pipe/jaccard",
          Seq(300L -> doc("golf").replace("golf5", "y")).toDF("doc_id", "text"))
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(nd == Set((104L, 300L)),
        s"near-dup screen must match yesterday's acceptance: $nd")
      graft.sources.PufsFileSystem.unmountSnapshot("snap/corpus")
    } finally server.stop(0)
  }
}
