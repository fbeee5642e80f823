package graft

/** The SQL-first user surface: one attach call, then the whole engine —
  * views over every table plus every custom function — is reachable from
  * plain spark.sql. */
class GraftSessionSpec extends SparkSpec {

  test("attach exposes tables and the full custom-function surface to SQL") {
    GraftSession.attach(spark, sfDir)
    // views
    assert(spark.sql("SELECT count(*) AS n FROM lineitem").collect()(0).getLong(0) > 0)
    // codegen'd vector kernels + generator + aggregator, all in one query
    val rows = spark.sql(
      """SELECT e.vec_id,
        |  cosine_f32(e.embedding, e.embedding) AS self_cos,
        |  sign_lsh(e.embedding, 2, 8)[0] AS sig0
        |FROM embeddings e WHERE e.vec_id < 5""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"cosine(v, v) must be 1.0, got ${r.getDouble(1)}"))
    val chunks = spark.sql(
      "SELECT doc_id, chunk_idx, chunk_len FROM documents " +
        "LATERAL VIEW range_chunks(n_chars * 997, 204800) rc AS chunk_idx, chunk_start, chunk_len " +
        "WHERE doc_id < 3").collect()
    assert(chunks.nonEmpty)
    val covered = spark.sql(
      """SELECT l_suppkey, interval_union(
        |  (l_orderkey * 7 + l_linenumber * 3) % 1000,
        |  (l_orderkey * 7 + l_linenumber * 3) % 1000 + 5) AS cov
        |FROM lineitem GROUP BY l_suppkey LIMIT 5""".stripMargin).collect()
    assert(covered.forall(_.getLong(1) > 0))
    // round-4 additions: Morton interleave + bloom membership probe
    val z = spark.sql(
      "SELECT zorder2(CAST(3 AS BIGINT), CAST(0 AS BIGINT)) AS z").collect()(0).getLong(0)
    assert(z == 5L, s"zorder2(0b11, 0) must be 0b101, got $z")
    val bf = spark.range(10).selectExpr("xxhash64(id) AS h")
      .stat.bloomFilter("h", 10, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val hex = bos.toByteArray.map("%02X".format(_)).mkString
    val hits = spark.range(20).selectExpr("id", "xxhash64(id) AS h")
      .where(s"graft_might_contain(X'$hex', h)").count()
    assert(hits >= 10 && hits < 20, s"bloom probe implausible: $hits")
  }

  test("GraftExtensions injects the function surface via spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    val old = graft.SparkSpec.spark
    // spark.sql.extensions is a STATIC conf — applied only at context
    // creation (the `--conf spark.sql.extensions=graft.GraftExtensions`
    // spark-submit path). Over an existing context, Builder.withExtensions
    // exercises the same injector on a fresh session.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(e => new GraftExtensions().apply(e))
        .getOrCreate()
      assert(s2 ne old, "expected a new session to apply extensions")
      val c = s2.sql(
        "SELECT cosine_f32(array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)), " +
          "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val sig = s2.sql("SELECT sign_lsh(array(CAST(1.0 AS FLOAT)), 2, 8) AS s")
        .collect()(0).getSeq[Long](0)
      assert(sig.length == 2)
      assert(s2.sql("SELECT range_chunks(500000, 204800)").collect().length == 3)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
