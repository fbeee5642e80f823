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
  }
}
