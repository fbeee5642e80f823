package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** l14 TF-IDF invariants (no SQL oracle — spark.ml featurization):
  * every doc gets a positive weight sum; a token appearing in every doc
  * contributes ~0 idf; results are deterministic run-to-run. */
class TfIdfSpec extends SparkSpec {

  test("tfidf sums are positive, one row per doc, deterministic") {
    val a = LlmOps.queries("l14_tfidf")(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(a.count() == docs.count())
    assert(a.filter(col("tfidf_sum") <= 0).count() == 0)
    val b = LlmOps.queries("l14_tfidf")(spark, sfDir)
    val ja = a.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val jb = b.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ja == jb, "tf-idf not deterministic across runs")
  }
}
