package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

/** dot_f32 codegen expression: bit-identical to the higher-order fold
  * formulation (same float op order), null-safe, and actually codegen'd. */
class VectorExprSpec extends SparkSpec {

  test("dot_f32 equals aggregate(zip_with(...)) bit-for-bit") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val l = e.select(col("vec_id").as("a"), col("embedding").as("va")).limit(20)
    val r = e.select(col("vec_id").as("b"), col("embedding").as("vb")).limit(20)
    val pairs = l.crossJoin(r)
      .withColumn("native", expr("dot_f32(va, vb)"))
      .withColumn("fold", aggregate(
        zip_with(col("va"), col("vb"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x))
    val diff = pairs.filter(col("native") =!= col("fold")).count()
    assert(diff == 0, s"$diff pairs differ between codegen and fold")
  }

  test("cosine_f32 equals dot/(norm*norm) fold formulation bit-for-bit") {
    VectorExpressions.register(spark)
    def fold(c: org.apache.spark.sql.Column) = aggregate(c, lit(0.0), (a, x) => a + x)
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(fold(transform(c, x => x.cast("double") * x.cast("double"))))
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val l = e.select(col("vec_id").as("a"), col("embedding").as("va")).limit(20)
    val r = e.select(col("vec_id").as("b"), col("embedding").as("vb")).limit(20)
    val pairs = l.crossJoin(r)
      .withColumn("fused", expr("cosine_f32(va, vb)"))
      .withColumn("threepass",
        fold(zip_with(col("va"), col("vb"), (x, y) => x.cast("double") * y.cast("double")))
          / (nrm(col("va")) * nrm(col("vb"))))
    val diff = pairs.filter(col("fused") =!= col("threepass")).count()
    assert(diff == 0, s"$diff pairs differ between fused cosine and 3-pass")
  }

  test("null inputs yield null") {
    VectorExpressions.register(spark)
    import graft.SparkSpec.spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = df.selectExpr("dot_f32(a, b) AS d").collect()
    assert(out.head.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = e.selectExpr("dot_f32(embedding, embedding) AS n2")
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dot_f32"), s"no codegen span:\n$plan")
  }

  test("simhash64 kernel ≡ relational formulation on tokenization edge cases") {
    // the kernel byte-scans for token boundaries; the relational mirror
    // uses built-in split/lower/xxhash64 — agreement on empties (interior,
    // leading, trailing, whole-string), case folding, and multi-byte
    // UTF-8 pins the boundary semantics bit-for-bit
    import graft.SparkSpec.spark.implicits._
    val texts = Seq(
      "", "a", "a ", " a", "a  b", "a   ", "ALPHA Beta GAMMA",
      "héllo wörld  mixé", "日本語 テスト x", "tab\tis one token",
      "many words " + (1 to 50).map(i => s"w$i").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = graft.operators.LlmOps.simhash64Of(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val relational = graft.operators.LlmOps.simhash64OfRelational(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel == relational,
      s"kernel-only=${kernel -- relational} relational-only=${relational -- kernel}")
  }

  test("simhash64 kernel ≡ relational formulation on the corpus; codegen; null") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text")
    val kernel = graft.operators.LlmOps.simhash64Of(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val relational = graft.operators.LlmOps.simhash64OfRelational(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel == relational)
    val plan = graft.operators.LlmOps.simhash64Of(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("simhash64"), plan)
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    // null text → dropped, matching the relational form (no tokens)
    import graft.SparkSpec.spark.implicits._
    val withNull = Seq((1L, Some("a b")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    assert(graft.operators.LlmOps.simhash64Of(withNull)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
