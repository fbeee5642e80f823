package graft

import graft.functions.SkewOps
import org.apache.spark.sql.functions._

/** Salting produces results identical to the direct operation on heavily
  * skewed keys (90% of rows share one key). */
class SkewOpsSpec extends SparkSpec {

  private lazy val skewed = {
    import graft.SparkSpec.spark.implicits._
    // 9000 rows of hot key 0, 1000 spread over 100 cold keys
    val rows = (1 to 9000).map(i => (0L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 100 + 1).toLong, i.toDouble))
    rows.toDF("k", "v").repartition(8)
  }

  test("saltedCount matches direct groupBy count") {
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCount(skewed, col("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted(0L) == 9000L)
  }

  test("saltedSum matches direct groupBy sum") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedSum(skewed, col("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    // partial sums may re-associate doubles; compare with tolerance
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("saltedJoin preserves join cardinality and content") {
    import graft.SparkSpec.spark.implicits._
    val dim = (0L to 100L).map(k => (k, s"name_$k")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
    val salted = SkewOps.saltedJoin(skewed, dim, "k", "dk")
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("saltedJoin works when both sides share the key name (self-join)") {
    // the canonical skew case: a frame joined against itself — unqualified
    // col(key) refs were ambiguous and failed analysis
    import graft.SparkSpec.spark.implicits._
    val small = (0L to 20L).map(k => (k % 5, s"v_$k")).toDF("k", "v")
    val plain = small.as("a").join(small.as("b"),
      col("a.k") === col("b.k")).count()
    val salted = SkewOps.saltedJoin(small, small.toDF("k", "v2"), "k", "k")
    assert(salted.count() == plain)
  }
}
