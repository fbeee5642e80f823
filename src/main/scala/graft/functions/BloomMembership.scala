package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter membership as a codegen'd predicate.
  *
  * Spark ships `BloomFilterMightContain` for its own runtime row-level
  * filtering but does not register it as a SQL function; we register it as
  * `graft_might_contain(bloomBytes, hash)` so set-membership screens stay
  * inside whole-stage codegen (no Scala UDF in the hot path).
  *
  * The 100 TB pattern this enables: build a Bloom filter over the SMALL
  * side of a semi/anti-join (an eval benchmark's shingle set, a blocklist,
  * a tombstone set), embed it in the plan as a byte literal, and screen the
  * BIG side with a shuffle-free scan predicate. Only the ~fpp fraction of
  * surviving rows reaches the exact confirm join, so the shuffle carries
  * ~1% of the corpus instead of all of it. At 9.6 bits/key (1% fpp) a
  * 10^8-key eval set is a ~120 MB broadcast — the same order as a
  * broadcast-hash-join build side, but O(1)-sized per probe and mergeable.
  *
  * The screen is a pure optimization: callers MUST re-verify survivors with
  * an exact join (Bloom false positives), which is what keeps l29's result
  * hash-identical to the unscreened anti-join formulation.
  */
object BloomMembership {

  /** Registers `graft_might_contain(bloom BINARY, h BIGINT) -> BOOLEAN`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")

  /** Builds a Bloom filter over `df.col(hashCol)` (LongType, typically
    * `xxhash64(...)`) via a distributed treeAggregate and returns it as a
    * plan-embeddable byte-array literal. `expectedItems` sizes the filter;
    * the driver only ever holds the filter, never the rows. */
  def buildBloomLiteral(df: DataFrame, hashCol: String,
                        expectedItems: Long, fpp: Double = 0.01): Column = {
    val bf = df.stat.bloomFilter(hashCol, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    lit(bos.toByteArray)
  }

  /** `graft_might_contain(bloom, h)` as a Column (registers on the way). */
  def mightContain(spark: SparkSession, bloom: Column, h: Column): Column = {
    register(spark)
    call_function("graft_might_contain", bloom, h)
  }
}
