package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** o20's Merkle contract, pinned at the FILE level (the oracle pins the
  * row level): the two-label diff must isolate the rewritten bucket
  * from manifest metadata alone, with every untouched block deduped to
  * the same CAS sha — diff cost tracks the write set, not the table. */
class SnapDiffSpec extends SparkSpec {

  test("manifest diff isolates the rewritten bucket; untouched blocks dedup") {
    val (oldC, newC) = ScanOps.SnapDiff.changedEntries(spark, sfDir)
    // exactly one file per side differs — the rewritten bucket
    assert(oldC.size == 1 && newC.size == 1,
      s"changed files: ${oldC.map(_.path)} -> ${newC.map(_.path)}")
    assert(oldC.head.path.startsWith("orders/bucket=3/") &&
      newC.head.path.startsWith("orders/bucket=3/"))
    // the 7 untouched buckets share (path, sha) across the labels — the
    // CAS holds ONE copy and the differ never opens them
    val diffRows = ScanOps.queries("o20_snapshot_diff")(spark, sfDir)
    assert(diffRows.count() == 14) // keys %8==3 and %13==0 at sf0.001
    assert(diffRows.filter(pmod(col("o_orderkey"), lit(8)) =!= 3).count() == 0)
  }
}
