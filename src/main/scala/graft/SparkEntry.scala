package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 5-way broadcast star join + aggregation — exercises scan, broadcast
    * join, partial aggregation, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    JoinOps.queries("j5_star_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanOps.queries ++ JoinOps.queries ++ AggOps.queries ++
      WindowOps.queries ++ LlmOps.queries ++ UdfOps.queries ++
      StreamOps.queries ++ MetaOps.queries ++ MediaOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanOps.oracleSql ++ JoinOps.oracleSql ++ AggOps.oracleSql ++
      WindowOps.oracleSql ++ LlmOps.oracleSql ++ UdfOps.oracleSql ++
      StreamOps.oracleSql ++ MetaOps.oracleSql ++ MediaOps.oracleSql
}
