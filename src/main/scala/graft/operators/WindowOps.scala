package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Window-function inventory (SURVEY §2.3 "Windows"; queries Q-W1..W6).
  *
  * The reference's region-mask "running coverage" computation
  * (reference region/region.go:28-124) is exactly a window frame: sorted
  * intervals folded with a running max — Q-W3/Q-W4 are that shape over the
  * star schema; Q-U2 (UdfOps) is the literal interval-union as a UDAF.
  *
  * 100 TB notes: every window below is partitioned by a high-cardinality key
  * (custkey/suppkey/date), so the sort is per-partition after one hash
  * shuffle — no global sort. The only global windows (W2/W4/W5) run over
  * already-aggregated frames (≤ thousands of rows at any SF) or bounded
  * dimensions. Running sums use exact decimal arithmetic cast back to double
  * so prefix sums hash-match DuckDB bit-for-bit.
  */
object WindowOps {

  type Q = (SparkSession, String) => DataFrame

  /** Global dense rank over a total order WITHOUT a single-partition window
    * (VERDICT r2 #4): two-pass quantile scheme —
    * (1) one pass computes ~numParts approx-percentile cut points of the
    *     sort value (a tiny driver-side literal, like an index-build step);
    * (2) every row derives its bucket `pid` FROM ITS VALUE against those
    *     literal cuts, ranks locally per bucket, and adds the broadcast
    *     prefix-sum offset of its bucket. `grn` = exact global row_number;
    *     `n_total` = total rows.
    *
    * The bucket id is a pure function of the row's value and frozen
    * literals — NOT of a physical partitioner — so the offsets subtree and
    * the rank subtree agree by construction. (The earlier
    * `repartitionByRange + spark_partition_id` formulation executed TWO
    * independent range exchanges whose sampled boundaries are only
    * coincidentally equal on small data — a silent wrong-answer at scale.)
    * Equal sort values always share a bucket, so cross-bucket order is
    * strict and concatenation order is exact; `tieBreak` orders within.
    * Cut quality only affects balance, never correctness. */
  private[operators] def withGlobalRank(df: DataFrame, numParts: Int,
      sortVal: org.apache.spark.sql.Column,
      tieBreak: org.apache.spark.sql.Column): DataFrame = {
    val probs = (1 until numParts).map(_.toDouble / numParts)
    val cuts: Seq[Double] = df
      .agg(percentile_approx(sortVal, typedlit(probs), lit(10000)).as("cuts"))
      .head().getSeq[Double](0)
    val pid = size(filter(typedlit(cuts), c => c < sortVal))
    val parted = df.withColumn("pid", pid)
    val offW = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = parted.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(sum("cnt").over(offW), lit(0L)).as("off"),
        sum("cnt").over(totW).as("n_total"))
    val localW = Window.partitionBy("pid").orderBy(sortVal, tieBreak)
    parted.withColumn("lrn", row_number().over(localW))
      .join(broadcast(offsets), "pid")
      .withColumn("grn", col("off") + col("lrn"))
  }

  val queries: Map[String, Q] = Map(
    // Q-W1: row_number / rank / dense_rank per customer by order value.
    // rank/dense_rank rank a coarsened bucket so ties actually occur;
    // row_number gets a total order (unique tiebreak) for determinism.
    "w1_ranking" -> ((s, d) => {
      val o = t(s, d, "orders")
        .withColumn("price_k", floor(col("o_totalprice") / 10000).cast("long"))
      val total = Window.partitionBy("o_custkey")
        .orderBy(col("price_k").desc, col("o_orderkey"))
      val ties = Window.partitionBy("o_custkey").orderBy(col("price_k").desc)
      o.select(
          col("o_custkey"), col("o_orderkey"), col("price_k"),
          row_number().over(total).as("rn"),
          rank().over(ties).as("rk"),
          dense_rank().over(ties).as("drk"))
        .orderBy("o_custkey", "rn")
    }),

    // Q-W2: lag/lead day-over-day daily order totals.
    "w2_lag_lead" -> ((s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      val w = Window.orderBy("day")
      daily.select(
          col("day"), col("total"),
          lag("total", 1).over(w).as("prev_total"),
          lead("total", 1).over(w).as("next_total"))
        .orderBy("day")
    }),

    // Q-W3: running sum per customer (rowsBetween unboundedPreceding..0).
    "w3_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Q-W4: 7-day moving average over rangeBetween on a day-number axis
    // (the B6 running-coverage shape, reference region/region.go:28-124).
    "w4_moving_avg" -> ((s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .withColumn("dnum", datediff(col("day"), lit("1995-01-01").cast("date")).cast("long"))
      val w = Window.orderBy("dnum").rangeBetween(-6, 0)
      daily.select(
          col("day"),
          (sum(col("total").cast("decimal(18,2)")).over(w).cast("double")
            / count(lit(1)).over(w)).as("avg_7d"))
        .orderBy("day")
    }),

    // Q-W5: ntile(4) quartiles of customer balance — two-pass global rank
    // (no single-partition window), then ntile's bucket arithmetic applied
    // to the exact global row number: the first (n mod 4) buckets take
    // floor(n/4)+1 rows, the rest floor(n/4).
    "w5_ntile" -> ((s, d) => {
      withGlobalRank(t(s, d, "customer"), 32,
          col("c_acctbal"), col("c_custkey"))
        .withColumn("base", expr("n_total div 4"))
        .withColumn("rem", expr("n_total % 4"))
        .withColumn("cut", expr("rem * (base + 1)"))
        .select(col("c_custkey"),
          expr("""CAST(CASE WHEN grn <= cut THEN (grn + base) div (base + 1)
                 |ELSE rem + (grn - cut + base - 1) div base END AS INT)"""
            .stripMargin).as("quartile"))
        .orderBy("c_custkey")
    }),

    // Q-W8: distribution functions — percent_rank / cume_dist from the
    // two-pass global rank. The sort key (acctbal, custkey) is a total
    // order, so rank == row_number and cume_dist counts exactly grn rows;
    // both are the same integer-ratio doubles DuckDB computes.
    "w8_distribution" -> ((s, d) => {
      withGlobalRank(t(s, d, "customer"), 32,
          col("c_acctbal"), col("c_custkey"))
        .select(col("c_custkey"),
          ((col("grn") - 1).cast("double") /
            (col("n_total") - 1).cast("double")).as("pr"),
          (col("grn").cast("double") / col("n_total").cast("double")).as("cd"))
        .orderBy("c_custkey")
    }),

    // Q-W7: first/last analytic functions over a running frame.
    "w7_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Q-W9: nth_value over a running frame — the "second order ever" per
    // customer (null until it exists).
    "w9_nth_value" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W10: numeric RANGE frame — peers within ±500 of the current row's
    // acctbal (w4's range frame is over dates; this is the value-distance
    // form: ties are peers, frame ends move by VALUE not row count). Money
    // sums ride decimal for cross-engine parity.
    "w10_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-500, 500)
      t(s, d, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_custkey"), col("c_acctbal"),
          count(lit(1)).over(w).as("n_near"),
          sum(col("c_acctbal").cast("decimal(18,2)")).over(w)
            .cast("double").as("near_sum"))
        .orderBy("c_custkey")
    }),

    // W11: gaps-and-islands — merge overlapping [start, end) intervals
    // per supplier into disjoint spans AS ROWS (u2_interval_union reports
    // only the covered total; this materializes the merged intervals —
    // the reference's region-mask coalesce, RegionMask.add's overlap
    // merge, as a relational op). One hash shuffle + per-key window sort:
    // an island starts where start exceeds the running max of prior ends;
    // islands then reduce by plain groupBy. Same synthetic intervals as
    // u2, so QueriesSpec cross-checks sum(island lengths) == u2's covered.
    "w11_interval_islands" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_suppkey").as("g"),
        ((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 1000).as("st"),
        (((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 1000) +
          floor(col("l_quantity")).cast("long") % 50 + 1).as("en"))
      val w = Window.partitionBy("g").orderBy("st", "en")
      val flagged = base
        .withColumn("pmax",
          max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy("g", "island")
        .agg(min("st").as("island_start"), max("en").as("island_end"),
          count(lit(1)).as("n_merged"))
        .orderBy("g", "island")
    }),

    // Q-W6: per-supplier top-3 line items by extended price.
    "w6_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    }),

    // W12: running aggregate WITH RESET — a per-customer running revenue
    // total that restarts whenever the gap since the previous order
    // exceeds 30 days (the sessionized-running-sum primitive: "spend so
    // far this burst"). Three chained per-key windows — lag to flag the
    // break, a running sum of flags to number the sessions (w11's
    // gaps-and-islands trick on event gaps instead of interval overlap),
    // then the running total partitioned by (key, session). Every window
    // is keyed by customer — bounded partitions, no global sort; money
    // rides DECIMAL(18,2) internally, final cast to DOUBLE (output schemas
    // never carry DecimalType — cross-engine hasher parity).
    // W13: RANGE-frame window — trailing-30-day spend per customer. The
    // frame is bounded by the ORDER-BY VALUE (day number), not by row
    // count: all same-day peer rows enter the frame together, so the
    // result is deterministic with no tiebreak column — the semantic
    // difference from w4's ROWS frames, covered nowhere else. Money rides
    // DECIMAL(18,2) in the frame sum, final cast DOUBLE (the registry
    // DecimalType gate). Per-customer windows: bounded partitions, w3
    // scale class.
    "w13_range_frame" -> ((s, d) => {
      val day = datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
      val w = Window.partitionBy("o_custkey").orderBy(day)
        .rangeBetween(-30, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("spend_30d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "w12_session_running_sum" -> ((s, d) => {
      val byTime = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .withColumn("prev_d", lag("o_orderdate", 1).over(byTime))
        .withColumn("brk",
          when(col("prev_d").isNull ||
            col("o_orderdate") > col("prev_d") + expr("INTERVAL 30 DAY"), 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("brk").over(run))
      val sessRun = Window.partitionBy("o_custkey", "sess_id")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"), col("sess_id"),
          sum("price").over(sessRun).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "w1_ranking" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_k,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY floor(o_totalprice / 10000) DESC, o_orderkey) AS INT) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |    ORDER BY floor(o_totalprice / 10000) DESC) AS INT) AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY floor(o_totalprice / 10000) DESC) AS INT) AS drk
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "w2_lag_lead" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1)
        |SELECT day, total,
        |  lag(total, 1) OVER (ORDER BY day) AS prev_total,
        |  lead(total, 1) OVER (ORDER BY day) AS next_total
        |FROM daily ORDER BY day""".stripMargin,

    "w3_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w4_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dnum
        |  FROM orders GROUP BY 1, 3)
        |SELECT day,
        |  CAST(SUM(CAST(total AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS avg_7d
        |FROM daily
        |WINDOW w AS (ORDER BY dnum RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "w5_ntile" ->
      """SELECT c_custkey,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "w8_distribution" ->
      """SELECT c_custkey,
        |  percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pr,
        |  cume_dist() OVER (ORDER BY c_acctbal, c_custkey) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "w7_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w9_nth_value" ->
      """SELECT o_custkey, o_orderkey, nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w10_range_frame" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_custkey, c_acctbal,
        |  CAST(count(*) OVER w AS BIGINT) AS n_near,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER w
        |    AS DECIMAL(38,2)) AS DOUBLE) AS near_sum
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
        |  RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,

    "w11_interval_islands" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS g,
        |    (l_orderkey*7 + l_linenumber*3) % 1000 AS st,
        |    (l_orderkey*7 + l_linenumber*3) % 1000
        |      + CAST(floor(l_quantity) AS BIGINT) % 50 + 1 AS en
        |  FROM lineitem),
        |m AS (
        |  SELECT g, st, en,
        |    max(en) OVER (PARTITION BY g ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT g, st, en,
        |    CAST(sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY g ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM m)
        |SELECT g, island, min(st) AS island_start, max(en) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM f GROUP BY g, island ORDER BY g, island""".stripMargin,

    "w6_topk_per_group" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,

    "w13_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS spend_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w12_session_running_sum" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_d
        |  FROM orders),
        |f AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, price,
        |    CASE WHEN prev_d IS NULL
        |      OR o_orderdate > prev_d + INTERVAL 30 DAY THEN 1 ELSE 0 END
        |      AS brk
        |  FROM o),
        |sess AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, price,
        |    CAST(sum(brk) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sess_id
        |  FROM f)
        |SELECT o_custkey, o_orderkey, sess_id,
        |  CAST(sum(price) OVER (PARTITION BY o_custkey, sess_id
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_total
        |FROM sess ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
