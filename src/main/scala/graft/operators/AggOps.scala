package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables => T}
import graft.Tables.t

/** Aggregation inventory (SURVEY §2.3 "Aggregations"; queries Q-A1..A7).
  *
  * The reference's own query surface is stats aggregation over metadata
  * (`ls` block stats — reference core/datastore.go:445-466,
  * core/freezer.go:249-263 GetBlockStats); here the same shape runs over the
  * star schema.
  *
  * Determinism contract (cross-engine hash-match vs DuckDB): every monetary
  * SUM goes double→round(2)→DECIMAL(18,2)→SUM→DOUBLE so both engines do
  * exact decimal addition (order-independent) and convert the identical
  * value back; AVG is computed as exact-decimal-sum / count. Plain
  * SUM(double) would differ in the last bits between engines because
  * summation order differs.
  *
  * 100 TB notes: groupBy gets map-side partial aggregation for free
  * (hash agg partial+final); rollup/cube/grouping-sets expand the grouping
  * keys before the shuffle, so cost scales with |groups|·|sets|, not rows.
  * approx_count_distinct is the HLL sketch — the only sane distinct-count at
  * 100 TB (exact countDistinct shuffles every distinct value).
  */
object AggOps {

  type Q = (SparkSession, String) => DataFrame

  /** Shared SQL for the grouping-analytics queries — the exact same text is
    * the DuckDB oracle, so any divergence is an engine bug, not a dialect
    * skew. */
  private val a3Sql =
    """SELECT CAST(GROUPING(r_name) AS INT) AS g_r,
      |  CAST(GROUPING(n_name) AS INT) AS g_n,
      |  r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust
      |FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  private val a4Sql =
    """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
      |  o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  private val a5Sql =
    """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
      |  o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  private val a21Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#12' AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val queries: Map[String, Q] = Map(
    // Q-A1: TPC-H Q1-shape — the canonical scan→filter→hash-agg pipeline.
    "a1_tpch_q1" -> ((s, d) => {
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("sum_disc_price"),
          // raw division of identical exact operands — no round() (engines
          // disagree on rounding doubles within 1 ULP of a boundary)
          (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q-A2: exact distinct counts per nation (two distinct aggs in one
    // grouping — Catalyst plans an expand + two-phase distinct agg).
    "a2_count_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
          countDistinct(col("l_suppkey")).as("n_sup"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("s_nationkey")
    }),

    // Q-A3: ROLLUP (region, nation) customer counts.
    "a3_rollup" -> ((s, d) => { T.registerViews(s, d); s.sql(a3Sql) }),

    // Q-A4: CUBE (orderstatus, orderpriority).
    "a4_cube" -> ((s, d) => { T.registerViews(s, d); s.sql(a4Sql) }),

    // Q-A5: GROUPING SETS.
    "a5_grouping_sets" -> ((s, d) => { T.registerViews(s, d); s.sql(a5Sql) }),

    // Q-A6: pivot orderstatus × year counts (fixed value list so the output
    // schema is static — required both for the oracle and at scale, where
    // an unbounded pivot would need a driver-side distinct pass).
    "a6_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("yr"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("yr")
    }),

    // Q-A7: approx_count_distinct (HLL++). No DuckDB oracle — sketch
    // estimates are engine-specific; bounds asserted in QueriesSpec.
    "a7_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .orderBy("l_returnflag")
    }),

    // A8: approx_percentile sketch (quantile digest) next to the exact
    // percentile for the bounds check — the other sketch family every
    // 100 TB engine needs (exact percentiles require a global sort).
    // No oracle: sketch values are engine-specific; QueriesSpec bounds it.
    "a8_approx_percentile" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx"),
          expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(1000)).as("p90_approx"),
          expr("percentile(o_totalprice, 0.9)").as("p90_exact"))
        .orderBy("o_orderstatus")
    }),

    // A9: conditional (FILTER-clause) aggregation — several differently
    // filtered aggregates in ONE pass over the data, no self-joins.
    // Money sums in decimal then cast (the cross-engine parity rule).
    "a9_filtered_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          sum(when(col("o_totalprice") > 100000,
            col("o_totalprice").cast("decimal(18,2)")))
            .cast("double").as("big_total"))
        .orderBy("o_orderpriority")
    }),

    // A14: TPC-H Q3 shape (shipping priority) — the canonical
    // filter→3-way-join→aggregate→top-k composite: market-segment filter
    // prunes customer before the join, revenue rides DECIMAL until the
    // final cast, and the top-10 plans TakeOrderedAndProject. orderkey
    // breaks revenue ties deterministically.
    "a14_tpch_q3" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // A10: UNPIVOT — wide → long reshaping (the inverse of a6's pivot):
    // one conditional-agg pass builds the per-year status columns, then
    // unpivot melts them to (yr, status, cnt) rows. Catalyst plans the
    // melt as an Expand projection — a map-side row multiplier, no extra
    // shuffle beyond the aggregation's own.
    "a10_unpivot" -> ((s, d) => {
      val wide = t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("F"),
          count(when(col("o_orderstatus") === "O", 1)).as("O"),
          count(when(col("o_orderstatus") === "P", 1)).as("P"))
      wide.unpivot(Array(col("yr")),
          Array(col("F"), col("O"), col("P")), "status", "cnt")
        .orderBy("yr", "status")
    }),

    // A11: exact per-group percentiles — percentile() (sort-based exact
    // interpolation) per order priority, hash-matching DuckDB's
    // quantile_cont bit-for-bit (same linear-interpolation arithmetic on
    // the same doubles; probed at p25/p50/p75 before wiring). The exact
    // path complements a8's approx_percentile sketch: exact needs the
    // group's values collected per partition then merged — state is
    // O(distinct values per group), fine for bounded groups; a38 is this
    // lane's fixed-size-sketch twin, the 100 TB default.
    "a11_exact_percentiles" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // A12: ordered string aggregation (LISTAGG/string_agg) — collect_list
    // is order-nondeterministic under parallelism, so the deterministic
    // form sorts the collected array before joining; group state is
    // bounded by the group's members (fine for dimension-sized groups —
    // the l30 TopK-heap pattern is the cap for corpus-sized ones).
    "a12_listagg" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(array_join(array_sort(collect_list(col("c_name"))), ",")
          .as("names"),
          count(lit(1)).as("n"))
        .orderBy("nation")
    }),

    // A13: bitwise aggregates — bit_and/bit_or/bit_xor fold per group
    // (hardware-cheap, partial-agg friendly; the region-mask algebra of
    // the reference's B6 is exactly this fold over bit blocks).
    "a13_bitwise" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(
          bit_and(col("c_custkey")).as("b_and"),
          bit_or(col("c_custkey")).as("b_or"),
          bit_xor(col("c_custkey")).as("b_xor"))
        .orderBy("nation")
    }),

    // A35: exact-arithmetic distribution stats — mean/variance/stddev per
    // group WITHOUT order-dependent double summation (Spark and DuckDB
    // sum doubles in different orders, so stddev_pop() built-ins can't
    // hash-match). The moments accumulate as exact BIGINT sums (quantity
    // is integral; Σq ≤ 50·n, Σq² ≤ 2500·n keep even 10¹² rows inside
    // int64 per group when sharded decimal at larger domains), and the
    // float math is a FIXED tree of identical operands evaluated once at
    // the end — bit-identical across engines. Partial-agg friendly: the
    // sums are commutative monoids, the same trick o12 uses for sketches.
    "a35_group_stats" -> ((s, d) => {
      val q = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      val nD = col("n").cast("double")
      val sqD = col("sq").cast("double")
      val sqqD = col("sqq").cast("double")
      val varExpr = (nD * sqqD - sqD * sqD) / (nD * nD)
      q.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"),
          sum(col("qty") * col("qty")).as("sqq"))
        .select(col("l_returnflag"), col("n"),
          (sqD / nD).as("mean_qty"),
          varExpr.as("var_pop"),
          sqrt(varExpr).as("stddev_pop"))
        .orderBy("l_returnflag")
    }),

    // A36: median absolute deviation per group — the robust-dispersion
    // companion to a35's moment stats (outlier-resistant spread, the
    // quality-cutoff statistic robust pipelines use where stddev is
    // poisoned by heavy tails). Two exact-percentile passes: per-group
    // median, broadcast-joined back (3 groups — broadcast by
    // construction), then the median of absolute deviations. Same
    // hash-parity discipline as a11: percentile interpolation is one
    // fixed op on identical operands; abs/subtract are exact on doubles.
    // Exact-percentile state is O(distinct deviations per group) — a39
    // is the fixed-size-sketch twin for unbounded groups.
    "a36_mad" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(x, 0.5)").as("med"))
      li.join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("med"), abs(col("x") - col("med")).as("dev"))
        .groupBy("l_returnflag")
        .agg(first("med").as("med"),
          expr("percentile(dev, 0.5)").as("mad"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // A37: hot-key aggregation through the SALTED two-phase path — events
    // has ~5 event types over 10k+ rows, the classic hot-key shape where
    // a plain groupBy gives one straggler task per hot key at scale.
    // SkewOps.saltedSum sprays each key across 32 salt buckets (shuffle 1
    // carries (key, salt) — no single task owns a hot key), then combines
    // the 32 partials (shuffle 2 moves one row per (key, salt)). Values
    // ride exact integer cents so the two-phase re-association is
    // hash-identical to the oracle's single-phase sum.
    // A40: correlation / covariance / least-squares regression per group
    // — the bivariate face of a35's exact-moment trick. Built-in
    // corr()/covar_pop()/regr_slope() can't cross-engine hash-match
    // (their double partial sums depend on partition order), so the five
    // moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as exact BIGINTs —
    // x = quantity (≤ 50), y = floor(price) (≤ ~105k) keep every sum
    // under 2^53 at the test SFs, so the cast to double is EXACT in both
    // engines — and each statistic is one fixed tree of identical IEEE
    // ops at the end. At larger scale the sums widen to DECIMAL(38,0)
    // (the a35 discipline); the shape — one partial-agg groupBy, O(1)
    // state per group — is the 100 TB plan either way.
    "a40_exact_corr" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val syD = col("sy").cast("double")
      val sxyD = col("sxy").cast("double")
      val sxxD = col("sxx").cast("double")
      val syyD = col("syy").cast("double")
      val num = nD * sxyD - sxD * syD
      val slope = num / (nD * sxxD - sxD * sxD)
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("l_returnflag"), col("n"),
          (num / (nD * nD)).as("covar_pop"),
          (num / (sqrt(nD * sxxD - sxD * sxD)
            * sqrt(nD * syyD - syD * syD))).as("corr"),
          slope.as("slope"),
          ((syD - slope * sxD) / nD).as("intercept"))
        .orderBy("l_returnflag")
    }),

    "a37_salted_hot_key" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("cents"))
      graft.functions.SkewOps.saltedSum(ev, col("event_type"), col("cents"), 32)
        .select(col("key").as("event_type"), col("total").as("total_cents"))
        .orderBy("event_type")
    }),

    // A38: a11's sketch twin for the UNBOUNDED-group regime — a11's exact
    // percentile() buffers every distinct value of a group on one
    // executor (state O(distinct-per-group): fine while groups are
    // dimension-bounded, a memory ceiling when one group holds 10⁹
    // events). approx_percentile's quantile digest is fixed-size
    // (O(accuracy) per group) regardless of group cardinality — the
    // default above that bound. Exact columns ride along so QueriesSpec
    // can bound the sketch without an engine-specific oracle.
    "a38_approx_percentiles" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.25), lit(10000)).as("p25_approx"),
          expr("percentile(o_totalprice, 0.25)").as("p25_exact"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_approx"),
          expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
          percentile_approx(col("o_totalprice"), lit(0.75), lit(10000)).as("p75_approx"),
          expr("percentile(o_totalprice, 0.75)").as("p75_exact"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // A39: a36's sketch twin — MAD with both percentile passes on the
    // fixed-size digest instead of the exact value buffer. Same
    // broadcast-join shape (group medians are dimension-sized by
    // definition); per-group state drops from O(distinct values) to
    // O(accuracy). Exact MAD rides along for the spec bound.
    "a39_approx_mad" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      val med = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("med_a"),
          expr("percentile(x, 0.5)").as("med_e"))
      li.join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("med_a"), col("med_e"),
          abs(col("x") - col("med_a")).as("dev_a"),
          abs(col("x") - col("med_e")).as("dev_e"))
        .groupBy("l_returnflag")
        .agg(first("med_a").as("med_approx"),
          percentile_approx(col("dev_a"), lit(0.5), lit(10000)).as("mad_approx"),
          expr("percentile(dev_e, 0.5)").as("mad_exact"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // A15: TPC-H Q18 shape (large-volume customers) — the "aggregate,
    // HAVING-filter, then join the survivors back" composite. The inner
    // aggregation shrinks lineitem to one row per order BEFORE any join,
    // so the joins move |orders with qty>150| rows, not |lineitem|; both
    // remaining joins are plain equi joins AQE can broadcast once the
    // HAVING filter has collapsed the cardinality.
    "a15_tpch_q18" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }),

    // A17: TPC-H Q5 shape (local supplier volume) — the 6-way join with a
    // NON-key equi condition (c_nationkey = s_nationkey: customer and
    // supplier must share a nation). Region/nation/supplier broadcast; the
    // only shuffles are the two fact joins and the final tiny groupBy. The
    // composite exercises join-order freedom: the date filter shrinks
    // orders first, so Catalyst can start from the smallest fact slice.
    "a17_tpch_q5" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // A18: TPC-H Q10 shape (returned-item reporting) — returned lineitems
    // in one quarter attributed back to customers, top-20 by lost revenue.
    // The returnflag + date filters prune both facts before the joins; the
    // grouping carries the customer dimension columns through the agg
    // (wide keys, tiny group count).
    "a18_tpch_q10" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      t(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // A19: TPC-H Q17 shape (small-quantity-order revenue) — the correlated
    // "below 20% of this part's average quantity" predicate decorrelated
    // by hand into a per-part aggregate join. The 0.2·avg comparison is
    // rewritten integer-exact (qty·5·cnt < sum) so both engines evaluate
    // the SAME exact decimal predicate — no double division at the
    // boundary. Per-part stats are |part|-sized → broadcast-able.
    "a19_tpch_q17" -> ((s, d) => {
      val perPart = t(s, d, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
          count(lit(1)).cast("decimal(10,0)").as("cq"))
      val brand = t(s, d, "part")
        .filter(col("p_brand") === "Brand#12").select("p_partkey")
      t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .join(broadcast(perPart), col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("decimal(12,2)") * lit(5) * col("cq") < col("sq"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
          .as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // A20: TPC-H Q7 shape (volume shipping) — nation-pair trade flows: the
    // disjunctive pair filter ((A,B) OR (B,A)) evaluates AFTER both nation
    // dims broadcast-join in, revenue per (supp_nation, cust_nation, year).
    // Two independent broadcasts of the same dim under different roles.
    "a20_tpch_q7" -> ((s, d) => {
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("n1k"))
        .join(n2, col("c_nationkey") === col("n2k"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // A21: TPC-H Q16 shape (supplier-part relationship count) — NOT IN
    // with a subquery plans a null-aware anti join; count(DISTINCT) over
    // the surviving pairs. Shared SQL text runs on both engines (the a3
    // pattern), so the decorrelation itself is what's under test.
    "a21_tpch_q16" -> ((s, d) => { T.registerViews(s, d); s.sql(a21Sql) }),

    // A22: TPC-H Q14 shape (promotion effect) — a conditional-aggregate
    // RATIO in one pass: promo revenue over total revenue for one month,
    // part dimension broadcast. Both operands stay exact decimal until a
    // single double division of identical cross-engine values.
    "a22_tpch_q14" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
      li.join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * sum(when(col("p_type") === "PROMO", disc)).cast("double")
            / sum(disc).cast("double")).as("promo_revenue_pct"),
          count(lit(1)).as("n"))
    }),

    // A16: TPC-H Q13 shape (customer distribution) — aggregation OVER an
    // aggregation: orders-per-customer, then customers-per-order-count.
    // The second groupBy's input is already |customers| rows, and its own
    // output is tiny (distinct counts), so the expensive join happens
    // exactly once and everything after shrinks monotonically.
    "a16_tpch_q13" -> ((s, d) => {
      val perCust = t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // ---- round-5: the remaining TPC-H query shapes (the schema here is
    // reduced — no partsupp, no commit/receipt dates, no phone/container
    // — so each query keeps its PLAN SHAPE on the columns that exist,
    // the same adaptation a21/Q16 already made). With these, all 22
    // TPC-H query classes run oracle-verified. ----

    // A23: TPC-H Q6 (forecast revenue change) — the pure scan kernel: one
    // pushed-down conjunctive filter, no join, one global agg. At 100 TB
    // this is bounded by scan bandwidth; the predicate reaches the
    // parquet reader (PushedFilters) and only 4 columns are read.
    "a23_tpch_q6" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(4,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // A24: TPC-H Q4 (order priority checking) — EXISTS as a LEFT SEMI
    // join with a non-equi conjunct. The schema has no commit/receipt
    // dates, so "late" = shipped >90 days after the order date; the
    // plan under test is the same semi join + priority rollup.
    "a24_tpch_q4" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      ord.join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // A25: TPC-H Q15 (top supplier) — the revenue view consumed twice:
    // once per supplier, once reduced to its global max, rejoined on
    // EXACT decimal equality (sum of DECIMAL(18,2) is order-independent
    // in both engines, so `= max` is safe cross-engine where a double
    // sum would not be). The max is one row — broadcast.
    "a25_tpch_q15" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      t(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(mx), col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // A26: TPC-H Q19 (discounted revenue) — the disjunction-of-
    // conjunctions predicate: three (brand, size-range, qty-range) arms
    // OR'd together after a broadcast part join. Catalyst extracts the
    // common l_partkey equi key; the residual OR stays a single codegen'd
    // filter — no union-of-three-scans rewrite needed.
    "a26_tpch_q19" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // A27: TPC-H Q12 (shipping modes & priority) — the two-conditional-
    // count rollup over a fact join with a non-equi lateness predicate
    // (no ship modes in this schema: l_linestatus plays the class
    // column, >60-days-after-order plays receipt-late).
    "a27_tpch_q12" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .select("l_orderkey", "l_shipdate", "l_linestatus"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // A28: TPC-H Q8 (national market share) — a ratio of two conditional
    // decimal aggregates per order-year: NATION_1-supplied revenue over
    // all revenue, within EUROPE customers buying STANDARD parts. Both
    // operands stay exact decimal; ONE double division at the end. Two
    // nation roles = the dim broadcast twice (a20's pattern).
    "a28_tpch_q8" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
      val custNations = broadcast(t(s, d, "nation")
        .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk")))
      val suppNations = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(suppNations, col("s_nationkey") === col("snk"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(custNations, col("c_nationkey") === col("cnk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(when(col("supp_nation") === "NATION_1", disc)
            .otherwise(lit(0).cast("decimal(18,2)"))).as("nation_rev"),
          sum(disc).as("total_rev"))
        .select(col("yr"),
          (col("nation_rev").cast("double") / col("total_rev").cast("double"))
            .as("mkt_share"))
        .orderBy("yr")
    }),

    // A29: TPC-H Q9 (product type profit) — the widest join pipeline in
    // the suite: name-filtered parts, supplier nation, and order year
    // attributed to per-lineitem profit. No supplycost column, so cost =
    // retailprice × quantity (exact decimal product); the subtraction
    // stays decimal until the final cast. Dims broadcast; the only
    // shuffles are the orders join and the final tiny groupBy.
    "a29_tpch_q9" -> ((s, d) => {
      val amount = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")) -
        col("p_retailprice").cast("decimal(18,2)") * col("l_quantity").cast("decimal(12,2)")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy("nation", "yr")
    }),

    // A30: TPC-H Q2 (minimum-cost supplier) — the correlated-min
    // decorrelated: the region-restricted (part, supplier, min-price)
    // catalog is built once from lineitem (no partsupp table), reduced
    // to a per-part min, and rejoined on EXACT decimal equality — the
    // classic "min per group join-back" plan. Dims broadcast; the
    // catalog aggregation is the only fact shuffle.
    "a30_tpch_q2" -> ((s, d) => {
      val eurSup = broadcast(t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
      val ps = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(eurSup.select(col("s_suppkey").as("esk")),
          col("l_suppkey") === col("esk"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("cost"))
      val minp = ps.groupBy(col("pk").as("mpk"))
        .agg(min(col("cost")).as("mincost"))
      ps.join(broadcast(t(s, d, "part").filter(col("p_size") === 15)
          .select("p_partkey")), col("pk") === col("p_partkey"))
        .join(minp, col("pk") === col("mpk") && col("cost") === col("mincost"))
        .join(eurSup, col("sk") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost").cast("double").as("min_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // A31: TPC-H Q11 (important stock) — HAVING against a global-total
    // scalar subquery. The threshold compare is kept EXACT: value×500 >
    // total in decimal (no double fraction at the boundary). The total
    // is one row — broadcast cross join, not a recompute per group.
    "a31_tpch_q11" -> ((s, d) => {
      val nat3 = broadcast(t(s, d, "supplier")
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("nsk")))
      val vals = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(nat3, col("l_suppkey") === col("nsk"))
        .groupBy(col("l_partkey").as("p"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
      val tot = vals.agg(sum(col("v")).as("tot"))
      vals.crossJoin(broadcast(tot))
        .filter(col("v") * lit(500) > col("tot"))
        .select(col("p"), col("v").cast("double").as("val"))
        .orderBy(desc("val"), col("p"))
    }),

    // A32: TPC-H Q20 (potential part promotion) — the nested-IN chain as
    // two semi reductions: (supplier, part) pairs that shipped >50 units
    // of a name-prefixed part in the year, distinct'd to suppliers, then
    // a semi join filters the nation-restricted supplier list. Quantity
    // sums ride decimal so the >50 boundary is exact cross-engine.
    "a32_tpch_q20" -> ((s, d) => {
      val red = broadcast(t(s, d, "part")
        .filter(col("p_name").like("red%")).select("p_partkey"))
      val bigShippers = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(red, col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sq"))
        .filter(col("sq") > 50)
        .select("l_suppkey")
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          // a nation GROUP (5 of 25) rather than Q20's single nation:
          // same nation-restricted semi-join shape, but the tiny sf0.001
          // fixture (10 suppliers) keeps a survivor at every SF
          .filter(col("n_nationkey") % 5 === 1)),
          col("s_nationkey") === col("n_nationkey"))
        .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }),

    // A33: TPC-H Q21 (suppliers who kept orders waiting) — the EXISTS +
    // NOT EXISTS double correlation: this supplier late on a finished
    // multi-supplier order AND nobody else late. Planned as one semi
    // join (another supplier exists) then one anti join (no other late
    // supplier); the lateness bound rides the carried o_orderdate, so
    // the anti probe needs no second orders join.
    "a33_tpch_q21" -> ((s, d) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
      val l1 = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
        .join(broadcast(t(s, d, "supplier")
          // nation group, not Q21's single nation — see a32
          .join(t(s, d, "nation").filter(col("n_nationkey") % 5 === 1),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
      val other = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val otherLate = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"),
          col("l_shipdate").as("sd3"))
      l1.join(other, col("l_orderkey") === col("ok2") &&
          col("l_suppkey") =!= col("sk2"), "left_semi")
        .join(otherLate, col("l_orderkey") === col("ok3") &&
          col("l_suppkey") =!= col("sk3") &&
          col("sd3") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    }),

    // A34: TPC-H Q22 (global sales opportunity) — above-average-balance
    // dormant customers per code digit. No phone column: the code is the
    // last digit of c_name; no never-ordered customers in this data: the
    // anti join is against RECENT orders. The avg threshold is exact:
    // balance × count > sum in decimal, no double mean at the boundary.
    "a34_tpch_q22" -> ((s, d) => {
      val code = substring(col("c_name"), 18, 1)
      val cands = t(s, d, "customer").filter(code.isin("1", "3", "5", "7"))
      val pos = cands.filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("c"),
          sum(col("c_acctbal").cast("decimal(18,2)")).as("sTot"))
      cands.crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("c") > col("sTot"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp_ntz"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(code.as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
        .orderBy("cntrycode")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a9_filtered_agg" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a14_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "a15_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "a16_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) pc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "a10_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f,
        |    CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o,
        |    CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p
        |  FROM orders GROUP BY 1)
        |SELECT yr, 'F' AS status, f AS cnt FROM wide
        |UNION ALL SELECT yr, 'O', o FROM wide
        |UNION ALL SELECT yr, 'P', p FROM wide
        |ORDER BY yr, status""".stripMargin,

    "a40_exact_corr" ->
      """WITH q AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) AS DOUBLE) AS n_d,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x*y) AS DOUBLE) AS sxy,
        |    CAST(sum(x*x) AS DOUBLE) AS sxx,
        |    CAST(sum(y*y) AS DOUBLE) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n_d * sxy - sx * sy) / (n_d * n_d) AS covar_pop,
        |  (n_d * sxy - sx * sy)
        |    / (sqrt(n_d * sxx - sx * sx) * sqrt(n_d * syy - sy * sy)) AS corr,
        |  (n_d * sxy - sx * sy) / (n_d * sxx - sx * sx) AS slope,
        |  (sy - ((n_d * sxy - sx * sy) / (n_d * sxx - sx * sx)) * sx) / n_d
        |    AS intercept
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "a35_group_stats" ->
      """WITH q AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qty) AS BIGINT) AS sq,
        |    CAST(sum(qty*qty) AS BIGINT) AS sqq
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
        |  (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
        |    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_pop,
        |  sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
        |    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS stddev_pop
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "a37_salted_hot_key" ->
      """SELECT event_type,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "a36_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, any_value(m.med) AS med,
        |  quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "a11_exact_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "a12_listagg" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY nation""".stripMargin,

    "a13_bitwise" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  CAST(bit_and(c_custkey) AS BIGINT) AS b_and,
        |  CAST(bit_or(c_custkey) AS BIGINT) AS b_or,
        |  CAST(bit_xor(c_custkey) AS BIGINT) AS b_xor
        |FROM customer GROUP BY 1 ORDER BY nation""".stripMargin,

    "a1_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |       AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_count_distinct" ->
      """SELECT s_nationkey,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_sup,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "a3_rollup" -> a3Sql,
    "a4_cube" -> a4Sql,
    "a5_grouping_sets" -> a5Sql,
    "a21_tpch_q16" -> a21Sql,

    "a22_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS promo_revenue_pct,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "a17_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "a18_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "a19_tpch_q17" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS pk,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |        CAST(count(*) AS DECIMAL(10,0)) AS cq
        |      FROM lineitem GROUP BY l_partkey) pp ON l_partkey = pk
        |WHERE p_brand = 'Brand#12'
        |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cq < sq""".stripMargin,

    "a20_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,

    "a6_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    // a7_approx_distinct: intentionally no oracle (sketch ≠ exact).

    "a23_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "a24_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a25_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "a26_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "a27_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "a28_tpch_q8" ->
      """SELECT yr,
        |  CAST(CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
        |    AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    SUM(CASE WHEN n2.n_name = 'NATION_1'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |      AS total_rev
        |  FROM lineitem
        |    JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1) t ORDER BY yr""".stripMargin,

    "a29_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |  JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY nation, yr""".stripMargin,

    "a30_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey,
        |  CAST(cost AS DOUBLE) AS min_cost
        |FROM ps
        |  JOIN part ON p_partkey = pk AND p_size = 15
        |  JOIN supplier ON s_suppkey = sk
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost = (SELECT min(cost) FROM ps p2 WHERE p2.pk = ps.pk)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "a31_tpch_q11" ->
      """SELECT l_partkey AS p,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS val
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY 1
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 500 >
        |  (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |   FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |     JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |ORDER BY val DESC, p""".stripMargin,

    "a32_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey % 5 = 1
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
        |ORDER BY s_name""".stripMargin,

    "a33_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON s_suppkey = l1.l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_nationkey % 5 = 1
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "a34_tpch_q22" ->
      """WITH pos AS (
        |  SELECT CAST(count(*) AS BIGINT) AS c,
        |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
        |  FROM customer
        |  WHERE c_acctbal > 0 AND substring(c_name, 18, 1) IN ('1','3','5','7'))
        |SELECT substring(c_name, 18, 1) AS cntrycode,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE substring(c_name, 18, 1) IN ('1','3','5','7')
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) * c > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
