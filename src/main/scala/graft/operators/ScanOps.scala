package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scan / projection / filter / sort / set-op / scalar-function inventory
  * (SURVEY §2.3 "Projection / filter / scalar", "Sorts / limits", "Set ops",
  * "Scalar function families"; queries Q-S1..S3, Q-O1..O3, Q-F1..F7).
  *
  * Design notes for 100 TB: every query here is a narrow scan→filter→project
  * pipeline (no shuffle except the declared sorts/aggregations); filters and
  * column selections are plain Catalyst expressions so parquet predicate
  * pushdown + column pruning apply (verify via .explain: PushedFilters /
  * ReadSchema).
  */
object ScanOps {

  type Q = (SparkSession, String) => DataFrame

  /** Shared fixture for the diff/maintenance lanes (o8/o10): two versions
    * of the orders table derived deterministically — key%7 drops in v1,
    * key%5 drops + key%3 DECIMAL reprice in v2 (the mirrored oracle SQL
    * encodes the same expressions; keep them in lockstep). */
  private def modVersions(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = t(s, d, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val v1 = o.filter(col("key") % 7 =!= 0)
      .select(col("key"), col("price").as("p1"))
    val v2 = o.filter(col("key") % 5 =!= 0)
      .select(col("key"),
        (col("price") + when(col("key") % 3 === 0, 10).otherwise(0)
          .cast("decimal(18,2)")).as("p2"))
    (v1, v2)
  }

  /** Row-level diff of two keyed versions v1(key, p1) / v2(key, p2):
    * one full-outer hash join -> (key, status, p1, p2) for every row
    * that is added, removed, or changed. */
  private def rowDiff(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.withColumn("w1", lit(true))
      .join(v2.withColumn("w2", lit(true)), Seq("key"), "full_outer")
      .withColumn("status",
        when(col("w1").isNull, "added")
          .when(col("w2").isNull, "removed")
          .when(col("p1") =!= col("p2"), "changed")
          .otherwise("same"))
      .filter(col("status") =!= "same")
      .select("key", "status", "p1", "p2")

  private val o5Sql =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |                               AS DOUBLE) / count(*)
      |                   FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // identical text runs on Spark and DuckDB (both support LATERAL)
  private val o6Sql =
    """SELECT n.n_name, t.s_name, t.s_acctbal
      |FROM nation n, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      |ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""".stripMargin

  // identical text runs on Spark 4 and DuckDB (both support WITH
  // RECURSIVE): walk the implicit binary tree over c_custkey (children of
  // k are 2k and 2k+1) from the root — a transitive-closure/hierarchy
  // traversal, ~log2(n) self-join rounds, each a plain equi-join the
  // engine distributes like any other (the same iterate-until-fixpoint
  // shape as l21's label propagation, here driven by the SQL surface).
  private val o9Sql =
    """WITH RECURSIVE tree(ck, depth) AS (
      |  SELECT CAST(1 AS BIGINT), 0
      |  UNION ALL
      |  SELECT c.c_custkey, t.depth + 1
      |  FROM customer c JOIN tree t ON c.c_custkey IN (t.ck * 2, t.ck * 2 + 1))
      |SELECT depth, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(ck) AS BIGINT) AS min_key, CAST(max(ck) AS BIGINT) AS max_key
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  val queries: Map[String, Q] = Map(
    // Q-S1: project + filter; pushes l_quantity > 30 into the parquet scan.
    "s1_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-S2: IN / BETWEEN / LIKE / RLIKE predicate suite.
    "s2_predicates" -> ((s, d) => {
      t(s, d, "part")
        .filter(
          (col("p_name").like("%ring%") || col("p_name").rlike("^(red|blue)")) &&
          col("p_size").isin(1, 5, 11, 28, 42) &&
          col("p_retailprice").between(900, 1050))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")
    }),

    // Q-S3: CASE WHEN buckets + nullif/coalesce null handling.
    "s3_case_null" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_bucket"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"))
        .orderBy("c_custkey")
    }),

    // Q-O1: multi-key order + limit (top-k by price; deterministic tiebreak).
    "o1_sort_limit" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("price"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // Q-O2: union / except / intersect (all set-distinct semantics).
    "o2_set_ops" -> ((s, d) => {
      val c = t(s, d, "customer").select("c_custkey")
      val a = c.filter(col("c_custkey") < 800)
      val b = c.filter(col("c_custkey").between(500, 1200))
      val x = c.filter(col("c_custkey") % 10 === 0)
      val y = c.filter(col("c_custkey") < 1000)
      a.union(b).distinct().except(x).intersect(y).orderBy("c_custkey")
    }),

    // Q-O3: distinct over a projection.
    "o3_distinct" -> ((s, d) => {
      t(s, d, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // Q-F1: string function suite (regexp_extract, concat, substring, upper,
    // length, instr, printf-style formatting).
    "f1_strings" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          substring(col("p_name"), 1, 4).as("name4"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).cast("long").as("name_len"),
          instr(col("p_name"), "e").cast("long").as("e_pos"),
          format_string("%s#%03d", col("p_brand"), col("p_size")).as("brand_size"))
        .orderBy("p_partkey")
    }),

    // Q-F2: date/time suite (date_trunc, year, epoch, datediff, dow).
    "f2_dates" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
          year(col("o_orderdate")).cast("long").as("yr"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy("o_orderkey")
    }),

    // Q-F3: math suite (round, floor/ceil, exp∘ln, pmod, greatest/least).
    "f3_math" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // decimal arithmetic, not round-on-double: Spark rounds the
          // shortest decimal repr while DuckDB scales by 10^s — they disagree
          // within 1 ULP of a half-cent. Exact decimal ops agree always.
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(4,2)")))
            .cast("double").as("gross"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_quantity")).as("qty_ceil"),
          round(exp(log(col("l_quantity") + 1)), 2).as("exp_ln"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q-F4: sha2 + base64 — the CAS BlockID rendering pair
    // (reference: core/freezer.go:386-404 sha256; pufs/cmd/ls.go:44-46 base64).
    "f4_hash" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          sha2(col("c_name"), 256).as("name_sha"),
          base64(encode(col("c_name"), "UTF-8")).as("name_b64"))
        .orderBy("c_custkey")
    }),

    // Q-F5: array suite — split → explode → aggregate token counts.
    "f5_array_explode" -> ((s, d) => {
      t(s, d, "part")
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy("token")
    }),

    // Q-F6: JSON access over events.props.
    "f6_json" -> ((s, d) => {
      t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy("event_id")
    }),

    // Q-O5: scalar subquery in a filter (same SQL text runs in both
    // engines; the threshold uses exact decimal arithmetic so the
    // boundary row set is identical).
    "o5_scalar_subquery" -> ((s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql(o5Sql)
    }),

    // O6: correlated LATERAL subquery — top-2 suppliers per nation via a
    // per-row dependent subquery in FROM (the modern SQL form of w6's
    // per-group top-k; Catalyst decorrelates it into a ranked join).
    "o6_lateral" -> ((s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql(o6Sql)
    }),

    // O9: recursive CTE — hierarchy/transitive-closure traversal.
    "o9_recursive_cte" -> ((s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql(o9Sql)
    }),

    // Q-O4: multiset set ops — intersectAll / exceptAll keep duplicate
    // cardinalities (bag semantics), checked via per-key counts.
    "o4_multiset_ops" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val x = li.filter(col("l_quantity") > 25).select("l_suppkey")
      val y = li.filter(col("l_extendedprice") > 30000).select("l_suppkey")
      val z = li.filter(col("l_quantity") > 49).select("l_suppkey")
      x.intersectAll(y).exceptAll(z)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    }),

    // O7: MERGE/upsert — the engine's UPSERT surface, planned as ONE
    // full-outer hash join (matched → update, target-only → keep,
    // source-only → insert). Target = a customer subset, source = per-
    // customer 1996 order totals. At 100 TB both sides shuffle once on the
    // merge key and stream through the join — no row-at-a-time lookups;
    // money stays DECIMAL until the final cast (cross-engine parity).
    "o7_merge_upsert" -> ((s, d) => {
      val tgt = t(s, d, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("key"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        .withColumn("in_tgt", lit(true))
      val src = t(s, d, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("o_custkey").as("key"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("delta"))
        .withColumn("in_src", lit(true))
      tgt.join(src, Seq("key"), "full_outer")
        .select(col("key"),
          when(col("in_tgt") && col("in_src"), "update")
            .when(col("in_tgt"), "keep")
            .otherwise("insert").as("action"),
          (coalesce(col("bal"), lit(0).cast("decimal(18,2)"))
            + coalesce(col("delta"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("new_bal"))
        .orderBy("key")
    }),

    // O8: table-version diff — snapshot-to-snapshot change capture at row
    // granularity (the relational face of SnapshotStore.diff's file-level
    // audit): full-outer join two versions on the key, classify
    // added/removed/changed, drop identical rows. v1/v2 are derived
    // deterministically from orders (key mod filters simulate deletes and
    // inserts; a DECIMAL price bump on key%3 simulates updates).
    "o8_table_diff" -> ((s, d) => {
      val (v1, v2) = modVersions(s, d)
      rowDiff(v1, v2)
        .select(col("key"), col("status"),
          col("p1").cast("double").as("old_price"),
          col("p2").cast("double").as("new_price"))
        .orderBy("key")
    }),

    // O10: incremental aggregate maintenance — the version-2 aggregate
    // computed WITHOUT touching version-2's unchanged rows: aggregate v1
    // once (the standing base), derive per-row deltas from the o8-style
    // row diff, merge (operators/IncrementalAgg.scala). The oracle
    // aggregates v2 directly, so a hash match proves the O(changed)
    // maintenance path is exactly equivalent to the O(table) recompute.
    "o10_incremental_agg" -> ((s, d) => {
      val (v1, v2) = modVersions(s, d)
      val base = v1.groupBy((col("key") % 25).as("grp"))
        .agg(count(lit(1)).as("cnt"), sum("p1").as("total"))
      val changes = rowDiff(v1, v2)
        .select((col("key") % 25).as("grp"), col("status"),
          col("p1").as("oldVal"), col("p2").as("newVal"))
      IncrementalAgg.applyDeltas(base, IncrementalAgg.deltasFromDiff(changes))
        .select(col("grp").cast("long").as("grp"), col("cnt"),
          col("total").cast("double").as("total"))
        .orderBy("grp")
    }),

    // O11: min/max maintenance by touched-group rescan. min/max do NOT
    // maintain under removals from deltas alone (removing the group's
    // minimum says nothing about the new minimum), so the O(changed)
    // path is: find the groups the diff touched, re-aggregate version 2
    // for THOSE groups only, pass every untouched group's base row
    // through. Here the mutation is localized (keys 500-599 deleted,
    // 2000-2999 repriced) so 5 of 60 groups rescan; with the table
    // clustered by grp the semi-join prunes the rescan at file level
    // (LayoutOps.clusterBy + the DPP shape LayoutSpec pins). Oracle
    // aggregates version 2 directly — a hash match proves equivalence.
    "o11_incremental_minmax" -> ((s, d) => {
      val grpOf = (k: org.apache.spark.sql.Column) =>
        floor(k / 250).cast("long")
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("key"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      val v1 = o.select(col("key"), col("price").as("p1"))
      val v2 = o.filter(!col("key").between(500, 599))
        .select(col("key"),
          (col("price") + when(col("key").between(2000, 2999), 10)
            .otherwise(0).cast("decimal(18,2)")).as("p2"))
      val base = v1.groupBy(grpOf(col("key")).as("grp"))
        .agg(min("p1").as("mn"), max("p1").as("mx"))
      val touched = rowDiff(v1, v2)
        .select(grpOf(col("key")).as("grp")).distinct()
      val rescanned = v2
        .join(broadcast(touched), grpOf(col("key")) === col("grp"), "left_semi")
        .groupBy(grpOf(col("key")).as("grp"))
        .agg(min("p2").as("mn"), max("p2").as("mx"))
      IncrementalAgg.maintainByRescan(base, touched, rescanned)
        .select(col("grp"), col("mn").cast("double").as("mn"),
          col("mx").cast("double").as("mx"))
        .orderBy("grp")
    }),

    // O13: SCD Type-2 history build — turn two snapshot versions into
    // validity-interval rows (the dimension-table face of o8's row diff):
    // unchanged/changed/removed rows carry [v1-time, …) intervals, new
    // values open at v2-time, removed/superseded ones close at v2-time.
    // One full-outer hash join + an Expand-style union of the interval
    // projections — no window, no per-key state; the same shape maintains
    // under every snapshot advance.
    "o13_scd2" -> ((s, d) => {
      val (v1, v2) = modVersions(s, d)
      val t1 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
      val t2 = lit("2024-02-01 00:00:00").cast("timestamp_ntz")
      val diff = rowDiff(v1, v2).persist()
      diff.count() // materialize before the three projection branches
      val unchanged = v1.join(diff.select(col("key").as("k2")),
          col("key") === col("k2"), "left_anti")
        .select(col("key"), col("p1").as("price"),
          t1.as("valid_from"), lit(null).cast("timestamp_ntz").as("valid_to"))
      val closedOld = diff.filter(col("status").isin("changed", "removed"))
        .select(col("key"), col("p1").as("price"),
          t1.as("valid_from"), t2.as("valid_to"))
      val openedNew = diff.filter(col("status").isin("changed", "added"))
        .select(col("key"), col("p2").as("price"),
          t2.as("valid_from"), lit(null).cast("timestamp_ntz").as("valid_to"))
      unchanged.unionByName(closedOld).unionByName(openedNew)
        .select(col("key"), col("price").cast("double").as("price"),
          col("valid_from"), col("valid_to"))
        .orderBy("key", "valid_from")
    }),

    // O12: approx-distinct maintenance by HLL sketch union — the standing
    // per-group sketch absorbs an appended batch in O(changed groups)
    // without re-reading the base (IncrementalAgg.maintainSketch). No
    // oracle (sketches are engine-specific); QueriesSpec pins the
    // maintenance guarantee: the incrementally-merged sketch estimates
    // EXACTLY what a full re-sketch of version 2 estimates, and both land
    // within 5% of the exact distinct count.
    "o12_incremental_hll" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderpriority").as("grp"), col("o_custkey").as("v"),
          col("o_orderkey").as("key"))
      val v1 = o.filter(col("key") % 7 =!= 0)
      val added = o.filter(col("key") % 7 === 0)
      val base = v1.groupBy("grp").agg(hll_sketch_agg(col("v")).as("sk"))
      IncrementalAgg.maintainSketch(base, added)
        .select(col("grp"),
          hll_sketch_estimate(col("sk")).as("approx_distinct"))
        .orderBy("grp")
    }),

    // O15: quantile maintenance by exact-binned histogram sketch — the
    // percentile counterpart of o12's HLL distinct-count maintenance.
    // The standing state is a per-(group, bin) exact count table
    // (IncrementalAgg.binHistogram): counts form a commutative group, so
    // an append adds +1 deltas and a removal adds -1 deltas and BOTH
    // maintain exactly — where HLL sketches can only union. Per-group
    // state is bounded by value-range/width, never by row count, and the
    // quantile selection is all-integer (cum·100 ≥ p·N), so the
    // incrementally-maintained estimate is bit-identical to a full
    // re-sketch of version 2 — which is exactly what the DuckDB oracle
    // computes: a hash match proves the O(changed bins) maintenance path
    // ≡ the O(table) recompute.
    "o15_incremental_quantile" -> ((s, d) => {
      val width = 10.0
      val e = t(s, d, "events")
        .select(col("event_type").as("grp"), col("value").as("v"),
          col("event_id").as("key"))
      val v1 = e.filter(col("key") % 5 =!= 0)
      val added = e.filter(col("key") % 5 === 0)
      val removed = e.filter(col("key") % 5 =!= 0 && col("key") % 17 === 0)
      val base = IncrementalAgg.binHistogram(
        v1.select(col("grp"), col("v")), width)
      // deltas go through binHistogram too: the maintenance is exact only
      // because added/removed rows bin EXACTLY like base rows, so the bin
      // expression must have a single authoritative definition
      val deltas = IncrementalAgg
        .binHistogram(added.select(col("grp"), col("v")), width)
        .select(col("grp"), col("bin"), col("cnt").as("dCnt"))
        .unionByName(IncrementalAgg
          .binHistogram(removed.select(col("grp"), col("v")), width)
          .select(col("grp"), col("bin"), (-col("cnt")).as("dCnt")))
        .groupBy("grp", "bin").agg(sum("dCnt").as("dCnt"))
      val hist = IncrementalAgg.maintainHistogram(base, deltas)
      IncrementalAgg.histogramQuantiles(hist, width, Seq(50, 90, 99))
        .orderBy("grp")
    }),

    // O16: top-k maintenance — the ranking counterpart of o12/o15: the
    // standing per-group top-5 table absorbs an appended batch by
    // re-ranking state ∪ batch (IncrementalAgg.maintainTopK: top-k is a
    // bounded mergeable structure, topK(topK(A) ∪ B) = topK(A ∪ B)), in
    // O(groups·k + batch) — the base is never re-read. Order is
    // (price DESC, key ASC): the key tiebreak totalizes the rank, so the
    // maintained table is hash-identical to the DuckDB oracle ranking
    // version 2 directly — the hash match proves maintenance ≡ recompute.
    // Price stays DECIMAL through the ordering (exact ties both engines)
    // and casts to double only in the output projection.
    "o16_incremental_topk" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          col("o_orderkey").as("key"), col("o_totalprice").as("v"))
      val v1 = o.filter(col("key") % 5 =!= 0)
      val added = o.filter(col("key") % 5 === 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(col("v").desc, col("key"))
      val base = v1.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5).drop("rnk")
      IncrementalAgg.maintainTopK(base, added, 5)
        .select(col("grp"), col("rnk"), col("key"),
          col("v").cast("double").as("price"))
        .orderBy("grp", "rnk")
    }),

    // Q-F8: JSON → map: from_json into map<string,bigint>, exploded to
    // key/value rows. (The events generator emits single-key objects
    // {"k": n}; the oracle leans on that.)
    "f8_map_json" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          explode(from_json(col("props"), "map<string,bigint>", Map.empty[String, String])))
        .select(col("event_id"), col("key"), col("value"))
        .orderBy("event_id")
    }),

    // Q-F9: calendar arithmetic — add_months (end-of-month clamped the
    // same way in both engines), last_day, quarter, date_add.
    // Q-F10: string-distance functions — levenshtein edit distance between
    // catalog strings (the fuzzy-matching primitive of entity resolution).
    "f10_text_distance" -> ((s, d) => {
      t(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).cast("long")
            .as("lev_brand_type"),
          levenshtein(col("p_name"), col("p_type")).cast("long")
            .as("lev_name_type"))
        .orderBy("p_partkey")
    }),

    // F13: fixed-width histogram — the bucket expression is a pure
    // projection (floor of a double division), so the whole histogram is
    // one partial-aggregated groupBy; bucket edges are exact in both
    // engines (same IEEE division and floor).
    "f13_histogram" -> ((s, d) => {
      val bucket = least(floor(col("o_totalprice") / 30000.0), lit(19)).cast("long")
      t(s, d, "orders")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        .orderBy("bucket")
    }),

    "f9_dates_calendar" -> ((s, d) => {
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30d"))
        .orderBy("o_orderkey")
    }),

    // F14: error-tolerant casts under ANSI SQL — Spark 4 runs ANSI mode by
    // default, where a bad cast is a runtime ERROR that kills the job at
    // row one of 100 TB; try_cast/try_divide degrade to NULL instead (the
    // dirty-data ingestion contract). DuckDB mirrors with TRY_CAST and a
    // NULLIF guard.
    "f14_try_cast" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          expr("try_cast(substring(c_name, 10) AS BIGINT)").as("parsed_id"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("bad_cast"),
          expr("try_divide(c_acctbal, c_custkey % 5)").as("risky_div"))
        .orderBy("c_custkey")
    }),

    // Q-F7: higher-order functions — norm² of embedding via aggregate()
    // over the float array (cast to double elementwise; sequential fold gives
    // deterministic summation order, mirrored by DuckDB list_sum).
    "f7_higher_order" -> ((s, d) => {
      val sq = aggregate(
        transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      t(s, d, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), round(sq, 2).as("norm2"))
        .orderBy("vec_id")
    }),

    // O14: referential-integrity audit — the data-quality gate a pipeline
    // runs before trusting a day's ingest: orphaned facts (lineitems whose
    // order is gone — simulated by dropping o_orderkey % 97 = 0),
    // childless dimensions (customers with no orders, parts never
    // ordered). Three anti-join counts unioned into one report frame.
    // Scale shape: each check is one shuffled anti join (semi-join
    // pushdown + bloom-filter join under AQE) producing one row — no
    // windows, no collect; checks are independent so the union's branches
    // run as parallel stages.
    "o14_fk_audit" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val orders = t(s, d, "orders")
      val alive = orders.filter(col("o_orderkey") % 97 =!= 0)
      val orphan = li.join(alive.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orphan_lineitems").as("chk"), col("violations"))
      val noOrders = t(s, d, "customer")
        .join(orders.select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("customers_no_orders").as("chk"), col("violations"))
      val neverOrdered = t(s, d, "part")
        .join(li.select("l_partkey"),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("parts_never_ordered").as("chk"), col("violations"))
      orphan.unionByName(noOrders).unionByName(neverOrdered).orderBy("chk")
    }),

    // O17: Z-order (Morton) layout key — the OPTIMIZE ZORDER BY analog,
    // served by the codegen'd `zorder2` Catalyst expression that
    // LayoutOps.clusterByZOrder sorts by: interleaving two cluster
    // columns' bits co-locates rows that are close in BOTH dimensions,
    // so per-file zone maps prune multi-column box predicates (a linear
    // sort bounds only its leading column — every file spans the full
    // range of the second; LayoutSpec measures the 2-D pruning win).
    // The oracle replays the interleave as unrolled DIV/%/× integer
    // arithmetic — exact in BIGINT, the dot_f32 discipline applied to
    // a bit kernel.
    "o17_zorder_key" -> ((s, d) => {
      graft.functions.ZOrder.register(s)
      t(s, d, "lineitem").filter(col("l_orderkey") < 150)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          expr("zorder2(l_partkey % 65536, l_suppkey % 65536)").as("zval"))
        .orderBy("zval", "l_orderkey", "l_linenumber")
    }),

    // O18: 3-D z-order key — the N-dimensional generalization (VERDICT
    // r15 #6) served by the codegen'd `zorder3` 21-bit mask-shift
    // kernel (ZOrder.scala): bit i of key j lands at position 3i + j,
    // so every z-range bounds a BOX in all three key dimensions and
    // OPTIMIZE ZORDER BY (a, b, c) pruning works on any of them
    // (LayoutSpec measures the 3-D win). Oracle: the o17 discipline —
    // the interleave replayed as unrolled DIV/%/× BIGINT arithmetic,
    // exact on the sub-2^16 key domain.
    "o18_zorder3_key" -> ((s, d) => {
      graft.functions.ZOrder.register(s)
      t(s, d, "lineitem").filter(col("l_orderkey") < 150)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          expr("zorder3(l_partkey % 65536, l_suppkey % 65536, " +
            "l_orderkey % 65536)").as("zval"))
        .orderBy("zval", "l_orderkey", "l_linenumber")
    }),

    // O19: rank (range-bucket) normalization — the skew-robust key
    // scaling under OPTIMIZE ZORDER (VERDICT r16 #3): bucket(x) = the
    // number of quantile boundaries ≤ x, a codegen'd binary search
    // (functions/RangeBucket.scala) that LayoutOps.zorderWrite feeds
    // approx-quantile boundaries so every bucket holds ~1/B of the ROWS
    // whatever the key distribution. The lane pins the kernel against a
    // FIXED boundary set; the oracle replays it as a sum of BIGINT-cast
    // comparisons — exact, no float arithmetic anywhere.
    "o19_range_bucket" -> ((s, d) => {
      graft.functions.RangeBucket.register(s)
      t(s, d, "lineitem").filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          expr("range_bucket(CAST(l_quantity AS DOUBLE), " +
            "array(5.0D, 15.0D, 25.0D, 35.0D, 45.0D))").as("bkt"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // O20: Merkle snapshot diff — change-data-feed between two PUBLISHED
    // labels at O(changed blocks), not O(table). Version 1 of a bucketed
    // orders table publishes under label v1; version 2 reuses v1's files
    // byte-for-byte except the ONE bucket whose rows were repriced (the
    // incremental-writer shape) and publishes under v2. The differ
    // compares the two MANIFESTS (metadata: path, sha — no data read),
    // opens ONLY the files that differ, and EXCEPTs them row-wise; the
    // 7 untouched buckets are never opened (SnapDiffSpec pins the file
    // counts). At 100 TB this is the Merkle contract: diff cost tracks
    // the write set. The oracle recomputes the same changed rows from
    // the base table, so a hash match proves the block-level shortcut
    // loses nothing.
    "o20_snapshot_diff" -> ((s, d) => SnapDiff.changedRows(s, d))
  )

  /** o20's two-label fixture: a deterministic two-version publish into a
    * scratch SnapshotStore repo, built once per (process, sf dir). v2's
    * unchanged buckets are byte-copies of v1's files, so their CAS
    * blocks dedup to the same shas and the manifest diff isolates the
    * rewritten bucket. */
  private[graft] object SnapDiff {
    import graft.sources.SnapshotStore
    private final class Cell(mk: => String) { lazy val repo: String = mk }
    private val built =
      new java.util.concurrent.ConcurrentHashMap[String, Cell]()
    private def repoFor(s: SparkSession, d: String): String =
      built.computeIfAbsent(d, _ => new Cell({
        val work = java.nio.file.Files
          .createTempDirectory("graft-o20").toString
        val orders = t(s, d, "orders").select("o_orderkey", "o_totalprice")
        // v1: 8 hash buckets, one file each, rows sorted within the file
        orders
          .withColumn("bucket", pmod(col("o_orderkey"), lit(8)).cast("int"))
          .repartition(8, col("bucket"))
          .sortWithinPartitions("o_orderkey")
          .write.partitionBy("bucket").parquet(s"$work/v1/orders")
        // v2: byte-copy every bucket except 3; rewrite bucket 3 with the
        // %13 keys repriced — exactly what an incremental writer leaves
        val v1Root = java.nio.file.Paths.get(s"$work/v1")
        val stream = java.nio.file.Files.walk(v1Root)
        try stream.filter(p => java.nio.file.Files.isRegularFile(p) &&
            !p.toString.contains("bucket=3")).forEach { p =>
          val dst = java.nio.file.Paths.get(s"$work/v2")
            .resolve(v1Root.relativize(p))
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
          ()
        } finally stream.close()
        orders.filter(pmod(col("o_orderkey"), lit(8)) === 3)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .coalesce(1).sortWithinPartitions("o_orderkey")
          .write.parquet(s"$work/v2/orders/bucket=3")
        val repo = java.nio.file.Files
          .createTempDirectory("graft-o20-repo").toString
        SnapshotStore.publish(s, s"$work/v1", repo, "v1")
        SnapshotStore.publish(s, s"$work/v2", repo, "v2")
        repo
      })).repo

    /** The (old entries, new entries) whose (path, sha) pairs differ
      * between the labels — removed-or-rewritten on the left,
      * added-or-rewritten on the right. Pure manifest metadata. */
    private[operators] def changedEntries(s: SparkSession, d: String)
        : (Seq[SnapshotStore.ManifestEntry], Seq[SnapshotStore.ManifestEntry]) = {
      val repo = repoFor(s, d)
      def pq(label: String) = SnapshotStore.mount(repo, label)
        .filter(_.path.endsWith(".parquet"))
      val (m1, m2) = (pq("v1"), pq("v2"))
      val (k1, k2) = (m1.map(e => (e.path, e.sha256)).toSet,
        m2.map(e => (e.path, e.sha256)).toSet)
      (m1.filterNot(e => k2((e.path, e.sha256))),
        m2.filterNot(e => k1((e.path, e.sha256))))
    }

    def changedRows(s: SparkSession, d: String): DataFrame = {
      val repo = repoFor(s, d)
      val (oldC, newC) = changedEntries(s, d)
      def read(es: Seq[SnapshotStore.ManifestEntry]) =
        s.read.parquet(es.map(e => s"$repo/CAS/${e.sha256}"): _*)
      read(newC).except(read(oldC)).orderBy("o_orderkey")
    }
  }

  /** Unrolled 16-bit × n Morton interleave in portable SQL arithmetic:
    * bit i of column j lands at position n·i + j — DIV/%/× only, exact
    * in BIGINT on the nonnegative key domain. The DuckDB (`div` = "//")
    * replay of the zorder2/zorder3 kernels for inputs < 2^16 (the
    * kernels spread 32/21 bits; the high bits are zero here). */
  private[operators] def zorderExprN(cols: Seq[String],
      div: String): String = {
    val n = cols.size
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until 16).map { i =>
        s"(((CAST($c AS BIGINT) % 65536) $div ${1L << i}) % 2) " +
          s"* ${1L << (n * i + j)}"
      }
    }.mkString(" + ")
  }

  private[operators] def zorderExpr(x: String, y: String,
      div: String): String = zorderExprN(Seq(x, y), div)

  val oracleSql: Map[String, String] = Map(
    "s1_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s2_predicates" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE (p_name LIKE '%ring%' OR regexp_matches(p_name, '^(red|blue)'))
        |  AND p_size IN (1, 5, 11, 28, 42)
        |  AND p_retailprice BETWEEN 900 AND 1050
        |ORDER BY p_partkey""".stripMargin,

    "s3_case_null" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_bucket,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "o1_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "o2_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey < 800
        |    UNION
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 500 AND 1200
        |  ) EXCEPT SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0
        |) INTERSECT SELECT c_custkey FROM customer WHERE c_custkey < 1000
        |ORDER BY c_custkey""".stripMargin,

    "o3_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "f1_strings" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  p_brand || '/' || p_type AS brand_type,
        |  substring(p_name, 1, 4) AS name4,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(instr(p_name, 'e') AS BIGINT) AS e_pos,
        |  printf('%s#%03d', p_brand, p_size) AS brand_size
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f2_dates" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f3_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))
        |       AS DOUBLE) AS gross,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  round(exp(ln(l_quantity + 1)), 2) AS exp_ln,
        |  l_orderkey % 7 AS key_mod,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f4_hash" ->
      """SELECT c_custkey,
        |  sha256(c_name) AS name_sha,
        |  to_base64(encode(c_name)) AS name_b64
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f5_array_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS token FROM part
        |) GROUP BY token ORDER BY token""".stripMargin,

    "f6_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,

    "o5_scalar_subquery" -> o5Sql,
    "o6_lateral" -> o6Sql,
    "o9_recursive_cte" -> o9Sql,

    "o7_merge_upsert" ->
      """WITH tgt AS (
        |  SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |src AS (
        |  SELECT o_custkey AS key,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
        |SELECT coalesce(t.key, s.key) AS key,
        |  CASE WHEN t.key IS NOT NULL AND s.key IS NOT NULL THEN 'update'
        |       WHEN t.key IS NOT NULL THEN 'keep'
        |       ELSE 'insert' END AS action,
        |  CAST(coalesce(t.bal, 0) + coalesce(s.delta, 0) AS DOUBLE) AS new_bal
        |FROM tgt t FULL OUTER JOIN src s ON t.key = s.key
        |ORDER BY key""".stripMargin,

    "o8_table_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey AS key,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders),
        |v1 AS (SELECT key, price AS p1 FROM o WHERE key % 7 <> 0),
        |v2 AS (
        |  SELECT key,
        |    price + CAST(CASE WHEN key % 3 = 0 THEN 10 ELSE 0 END
        |      AS DECIMAL(18,2)) AS p2
        |  FROM o WHERE key % 5 <> 0),
        |d AS (
        |  SELECT coalesce(v1.key, v2.key) AS key,
        |    CASE WHEN v1.key IS NULL THEN 'added'
        |         WHEN v2.key IS NULL THEN 'removed'
        |         WHEN p1 <> p2 THEN 'changed'
        |         ELSE 'same' END AS status,
        |    CAST(p1 AS DOUBLE) AS old_price, CAST(p2 AS DOUBLE) AS new_price
        |  FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key)
        |SELECT key, status, old_price, new_price FROM d
        |WHERE status <> 'same' ORDER BY key""".stripMargin,

    "o10_incremental_agg" ->
      """SELECT key % 25 AS grp, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(SUM(p2) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey AS key,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |      + CAST(CASE WHEN o_orderkey % 3 = 0 THEN 10 ELSE 0 END
        |          AS DECIMAL(18,2)) AS p2
        |  FROM orders WHERE o_orderkey % 5 <> 0) v2
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    "o15_incremental_quantile" ->
      """WITH v2 AS (
        |  SELECT event_type AS grp, value AS v FROM events
        |  WHERE event_id % 5 = 0
        |     OR (event_id % 5 <> 0 AND event_id % 17 <> 0)),
        |hist AS (
        |  SELECT grp, CAST(floor(v / 10.0) AS BIGINT) AS bin,
        |    COUNT(*) AS cnt
        |  FROM v2 GROUP BY grp, bin),
        |c AS (
        |  SELECT grp, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY grp) AS n
        |  FROM hist)
        |SELECT grp, CAST(MAX(n) AS BIGINT) AS n_rows,
        |  CAST(MIN(CASE WHEN cum * 100 >= 50 * n
        |           THEN (bin + 1) * 10.0 END) AS DOUBLE) AS p50,
        |  CAST(MIN(CASE WHEN cum * 100 >= 90 * n
        |           THEN (bin + 1) * 10.0 END) AS DOUBLE) AS p90,
        |  CAST(MIN(CASE WHEN cum * 100 >= 99 * n
        |           THEN (bin + 1) * 10.0 END) AS DOUBLE) AS p99
        |FROM c GROUP BY grp ORDER BY grp""".stripMargin,

    // Version 2 ranked directly — hash match proves the maintenance path
    // (state ∪ batch re-rank) ≡ this O(table) recompute.
    "o16_incremental_topk" ->
      """WITH v2 AS (
        |  SELECT o_orderpriority AS grp, o_orderkey AS key, o_totalprice AS v
        |  FROM orders),
        |r AS (
        |  SELECT grp, key, v,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v DESC, key) AS rnk
        |  FROM v2)
        |SELECT grp, CAST(rnk AS INT) AS rnk, key, CAST(v AS DOUBLE) AS price
        |FROM r WHERE rnk <= 5 ORDER BY grp, rnk""".stripMargin,

    "o13_scd2" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS key, CAST(o_totalprice AS DECIMAL(18,2)) AS p1
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |v2 AS (
        |  SELECT o_orderkey AS key,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |      + CAST(CASE WHEN o_orderkey % 3 = 0 THEN 10 ELSE 0 END
        |          AS DECIMAL(18,2)) AS p2
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT coalesce(v1.key, v2.key) AS key, p1, p2,
        |    CASE WHEN v1.key IS NULL THEN 'added'
        |         WHEN v2.key IS NULL THEN 'removed'
        |         WHEN p1 <> p2 THEN 'changed' ELSE 'same' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key)
        |SELECT key, CAST(p1 AS DOUBLE) AS price,
        |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM d WHERE status = 'same'
        |UNION ALL
        |SELECT key, CAST(p1 AS DOUBLE),
        |  TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00'
        |FROM d WHERE status IN ('changed', 'removed')
        |UNION ALL
        |SELECT key, CAST(p2 AS DOUBLE),
        |  TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP)
        |FROM d WHERE status IN ('changed', 'added')
        |ORDER BY key, valid_from""".stripMargin,

    "o11_incremental_minmax" ->
      """SELECT CAST(FLOOR(key / 250) AS BIGINT) AS grp,
        |  CAST(min(p2) AS DOUBLE) AS mn, CAST(max(p2) AS DOUBLE) AS mx
        |FROM (
        |  SELECT o_orderkey AS key,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |      + CAST(CASE WHEN o_orderkey BETWEEN 2000 AND 2999 THEN 10
        |          ELSE 0 END AS DECIMAL(18,2)) AS p2
        |  FROM orders WHERE o_orderkey NOT BETWEEN 500 AND 599) v2
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    "o4_multiset_ops" ->
      """WITH xy AS (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_extendedprice > 30000),
        |r AS (
        |  SELECT l_suppkey FROM xy
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
        |FROM r GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "f8_map_json" ->
      """SELECT event_id, 'k' AS key,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS value
        |FROM events ORDER BY event_id""".stripMargin,

    "f10_text_distance" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_brand_type,
        |  CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_name_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f13_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "f9_dates_calendar" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f14_try_cast" ->
      """SELECT c_custkey,
        |  TRY_CAST(substring(c_name, 10) AS BIGINT) AS parsed_id,
        |  TRY_CAST(c_mktsegment AS BIGINT) AS bad_cast,
        |  c_acctbal / NULLIF(c_custkey % 5, 0) AS risky_div
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f7_higher_order" ->
      """SELECT vec_id,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 2) AS norm2
        |FROM embeddings
        |WHERE vec_id < 10 ORDER BY vec_id""".stripMargin,

    "o14_fk_audit" ->
      """SELECT 'customers_no_orders' AS chk, CAST(count(*) AS BIGINT) AS violations
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'orphan_lineitems', CAST(count(*) AS BIGINT)
        |FROM lineitem l
        |LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0) o
        |  ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'parts_never_ordered', CAST(count(*) AS BIGINT)
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |ORDER BY chk""".stripMargin,

    "o17_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ${zorderExpr("l_partkey", "l_suppkey", "//")} AS zval
         |FROM lineitem WHERE l_orderkey < 150
         |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,

    "o18_zorder3_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ${zorderExprN(Seq("l_partkey", "l_suppkey", "l_orderkey"), "//")} AS zval
         |FROM lineitem WHERE l_orderkey < 150
         |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,

    // bucket(x) = count of boundaries <= x, replayed as BIGINT-cast
    // comparisons — integral quantities vs .0 boundaries, exact both ways
    "o19_range_bucket" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(l_quantity >= 5.0 AS BIGINT) + CAST(l_quantity >= 15.0 AS BIGINT)
        |  + CAST(l_quantity >= 25.0 AS BIGINT) + CAST(l_quantity >= 35.0 AS BIGINT)
        |  + CAST(l_quantity >= 45.0 AS BIGINT) AS bkt
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // the repriced rows of the rewritten bucket — what the Merkle
    // manifest diff must surface from the changed blocks alone
    "o20_snapshot_diff" ->
      """SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
        |FROM orders WHERE o_orderkey % 8 = 3 AND o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin
  )
}
