package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Join inventory (SURVEY §2.3 "Joins"; queries Q-J1..J9).
  *
  * The reference's workload model is share-nothing batch over a star schema
  * (reference README.md:5-8); every TPC-H-like user query is join-shaped.
  *
  * 100 TB design notes:
  *  - Dim tables (region/nation/supplier/part at star scale) are broadcast
  *    (`broadcast(dim)`) so the fact scan never shuffles for them (Q-J5).
  *  - Equi joins (Q-J1..J4, J8) shuffle both sides on the join key once;
  *    Catalyst + AQE pick shuffle-hash vs sort-merge and handle skew.
  *  - The theta/range join (Q-J6) keeps its LEFT side bounded by a selective
  *    filter so the broadcast-nested-loop stays O(|small| * |orders|), never
  *    O(n^2) on the fact table.
  *  - The as-of join (Q-J7) is the union+window formulation: one shuffle on
  *    the partition key, a single sort, NO row multiplication — unlike
  *    join-then-max which inflates by the match count per key.
  */
object JoinOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q-J1: inner equi join customer ⋈ orders (row-level).
    "j1_inner" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Q-J2: left outer — every customer keeps a row; customers without
    // orders count 0 (count over the null-extended column skips nulls).
    "j2_left_outer" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // Q-J3: left semi — customers having at least one high-value order.
    "j3_semi" -> ((s, d) => {
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Q-J4: left anti — parts never ordered in large quantity (>45). The
    // filter lands on the join's build side BEFORE the anti join, so
    // selectivity is pushed into the scan.
    "j4_anti" -> ((s, d) => {
      t(s, d, "part")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // Q-J5: 5-way star join — all four dims explicitly broadcast so the
    // lineitem scan is a single pass with no shuffle until the final agg.
    // Revenue uses round→decimal→sum→double for exact cross-engine parity.
    "j5_star_broadcast" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // Q-J6: theta/range join — for a bounded set of probe orders, count
    // orders strictly within the following 7 days. Left side is small by
    // construction, so Spark broadcasts it into a nested-loop join that
    // stays linear in |orders| at any scale factor.
    "j6_range" -> ((s, d) => {
      val o1 = t(s, d, "orders").filter(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderdate").as("d1"))
      val o2 = t(s, d, "orders")
        .select(col("o_orderkey").as("k2"), col("o_orderdate").as("d2"))
      broadcast(o1)
        .join(o2,
          col("d2") > col("d1") &&
          col("d2") <= col("d1") + expr("INTERVAL 7 DAYS") &&
          col("k2") =!= col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // Q-J7: as-of join — for every click event, the latest error event of
    // the same user at ts <= click ts. Union+window: tag rows, sort once per
    // user, carry the last error ts forward. One shuffle, no fan-out.
    "j7_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "error").as("is_err"))
      // errors sort before clicks at equal ts so the as-of is inclusive
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_err").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_err_ts", max(when(col("is_err"), col("ts"))).over(w))
        .filter(!col("is_err"))
        .select("event_id", "user_id", "ts", "last_err_ts")
        .orderBy("event_id")
    }),

    // J16: FORWARD as-of — for every click, the NEXT error at ts >= the
    // click's ts (per user): the look-ahead direction of j7's
    // look-behind (trade → next quote, request → next failure). Same
    // union+window shape, frame flipped to [current, unbounded
    // following]; clicks sort before errors at equal ts so the match is
    // inclusive. One shuffle on user_id, no row fan-out — j7 scale class.
    "j16_asof_forward" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "error").as("is_err"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_err"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_err_ts", min(when(col("is_err"), col("ts"))).over(w))
        .filter(!col("is_err"))
        .select("event_id", "user_id", "ts", "next_err_ts")
        .orderBy("event_id")
    }),

    // Q-J8: full outer — nations vs per-nation supplier counts; nations
    // without suppliers survive with count 0.
    "j8_full_outer" -> ((s, d) => {
      val sup = t(s, d, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"))
      t(s, d, "nation")
        .join(sup, col("n_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("n_nationkey"), col("s_nationkey")).as("nk"),
          col("n_name"),
          coalesce(col("cnt"), lit(0L)).as("n_sup"))
        .orderBy("nk")
    }),

    // Q-J9: cross join nation × region (both tiny; Spark broadcasts).
    "j9_cross" -> ((s, d) => {
      t(s, d, "nation").crossJoin(t(s, d, "region"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    }),

    // Q-J10: right outer — every customer kept, orderless ones at zero.
    "j10_right_outer" -> ((s, d) => {
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"),
          "right_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"),
            lit(0.0)).as("total"))
        .orderBy("c_custkey")
    }),

    // Q-J11: conditional NOT EXISTS — anti join with a predicate beyond
    // the equality key (customers with no order above 450k).
    "j11_not_exists" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_totalprice") > 450000,
          "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Q-J12: banded range join — the same window-count semantics as j6 but
    // planned for BOTH sides fact-sized: no broadcast hint, no nested-loop.
    // Dates become day numbers, the interval side is exploded across the
    // (at most two) 8-day bands it touches, and the join is a plain equi
    // join on the band key with the exact range predicate refined inside
    // it. Scales as one hash shuffle of each side at any SF.
    "j12_range_banded" -> ((s, d) => {
      val day = (c: org.apache.spark.sql.Column) =>
        datediff(c, to_date(lit("1970-01-01")))
      val probes = t(s, d, "orders").filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("k"), day(col("o_orderdate")).as("d1"))
        .withColumn("lo", col("d1") + 1)
        .withColumn("hi", col("d1") + 7)
      val points = t(s, d, "orders")
        .select(col("o_orderkey").as("k2"), day(col("o_orderdate")).as("d2"))
      // adaptive width: p95 of the probe-window spans, where span is
      // INCLUSIVE (hi − lo + 1): [d1+1, d1+7] covers 7 day numbers, so
      // w = ceil(p95(7)) = 7. Re-derived per corpus so a drifted span
      // distribution re-tunes the banding instead of thickening a
      // stale constant.
      bandedRangeJoin(points, "d2", probes, "lo", "hi")
        .filter(col("k2") =!= col("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // Q-J15: interval×interval overlap join — both sides are interval
    // sets (7-day and 14-day order windows), matched when they overlap.
    // Naive formulation is a cross join with the overlap predicate;
    // bandedIntervalOverlapJoin makes it a band-key equi join with each
    // pair counted exactly once in the band holding the overlap's left
    // edge. Both sides fact-sized at 100 TB — the same contract as j12.
    "j15_interval_overlap" -> ((s, d) => {
      val day = (c: org.apache.spark.sql.Column) =>
        datediff(c, to_date(lit("1970-01-01")))
      val a = t(s, d, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("k"), day(col("o_orderdate")).as("alo"))
        .withColumn("ahi", col("alo") + 6)
      val b = t(s, d, "orders").filter(col("o_orderkey") % 20 === 10)
        .select(col("o_orderkey").as("k2"), day(col("o_orderdate")).as("blo"))
        .withColumn("bhi", col("blo") + 13)
      // adaptive width: max of the two sides' p95 INCLUSIVE spans —
      // a: [alo, alo+6] = 7 days, b: [blo, blo+13] = 14 days → w=14
      bandedIntervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // Q-J14: as-of join with tolerance — j7's backward as-of, but a match
    // expires after one hour (pandas merge_asof's `tolerance`). Same
    // union+window shape (one shuffle, no row fan-out); the tolerance is
    // a post-carry predicate on the carried timestamp, so staleness
    // filtering costs nothing extra.
    "j14_asof_tolerance" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "error").as("is_err"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_err").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_err_ts", max(when(col("is_err"), col("ts"))).over(w))
        .filter(!col("is_err"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("last_err_ts") >= col("ts") - expr("INTERVAL 1 HOUR"),
            col("last_err_ts")).as("recent_err_ts"))
        .orderBy("event_id")
    }),

    // Q-J13: fuzzy self-join (edit distance ≤ 1) via deletion
    // neighborhoods — the string analog of j12's banding. A naive fuzzy
    // join is a cross join with levenshtein() inside: O(n²) comparisons.
    // Instead each name emits its len+1 deletion variants (itself plus
    // delete-char-i for every i); two strings within edit distance 1
    // ALWAYS share a variant (substitution: delete the differing slot
    // from both; insert/delete: the shorter string IS a variant of the
    // longer), so candidates come from a plain equi join on the variant
    // key — O(n·len) rows, one hash shuffle — and exact levenshtein runs
    // only on candidates. FastSS method, public algorithm.
    "j13_fuzzy_neighbors" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("nm"))
      // join key = 64-bit hash of the deletion variant: the candidate
      // shuffle moves 16-byte (id, hash) rows instead of 17-char strings
      // (measured 4× faster end-to-end); a hash collision can only ADD a
      // candidate, which the exact levenshtein filter below discards
      val variants = c
        .withColumn("i", explode(sequence(lit(0), length(col("nm")))))
        .select(col("id"), xxhash64(expr(
          "CASE WHEN i = 0 THEN nm " +
          "ELSE concat(substring(nm, 1, i-1), substring(nm, i+1)) END"))
          .as("vh"))
      // ONE shuffle of the variant table (r19): group ids per variant
      // hash and expand a<b pairs inside the group, instead of the
      // self-join that shuffled (or broadcast) the variant table twice
      // and recomputed the deletion explode for each side. collect_set
      // dedups an id that reaches the same variant twice (two identical
      // adjacent chars); per-group state is bounded by the hash's
      // collision group, the same row set the join's build side held.
      // two stacked Generates, not flatten(transform(transform)) (r20):
      // per-row state stays O(|group|), never the materialized
      // |group|² pair array — see LlmOps.pairsInBucket's shape note
      val pairs = LlmOps.pairsInBucket(variants.groupBy("vh")
        .agg(sort_array(collect_set(col("id"))).as("ids"))
        .filter(size(col("ids")) >= 2))
        .distinct()
      // names rejoin AFTER dedup, broadcast here because the name table is
      // dim-sized; at entity counts past broadcast range the same two
      // joins run shuffled — still O(pairs), never O(n²)
      pairs
        .join(broadcast(c.select(col("id").as("a"), col("nm").as("an"))), "a")
        .join(broadcast(c.select(col("id").as("b"), col("nm").as("bn"))), "b")
        // thresholded levenshtein: banded O(k·n) with early exit (returns
        // -1 past the bound) instead of the full O(n²) DP — the exact
        // verify runs once per candidate pair, so the bound is the win
        .filter(levenshtein(col("an"), col("bn"), 1) >= 0)
        .select(col("a"), col("b"))
        .orderBy("a", "b")
    })
  )

  /** Banded range join — equi-join plan for `point ∈ [lo, hi]` when both
    * sides are too large to broadcast (where j6's broadcast-nested-loop
    * stops working). Each interval is replicated to the ⌈span/band⌉+1
    * integer bands it overlaps; each point hashes to exactly ONE band, so
    * every true (point, interval) pair meets in precisely the point's band
    * — no post-join dedup needed. With bandWidth chosen ≥ the typical
    * interval span, replication is ≤2× and the plan is an ordinary
    * shuffle/hash equi join on `(band)` plus an in-join refine of the
    * exact predicate. The reference's region-overlap queries (RegionMask
    * intersection, core region model) are this shape.
    */
  /** Band width derived FROM the data: the p95 interval span across the
    * given (df, lo, hi) interval sets, clamped to ≥1. Width ≈ the typical
    * span keeps replication ≤ ~2× for 95% of intervals while bands stay
    * as narrow as the data allows — and narrow bands are what bound the
    * join's quadratic term (every candidate pair sharing a band key pays
    * a predicate evaluation, so per-band membership is the cost driver).
    * A fixed constant tuned on one corpus generation goes stale when
    * span distributions drift (the K-replication probes showed exactly
    * this: densified fixtures thickened every 16-wide band); deriving
    * the width per call costs one approxQuantile pass over just the two
    * bound columns. The width only shapes the PLAN — any positive value
    * returns identical rows — so the approximation cannot affect
    * correctness. */
  def adaptiveBandWidth(intervalSets: (DataFrame, String, String)*): Long = {
    // Memoize per data GENERATION: repeat joins against the same
    // published corpus (the steady-state serve pattern — and the bench's
    // warmup+iteration loop, where the per-call derivation job was the
    // round-9 j12/j15 1.2-1.3× movement) skip the percentile job. The
    // key is each set's resolved parquet FILE LIST (so an appended
    // corpus — new part files — re-derives) plus its canonicalized plan
    // and bound columns (so two different span constructions over the
    // same files never share a width). A frame with no input files
    // (in-memory/ad-hoc) is not keyable by generation and keeps the
    // per-call path. Width only shapes the PLAN — a cache hit can never
    // change results, only replication.
    val keyParts = intervalSets.map { case (df, lo, hi) =>
      val files = df.inputFiles
      if (files.isEmpty) return deriveBandWidth(intervalSets: _*)
      val plan = df.queryExecution.logical.canonicalized.toString
      files.sorted.mkString("") + "" + plan +
        "" + lo + "" + hi
    }
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(keyParts.mkString("").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // plain get/putIfAbsent, not computeIfAbsent: the derivation runs a
    // Spark job and must not run under the CHM bin lock; a lost race
    // just derives the same deterministic width twice
    Option(widthCache.get(key)).map(_.longValue()).getOrElse {
      val w = deriveBandWidth(intervalSets: _*)
      // bound the memo: a long-lived service touching many corpus
      // generations must not grow the map forever (entries are ~100 B,
      // but unbounded is unbounded). Clear-on-threshold rather than LRU:
      // the steady-state working set is a handful of generations, so a
      // rare full reset costs at most one re-derivation per live corpus
      // — far cheaper than per-hit bookkeeping on the hot path.
      if (widthCache.size() >= widthCacheMax) widthCache.clear()
      widthCache.putIfAbsent(key, java.lang.Long.valueOf(w))
      w
    }
  }

  private[graft] val widthCacheMax = 1024
  private[graft] val widthCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Spec hook: how many width derivations have actually run (the cache
    * test asserts a repeat call does not add one). */
  private[graft] val widthDerivations =
    new java.util.concurrent.atomic.AtomicLong()

  private def deriveBandWidth(
      intervalSets: (DataFrame, String, String)*): Long = {
    widthDerivations.incrementAndGet()
    // ONE job for all sets (not one approxQuantile job per set — the
    // derivation is pure scheduling overhead at bench scale): each set
    // is tagged and unioned, per-set p95s come from one grouped
    // percentile_approx, and the MAX wins — per-set p95s (not the
    // union's) so a small set of long intervals still widens the band
    // enough to keep its own replication ≤ ~2×.
    val spans = intervalSets.zipWithIndex.map { case ((df, lo, hi), i) =>
      df.select(lit(i).as("g"),
        (col(hi).cast("double") - col(lo).cast("double") + 1.0).as("span"))
    }.reduce(_.unionByName(_))
    val p95s = spans.groupBy("g")
      .agg(percentile_approx(col("span"), lit(0.95), lit(1000)).as("p"))
      .collect().flatMap(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    math.max(1L, math.ceil(if (p95s.isEmpty) 1.0 else p95s.max).toLong)
  }

  /** bandedRangeJoin with the width derived from the interval side's
    * span distribution (see adaptiveBandWidth). */
  def bandedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    bandedRangeJoin(points, pointCol, intervals, loCol, hiCol,
      adaptiveBandWidth((intervals, loCol, hiCol)))

  def bandedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    // greatest() clamp: an empty interval (lo > hi) must contribute zero
    // matches, but sequence(start, stop) THROWS when start > stop — clamp
    // to one band and let the exact predicate reject it
    val lban = floor(col(loCol) / bandWidth).cast("long")
    val ip = intervals.withColumn("__iband",
      explode(sequence(lban,
        greatest(lban, floor(col(hiCol) / bandWidth).cast("long")))))
    val pp = points.withColumn("__pband",
      floor(col(pointCol) / bandWidth).cast("long"))
    pp.join(ip,
        col("__pband") === col("__iband") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__pband", "__iband")
  }

  /** Interval×interval OVERLAP join with both sides fact-sized — j12's
    * banding applied to two interval sets (the temporal/genomic overlap
    * join). Each side explodes across the integer bands it spans and the
    * overlap predicate (`aLo <= bHi && bLo <= aHi`, closed intervals)
    * rides inside a plain band-key equi join. A pair overlapping across
    * several shared bands would match once per band; instead of a
    * downstream distinct (an extra shuffle over the full result), each
    * pair is counted ONLY in its canonical band — the band holding
    * `greatest(aLo, bLo)`, the overlap's left edge, which both sides
    * provably span. Result: exact overlap pairs, one shuffle, no dedup. */
  /** bandedIntervalOverlapJoin with the width derived from BOTH sides'
    * span distributions (see adaptiveBandWidth). */
  def bandedIntervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String): DataFrame =
    bandedIntervalOverlapJoin(left, lLo, lHi, right, rLo, rHi,
      adaptiveBandWidth((left, lLo, lHi), (right, rLo, rHi)))

  def bandedIntervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def bandsOf(df: DataFrame, lo: String, hi: String, out: String) = {
      val b0 = floor(col(lo) / bandWidth).cast("long")
      df.withColumn(out,
        explode(sequence(b0, greatest(b0, floor(col(hi) / bandWidth).cast("long")))))
    }
    val lp = bandsOf(left, lLo, lHi, "__lband")
    val rp = bandsOf(right, rLo, rHi, "__rband")
    lp.join(rp,
        col("__lband") === col("__rband") &&
        col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        floor(greatest(col(lLo), col(rLo)) / bandWidth).cast("long") ===
          col("__lband"))
      .drop("__lband", "__rband")
  }

  val oracleSql: Map[String, String] = Map(
    "j1_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "j2_left_outer" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "j3_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "j4_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,

    "j5_star_broadcast" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |       AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "j6_range" ->
      """SELECT o1.o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
        |FROM orders o1 JOIN orders o2
        |  ON o2.o_orderdate > o1.o_orderdate
        | AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
        | AND o2.o_orderkey <> o1.o_orderkey
        |WHERE o1.o_orderkey % 1000 = 0
        |GROUP BY 1 ORDER BY k""".stripMargin,

    "j7_asof" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  CAST((SELECT max(e2.ts) FROM events e2
        |        WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |          AND e2.ts <= e.ts) AS TIMESTAMP) AS last_err_ts
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id""".stripMargin,

    "j16_asof_forward" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  CAST((SELECT min(e2.ts) FROM events e2
        |        WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |          AND e2.ts >= e.ts) AS TIMESTAMP) AS next_err_ts
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id""".stripMargin,

    "j8_full_outer" ->
      """SELECT coalesce(n_nationkey, s_nationkey) AS nk, n_name,
        |  CAST(coalesce(cnt, 0) AS BIGINT) AS n_sup
        |FROM nation FULL OUTER JOIN
        |  (SELECT s_nationkey, count(*) AS cnt FROM supplier GROUP BY 1) sup
        |  ON n_nationkey = s_nationkey
        |ORDER BY nk""".stripMargin,

    "j9_cross" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "j10_right_outer" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        |    AS total
        |FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "j11_not_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "j12_range_banded" ->
      """SELECT o1.o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
        |FROM orders o1 JOIN orders o2
        |  ON o2.o_orderdate > o1.o_orderdate
        | AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
        | AND o2.o_orderkey <> o1.o_orderkey
        |WHERE o1.o_orderkey % 100 = 0
        |GROUP BY 1 ORDER BY k""".stripMargin,

    "j15_interval_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS k, o_orderdate AS alo,
        |    o_orderdate + INTERVAL 6 DAY AS ahi
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |b AS (
        |  SELECT o_orderkey AS k2, o_orderdate AS blo,
        |    o_orderdate + INTERVAL 13 DAY AS bhi
        |  FROM orders WHERE o_orderkey % 20 = 10)
        |SELECT a.k, CAST(count(*) AS BIGINT) AS n
        |FROM a JOIN b ON a.alo <= b.bhi AND b.blo <= a.ahi
        |GROUP BY a.k ORDER BY a.k""".stripMargin,

    "j14_asof_tolerance" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  CAST((SELECT max(e2.ts) FROM events e2
        |        WHERE e2.user_id = e.user_id AND e2.event_type = 'error'
        |          AND e2.ts <= e.ts
        |          AND e2.ts >= e.ts - INTERVAL 1 HOUR) AS TIMESTAMP)
        |    AS recent_err_ts
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id""".stripMargin,

    "j13_fuzzy_neighbors" ->
      """SELECT a.c_custkey AS a, b.c_custkey AS b
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a, b""".stripMargin
  )
}
