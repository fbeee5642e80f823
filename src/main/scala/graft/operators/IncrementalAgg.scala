package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — update a standing per-group
  * aggregate from a row-level change feed, never re-reading the base.
  *
  * At 100 TB a nightly `groupBy(...).agg(...)` over the whole lake is the
  * single most expensive recurring job; when snapshots advance by a few
  * thousand files (SnapshotStore.diff / o8_table_diff give exactly that
  * change feed), the correct cost is O(changed rows), not O(table). This
  * is the relational face of the reference's dirty-subtree invalidation:
  * only what changed gets re-processed, everything clean is reused
  * (reference IsDirty ancestor invalidation, core/nodedb.go:286-315).
  *
  * Contract: `base` holds (grp, cnt, total) for version 1; `deltas` holds
  * per-row contributions (grp, dCnt, dTotal) derived from an
  * added/removed/changed feed. The merge is a union + one partial-agg
  * groupBy over |base groups| + |changed rows| — groups untouched by the
  * delta pass through arithmetically (sum with zero contribution), and
  * groups whose count reaches zero are dropped to match a direct
  * aggregate of version 2.
  *
  * count/sum (and any abelian-group aggregate: avg via sum/cnt, bitwise
  * xor, ...) maintain exactly. min/max do NOT maintain under removals
  * without a re-scan of the affected group — callers needing them should
  * re-aggregate only the groups the delta touched (still O(changed
  * groups), the same trick at one remove).
  */
object IncrementalAgg {

  /** Turn an o8-style row diff (key, status, oldVal, newVal) plus a
    * grouping expression into per-row aggregate deltas. NULL values
    * coalesce to 0 so the deltas mirror SUM's null-skipping exactly: a
    * changed row whose value went NULL->x contributes +x, x->NULL
    * contributes -x, and an added/removed NULL-valued row contributes
    * only its count.
    *
    * PRECONDITION: the grouping column must be immutable under "changed"
    * (part of the row's identity, like the diff key itself). A changed
    * row carries ONE grp and dCnt = 0 — if the group key itself moved,
    * the departure group would keep the row's count and the arrival
    * group would never gain it. Feeds whose group key can change must
    * model the move as removed(old grp) + added(new grp) before calling
    * this (o8's key-based diff does exactly that when grp is derived
    * from the key). */
  def deltasFromDiff(changes: DataFrame): DataFrame = {
    val oldV = coalesce(col("oldVal"), lit(0))
    val newV = coalesce(col("newVal"), lit(0))
    changes.select(
      col("grp"),
      when(col("status") === "added", lit(1L))
        .when(col("status") === "removed", lit(-1L))
        .otherwise(lit(0L)).as("dCnt"),
      when(col("status") === "added", newV)
        .when(col("status") === "removed", -oldV)
        .otherwise(newV - oldV).as("dTotal"))
  }

  /** base(grp, cnt, total) + deltas(grp, dCnt, dTotal) -> version-2
    * aggregate, one shuffle over base-groups + changed-rows. */
  def applyDeltas(base: DataFrame, deltas: DataFrame): DataFrame =
    base.select(col("grp"), col("cnt"), col("total"))
      .unionByName(deltas.select(col("grp"),
        col("dCnt").as("cnt"), col("dTotal").as("total")))
      .groupBy("grp")
      .agg(sum("cnt").as("cnt"), sum("total").as("total"))
      .filter(col("cnt") > 0)

  /** Sketch-based distinct-count maintenance: HLL sketches form a
    * commutative monoid under union (register-wise max), so maintaining a
    * standing per-group sketch by merging the new batch's sketch yields
    * the SAME estimate as re-sketching all of version 2 — with bounded
    * state per group (the same reason a7 prefers the sketch at 100 TB).
    * Union-merge work is confined to the TOUCHED groups: the batch's
    * per-group sketches are aggregated first (small — O(changed groups)
    * rows), base rows for untouched groups pass through by a broadcast
    * anti join against that small set, and only touched base rows enter
    * the hll_union_agg — so the merge is O(changed groups · sketch size)
    * and the 100 TB base is never re-aggregated. Append-only by nature:
    * sketches cannot subtract, so removals fall back to maintainByRescan.
    * base: (grp, sk) from hll_sketch_agg; added: raw new rows (grp, v). */
  def maintainSketch(base: DataFrame, added: DataFrame): DataFrame = {
    val batch = added.groupBy("grp").agg(hll_sketch_agg(col("v")).as("sk"))
    val touched = batch.select(col("grp").as("__tgrp")).distinct()
    val untouched = base.join(broadcast(touched),
      base("grp") <=> touched("__tgrp"), "left_anti")
    val merged = base.join(broadcast(touched),
      base("grp") <=> touched("__tgrp"), "left_semi")
      .select(col("grp"), col("sk"))
      .unionByName(batch)
      .groupBy("grp")
      .agg(hll_union_agg(col("sk")).as("sk"))
    untouched.select(col("grp"), col("sk")).unionByName(merged)
  }

  /** Fixed-bin histogram sketch — the mergeable QUANTILE state. Rows
    * (grp, v: double) → (grp, bin, cnt) with integer bin = floor(v/width).
    * Bin counts are exact BIGINTs, so unlike HLL the sketch forms a
    * commutative GROUP, not just a monoid: merging adds counts and
    * removals subtract them, so the same delta discipline that maintains
    * counts (applyDeltas) maintains quantiles in O(changed bins) — and
    * because the state is exact integers, the maintained estimate is
    * bit-identical to a full re-sketch, engine-independently. Estimate
    * error is bounded by `width` by construction; state per group is
    * bounded by the value range / width, not the row count. */
  def binHistogram(rows: DataFrame, width: Double): DataFrame =
    rows.groupBy(col("grp"),
        floor(col("v") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Standing histogram + a (grp, bin, dCnt) delta feed → the version-2
    * histogram: one union + partial-agg groupBy over |base bins| +
    * |changed bins|; bins whose count reaches zero drop, matching a
    * direct re-sketch of version 2. */
  def maintainHistogram(base: DataFrame, deltas: DataFrame): DataFrame =
    base.select(col("grp"), col("bin"), col("cnt"))
      .unionByName(deltas.select(col("grp"), col("bin"),
        col("dCnt").as("cnt")))
      .groupBy("grp", "bin").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") > 0)

  /** Histogram → per-group quantile estimates at integer percentiles.
    * The estimate for percentile p is the UPPER EDGE (bin+1)·width of
    * the first ascending bin whose cumulative count reaches
    * ceil(p·N/100). The selection is all-integer (cum·100 ≥ p·N — for
    * integer cum that IS the ceil test), so two engines cannot disagree
    * at a boundary; the only float op is the final edge multiply of
    * identical operands. The true order statistic lies inside the chosen
    * bin, i.e. within `width` below the reported edge. */
  def histogramQuantiles(hist: DataFrame, width: Double,
      pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("grp").orderBy("bin")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("grp")))
    val qCols = pcts.map { p =>
      min(when(col("cum") * 100 >= col("n") * p,
        (col("bin") + 1) * lit(width))).as(s"p$p")
    }
    cum.groupBy("grp")
      .agg(max("n").as("n_rows"), qCols: _*)
  }

  /** Append-only top-k maintenance: per-group top-k under a total order
    * is a bounded MERGEABLE structure — topK(topK(A) ∪ B) = topK(A ∪ B),
    * because any row of A outside its group's top k is dominated by k
    * rows that are all still present in topK(A) and can never re-enter.
    * So the standing (|groups|·k)-row state absorbs an appended batch in
    * O(state + batch): union, one per-group window over ≤ k + |batch
    * rows in group| rows, never the base table. The order is
    * (v DESC, key ASC) — the key tiebreak makes ranks total, so two
    * engines (or two runs) cannot disagree on membership. Removals are
    * NOT maintainable this way (evicted rows are gone from the state);
    * use maintainByRescan for feeds with deletes, as with min/max.
    * Schema in and out: (grp, key, v) [+ rnk out]. */
  def maintainTopK(base: DataFrame, added: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    base.select("grp", "key", "v")
      .unionByName(added.select("grp", "key", "v"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("grp").orderBy(col("v").desc, col("key"))))
      .filter(col("rnk") <= k)
  }

  /** Maintenance for NON-group aggregates (min/max/distinct-count): keep
    * base rows for groups the change feed never touched, re-aggregate
    * version 2 only for the groups it did. `rescanned` must already be
    * the per-touched-group aggregate of version 2 (callers semi-join v2
    * against `touchedGroups(grp)` — with the table partitioned/clustered
    * by grp that semi-join prunes at the file level, so the rescan reads
    * O(changed groups), not O(table)). A touched group absent from
    * `rescanned` (every row removed) drops out, matching a direct
    * aggregate of version 2. */
  def maintainByRescan(base: DataFrame, touchedGroups: DataFrame,
      rescanned: DataFrame): DataFrame = {
    // null-safe anti join: a NULL group key must still knock out its base
    // row (plain equality never matches NULL and would keep the stale row
    // alongside the rescanned one)
    val tg = touchedGroups.select(col("grp").as("__tgrp")).distinct()
    base.join(tg, base("grp") <=> tg("__tgrp"), "left_anti")
      .unionByName(rescanned)
  }
}
