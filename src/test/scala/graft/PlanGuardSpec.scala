package graft

/** Registry-wide physical-plan guard — the plan-shape analog of
  * QueriesSpec's DecimalType gate: every lane's executed plan is checked
  * for the three scale anti-patterns, with explicit per-lane allowlists
  * so an intentional pattern must be JUSTIFIED here and an accidental
  * one (a dropped join key, a window that lost its partitioning, a
  * broadcast that silently became a cartesian) fails the suite instead
  * of becoming a 100 TB incident.
  *
  * A new lane tripping a guard has two legitimate outs: fix the plan, or
  * add it to the allowlist with a reason. */
class PlanGuardSpec extends SparkSpec {

  /** BroadcastNestedLoopJoin is fine exactly when one side is provably
    * tiny (a broadcast probe set, a 1-row aggregate, a scalar subquery).
    * Everything else must be an equi/hash join. */
  private val bnljAllowed: Map[String, String] = Map(
    "j6_range"            -> "bounded probe side broadcast against the fact (Q-J6 contract)",
    "j9_cross"            -> "the cross join lane — cartesian semantics on a dim-sized side",
    "l3_knn_cosine"       -> "10 broadcast probes against the corpus (brute-force kNN baseline)",
    "l20_ann_ivf"         -> "k-row broadcast centroid table against vectors (IVF assignment)",
    // l53_ann_pq left this list in round 13: its ADC is now a
    // mapPartitions kernel over driver-collected distance tables, so the
    // returned plan carries no BNLJ (the dt crossJoin runs eagerly,
    // outside the lane plan)
    "a31_tpch_q11"        -> "1-row scalar-subquery threshold broadcast (Q11 HAVING)",
    "a34_tpch_q22"        -> "1-row avg-balance scalar subquery broadcast (Q22)",
    "t5_watermark_ontime" -> "1-row watermark threshold joined to the stream frame",
    "l47_triangle_count"  -> "three 1-row summary aggregates cross-joined into the report row",
    "l50_rrf_hybrid"      -> "1-row probe vector broadcast against the corpus (vector side of RRF)",
    "l51_tfidf_exact"     -> "1-row corpus-count aggregate broadcast (the idf denominator)",
    "l68_sq8_cosine"      -> "5 broadcast probes scored against SQ8 codes (the l3 shape over 1-byte codes)"
  )

  /** Exchange SinglePartition is fine exactly when the single-partition
    * subtree is BOUNDED: a global 1-row aggregate, a ≤numParts-row
    * offset frame (the two-pass global-rank machinery), or a
    * day-aggregated frame (≤ date-range rows). Unbounded single-task
    * sorts/windows are the bug class this guard exists for. */
  private val singlePartAllowed: Map[String, String] = Map(
    "a19_tpch_q17"     -> "1-row global aggregate (avg qty scalar)",
    "a22_tpch_q14"     -> "1-row promo-ratio aggregate",
    "a23_tpch_q6"      -> "1-row revenue aggregate",
    "a25_tpch_q15"     -> "1-row max-revenue scalar subquery",
    "a26_tpch_q19"     -> "1-row disjunctive-predicate revenue aggregate",
    "a31_tpch_q11"     -> "1-row scalar-subquery threshold",
    "a34_tpch_q22"     -> "1-row avg-balance scalar subquery",
    "l27_pack_sequences" -> "32-row bucket-offset frame of the two-pass prefix sum",
    "l57_pipeline"     -> "32-row bucket-offset frame of the pack stage (l27's machinery)",
    "l47_triangle_count" -> "1-row summary aggregates",
    "l49_global_shuffle" -> "32-row bucket-offset frame of the two-pass global rank",
    "o14_fk_audit"     -> "three 1-row audit counts",
    "o5_scalar_subquery" -> "the scalar-subquery lane: 1-row inner aggregate",
    "t5_watermark_ontime" -> "1-row watermark threshold",
    "w2_lag_lead"      -> "day-aggregated frame (≤ date-range rows, documented)",
    "w4_moving_avg"    -> "day-aggregated frame (≤ date-range rows, documented)",
    "l51_tfidf_exact"  -> "1-row corpus-count aggregate (the idf denominator)",
    "w5_ntile"         -> "32-row bucket-offset frame (two-pass rank)",
    "w8_distribution"  -> "32-row bucket-offset frame (two-pass rank)"
  )

  test("no lane plans a CartesianProduct; BNLJ and single-partition " +
      "exchanges only where justified") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        violations += s"$name: CartesianProduct (no lane may — broadcast or band it)"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
        violations += s"$name: unjustified BroadcastNestedLoopJoin"
      if (p.contains("Exchange SinglePartition") && !singlePartAllowed.contains(name))
        violations += s"$name: unjustified Exchange SinglePartition"
    }
    assert(violations.isEmpty,
      "plan guard tripped — fix the plan or justify in the allowlist:\n  " +
        violations.mkString("\n  "))
  }

  test("allowlists contain no stale entries") {
    // an allowlisted lane whose plan no longer shows the pattern should
    // be removed — stale entries erode the guard
    val stale = scala.collection.mutable.ArrayBuffer[String]()
    (bnljAllowed.keySet ++ singlePartAllowed.keySet).toSeq.sorted.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"allowlisted lane gone: $name")
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (bnljAllowed.contains(name) && !p.contains("BroadcastNestedLoopJoin"))
        stale += s"$name: BNLJ allowlisted but absent"
      if (singlePartAllowed.contains(name) && !p.contains("Exchange SinglePartition"))
        stale += s"$name: SinglePartition allowlisted but absent"
    }
    assert(stale.isEmpty, s"stale allowlist entries:\n  ${stale.mkString("\n  ")}")
  }
}
