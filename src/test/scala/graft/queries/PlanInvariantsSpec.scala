package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, IsNotNull, ScalaUDF, Size}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import graft.SparkSpec

/** Registry-wide physical/logical plan invariants — the properties every
  * round's plan audit (PLANS.md) re-confirms by hand, locked here so a
  * regression fails CI instead of waiting for the next manual audit:
  *
  *  1. **Zero SortMergeJoin.** Every join in the registry is a broadcast
  *     or shuffled-hash join by design (stats-less checkpointed frames are
  *     broadcast explicitly); an SMJ appearing means a hint was lost or a
  *     frame lost its stats.
  *  2. **Zero Scala UDFs.** The engine's extension points are native
  *     Catalyst expressions (codegen-friendly, null-safety visible to the
  *     optimizer); a ScalaUDF in any optimized plan means someone took the
  *     shortcut the builder brief forbids.
  *  3. **No heavy recompute guards in Filter conditions** (the
  *     `tools/Explain genfilters` audit): a `size(...)`/`isnotnull(...)`
  *     over a non-attribute subtree re-evaluates that subtree per row —
  *     the InferFilters trap that cost 2.5x on the IVF path in round 6.
  *  4. **Predicate pushdown reaches the scan** for the two registry
  *     queries whose filters are pushable by construction (IN-list,
  *     closed date range): their scans must carry non-empty PushedFilters.
  *
  * Plans are built (not executed) against sf0.01 — the same SF as the
  * correctness gate; building runs only the bounded preflight jobs the
  * operators resolve eagerly (auto-cap, collapse decision, IVF training),
  * which is exactly what a production planner would pay.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  // one shared build: constructing a query resolves its preflights, so
  // build each DataFrame once and reuse across the invariant checks
  private lazy val built: Seq[(String, DataFrame)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      n -> fn(spark, sfDir)
    }

  /** The root plan plus every cached subplan reachable through
    * InMemoryTableScan nodes: the graph tier's iteration steps live
    * INSIDE un-materialized InMemoryRelations (the final rank generation
    * is persisted, not yet built at plan time), where a plain
    * executedPlan.toString never looks — exactly where a lost
    * shuffle_hash hint silently degrades a step to SortMergeJoin.
    */
  private def withCachedSubplans(p: SparkPlan): Seq[SparkPlan] = {
    // AdaptiveSparkPlanExec and QueryStageExec are LEAF nodes wrapping
    // their real subtree in a field — collect() never descends on its
    // own, so expand them explicitly alongside the cached relations
    val nested = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q.plan
      case s: InMemoryTableScanExec =>
        s.relation.cachedPlan
    }
    p +: nested.flatMap(withCachedSubplans)
  }

  "every registered query plan" should "contain no SortMergeJoin (cached subplans included)" in {
    built.foreach { case (n, df) =>
      withCachedSubplans(df.queryExecution.executedPlan).foreach { p =>
        withClue(s"$n: ") {
          p.toString should not include "SortMergeJoin"
        }
      }
    }
  }

  /** Round-11 lock (graph-tier hint contract): the iteration-step joins
    * run over stats-less cached frames, where Catalyst's no-hint fallback
    * is SortMergeJoin — caught live once in round 10. PageRank-family
    * steps are visible through the nested cached plans above; HITS
    * half-steps materialize eagerly during build and leave no plan
    * behind, so the half-step SHAPE ([[graft.ops.Hits.rawHalfStep]] — the
    * exact method the iteration calls) is planned here over persisted
    * stats-less inputs, mirroring the real call site.
    */
  "the graph tier" should "expose its iteration steps to the SMJ check via cached subplans" in {
    // Since round 13 the REGISTRY wrappers return LocalRelations (pins and
    // checkpoint blocks released in-op — RegistryLifecycleSpec), so the
    // iteration steps are no longer reachable through the registry plans;
    // the lock moves to the operator-level lazy frame, exactly as the BM25
    // pre-materialization check below does.
    import spark.implicits._
    val edges = (0L until 60L)
      .flatMap(i => Seq((i, (i * 3 + 1) % 60), (i, (i * 7 + 2) % 60)))
      .toDF("src", "dst")
    // this lock is ABOUT the distributed iteration: pin that regime (a
    // 120-edge graph would otherwise take the round-14 local fast path
    // and return a LocalRelation with no joins to inspect)
    sys.props("graft.graph.localEdgesMax") = "0"
    try {
      Seq(
        "pageRank" -> graft.ops.PageRank.pageRankManaged(edges, "src", "dst", 5),
        "trustRank" -> graft.ops.PageRank.trustRankManaged(edges, "src", "dst",
          Seq(Tuple1(0L)).toDF("node"), "node", 5)
      ).foreach { case (n, m) =>
        try {
          val plans = withCachedSubplans(m.df.queryExecution.executedPlan)
          withClue(s"$n: iteration step not nested-visible — the SMJ lock " +
            "above would no longer cover it: ") {
            plans.size should be > 1
          }
          // the nested step must actually contain the per-iteration joins,
          // and none of them may have degraded to SortMergeJoin
          withClue(s"$n: ") {
            val strs = plans.map(_.toString)
            strs.count(s =>
              s.contains("ShuffledHashJoin") || s.contains("BroadcastHashJoin")
            ) should be >= 1
            strs.foreach(_ should not include "SortMergeJoin")
          }
        } finally m.release()
      }
    } finally sys.props -= "graft.graph.localEdgesMax"
  }

  it should "plan HITS half-steps as hash joins over stats-less cached inputs" in {
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = (0L until 50L).map(i => (i, (i * 7 + 1) % 50))
      .toDF("src", "dst").persist(lvl)
    val nodes = e.select(org.apache.spark.sql.functions.col("src").as("node"))
      .distinct().persist(lvl)
    val scores = nodes.withColumn("hub",
      org.apache.spark.sql.functions.lit(1000L))
    try {
      // beyond-broadcast regime (small=false): the shuffle_hash hint must
      // hold the stats-less cached side at ShuffledHashJoin, never SMJ
      val plan = graft.ops.Hits
        .rawHalfStep(e, scores, "hub", "src", "dst", small = false)
        .queryExecution.executedPlan.toString
      withClue(s"half-step plan:\n$plan\n") {
        plan should not include "SortMergeJoin"
        plan should include("ShuffledHashJoin")
      }
      // measured-small regime: the score side broadcasts — one shuffle
      // exchange (the groupBy) in the whole half-step. Plan with AQE off
      // for the count: the AQE wrapper's inputPlan is pre-EnsureRequirements
      // (no exchanges yet), while the non-adaptive executed plan carries
      // them; InMemoryTableScan stays a leaf, so cached build exchanges
      // (run once at pin time) don't count.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val bexec = graft.ops.Hits
          .rawHalfStep(e, scores, "hub", "src", "dst", small = true)
          .queryExecution.executedPlan
        withClue(s"broadcast half-step plan:\n$bexec\n") {
          bexec.toString should not include "SortMergeJoin"
          bexec.toString should include("BroadcastHashJoin")
          bexec.collect {
            case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
          }.size shouldBe 1
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    } finally {
      e.unpersist(false); nodes.unpersist(false)
    }
  }

  it should "plan BM25 scoring as a broadcast join (no SMJ) pre-materialization" in {
    // the public bm25 entry points collect the k-bounded result into a
    // LocalRelation (round-11 lifecycle fix), which removes the scoring
    // joins from their returned plans — lock the scoring SHAPE directly,
    // the same compensation as the HITS half-step probe
    import spark.implicits._
    val tf = Seq((1L, 10L, "spark", 2L), (2L, 8L, "merge", 1L))
      .toDF("doc_id", "dl", "token", "tf")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val plan = graft.ops.Retrieval
        .scoreBm25Plan(tf, "doc_id", Seq("spark", "merge"), 100L, 9.0)
        .queryExecution.executedPlan.toString
      withClue(s"bm25 scoring plan:\n$plan\n") {
        plan should not include "SortMergeJoin"
        plan should include("BroadcastHashJoin")
      }
    } finally tf.unpersist(false)
  }

  it should "contain no Scala UDFs" in {
    built.foreach { case (n, df) =>
      val udfs = df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.flatMap(_.collect { case u: ScalaUDF => u })
      }.flatten
      withClue(s"$n: ") { udfs shouldBe empty }
    }
  }

  it should "carry no heavy recompute guards in Filter conditions" in {
    def weight(e: Expression): Int = e.collect { case x => x }.size
    built.foreach { case (n, df) =>
      val hits = df.queryExecution.optimizedPlan.collect { case Filter(cond, _) =>
        cond.collect {
          case s @ Size(c, _) if !c.isInstanceOf[Attribute] && weight(c) > 4 =>
            s"size over ${c.simpleString(60)} (weight ${weight(c)})"
          case i @ IsNotNull(c) if !c.isInstanceOf[Attribute] && weight(c) > 8 =>
            s"isnotnull over ${c.simpleString(60)} (weight ${weight(c)})"
        }
      }.flatten
      withClue(s"$n: ") { hits shouldBe empty }
    }
  }

  /** Round-10 lock: the event-time family's audited shapes (PLANS.md
    * round-10 notes). These five queries were silently lost in round 9 when
    * the testdata generator changed events.ts INT64-nanos → TIMESTAMP_MICROS;
    * beyond merely planning again, their shuffle structure must not regress:
    * the adaptive ts conversion is scan-side Project work, so the exchange
    * counts are exactly the pre-drift audit's.
    */
  "the event-time query family" should "keep its audited exchange budget" in {
    // max Exchange nodes (shuffle + broadcast) in the pre-execution plan
    val budget = Map(
      "q_ext_asof_last_error" -> 3, // error-agg, union window, output sort
      "q_ext_sessionize" -> 2, // ONE user_id exchange shared by both windows
      "q_ext_running_total" -> 2, // same single-exchange window stack
      "q_ext_events_daily" -> 2, // partial->final agg + output sort
      "q_ext_session_outcomes" -> 2, // round 11: same single user_id exchange as sessionize
      "q_ext_funnel_timed" -> 13, // round 11: 3 type-filtered aggs + 2 step joins + 2 assemble joins + sort (incl. broadcasts)
      "q_ext_range_join_sessions" -> 4) // sessions stack + broadcast + sort
    val byName = built.toMap
    budget.foreach { case (n, cap) =>
      val plan = byName(n).queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      withClue(s"$n expected <= $cap exchanges, got $exchanges in:\n$plan\n") {
        exchanges should be <= cap
      }
    }
  }

  it should "keep the range join broadcast" in {
    val plan = built.toMap.apply("q_ext_range_join_sessions")
      .queryExecution.executedPlan.toString
    withClue(s"plan:\n$plan\n") {
      plan should include("BroadcastHashJoin")
    }
  }

  /** Round-10 lock: the bloom decontamination's load-bearing shapes — the
    * sketch predicate must prefilter scan-side (inside the plan at all:
    * losing it silently degrades to a full-corpus confirm join) and the
    * confirm must stay a shuffled-hash semi join, never sort-merge (the
    * operator exists for beyond-broadcast key sides; an SMJ would re-sort
    * both).
    */
  "the bloom decontamination plan" should "keep the sketch prefilter and SHJ confirm" in {
    val plan = built.toMap.apply("q_ext_bloom_decontaminate")
      .queryExecution.executedPlan.toString
    withClue(s"plan:\n${plan.take(4000)}\n") {
      plan should include("might_contain")
      plan should include("ShuffledHashJoin")
    }
  }

  "pushable registry filters" should "reach the parquet scan" in {
    val pushable = Map(
      "q_filter_isin" -> "In(l_returnflag",
      "q_filter_range_date" -> "GreaterThanOrEqual(o_orderdate")
    val byName = built.toMap
    pushable.foreach { case (n, marker) =>
      val s = byName(n).queryExecution.executedPlan.toString
      withClue(s"$n expected pushed marker '$marker' in:\n$s\n") {
        s should include(marker)
      }
    }
  }
}
