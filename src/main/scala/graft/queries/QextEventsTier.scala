package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._




/** The Events tier of the extension-query registry —
  * split from the monolithic Qext.scala (round-17 verdict item 7, pure
  * mechanical move: bodies unchanged). [[Qext]] composes the tiers; see
  * its scaladoc for the registry/oracle policy.
  */
private[queries] trait QextEventsTier { this: QextBase =>


  /** Conversion funnel per user: first signup, first purchase at-or-after
    * it, and the latency between them — the min-over-partition +
    * filtered-aggregate sequence shape. One shuffle on user_id; the
    * groupBy after the window reuses the partitioning (no second
    * exchange).
    */
  def qExtEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val tsUs = Sources.eventTsMicros(ev)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    ev.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
      .withColumn("signup_us",
        min(when(col("event_type") === "signup", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("ts_us") >= col("signup_us"))
      .groupBy("user_id", "signup_us")
      .agg(min("ts_us").as("purchase_us"))
      .withColumn("latency_us", col("purchase_us") - col("signup_us"))
      .orderBy("user_id")
  }


  /** Timed three-step funnel ([[Funnel.timedFunnel]]):
    * signup → click → purchase, each within 3 days of the previous
    * step's chosen event — first-touch greedy min-chains over integer
    * microsecond timestamps, so the whole computation is exactly
    * reproducible in SQL (the plain [[qExtEventFunnel]] keeps the
    * unbounded-gap two-step shape). 3 days cuts real chains at both
    * SFs (150/128/89 users per step at sf0.01; 1500/1112/819 at sf0.1),
    * so every `reached` tier occurs.
    */
  def qExtFunnelTimed(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.timedFunnel(
        ev.select(col("user_id"), col("event_type"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us",
        steps = Seq("signup", "click", "purchase"),
        maxGapUs = 3L * 86400000000L)
      .orderBy("user_id")
  }


  /** Funnel time-to-convert distribution: quartiles of the step1→step2
    * and step2→step3 latencies per reached-tier, over the
    * [[Funnel.timedFunnel]] chains — "how fast do converting users
    * move", the companion report to "how many convert". Exact
    * interpolated percentiles over integer microsecond latencies are
    * FP-exact in both engines (the [[qExtQuantilesByLang]] precedent);
    * tiers without a defined latency (reached=1 has no step2) emit NULL
    * quartiles in both.
    */
  def qExtFunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val probs = array(lit(0.25), lit(0.5), lit(0.75))
    Funnel.timedFunnel(
        ev.select(col("user_id"), col("event_type"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us",
        steps = Seq("signup", "click", "purchase"),
        maxGapUs = 3L * 86400000000L)
      .withColumn("lat12", (col("step2_us") - col("step1_us")).cast("double"))
      .withColumn("lat23", (col("step3_us") - col("step2_us")).cast("double"))
      .groupBy("reached")
      .agg(count(lit(1)).as("n_users"),
        percentile(col("lat12"), probs).as("__q12"),
        percentile(col("lat23"), probs).as("__q23"))
      .select(col("reached"), col("n_users"),
        col("__q12").getItem(0).as("lat12_p25"),
        col("__q12").getItem(1).as("lat12_p50"),
        col("__q12").getItem(2).as("lat12_p75"),
        col("__q23").getItem(0).as("lat23_p25"),
        col("__q23").getItem(1).as("lat23_p50"),
        col("__q23").getItem(2).as("lat23_p75"))
      .orderBy("reached")
  }


  /** Top 3-step event paths ([[Funnel.topPaths]]): every consecutive
    * (ts, event_id)-ordered triple per user is one occurrence; top 20 by
    * (count desc, path asc) — deterministic total order since paths are
    * unique per group. One user_id window exchange shared by both leads,
    * then a partial-combined count and TakeOrdered.
    */
  def qExtTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.topPaths(
      ev.select(col("user_id"), col("event_type"), col("event_id"),
        Sources.eventTsMicros(ev).as("ts_us")),
      "user_id", "event_type", "ts_us", col("event_id"), k = 3, topN = 20)
  }


  /** Last-touch attribution ([[Funnel.lastTouchAttribution]]): every
    * purchase credited to the latest click/view strictly before it and
    * within 1 day (ties → largest event_id — max over the (ts, id,
    * type) struct, deterministic), unattributed purchases kept as the
    * organic bucket. 1 day leaves ~57% attributed at both SFs, so both
    * buckets are populated. All-integer comparisons; the oracle
    * reproduces the same winner via max-ts then max-id chains.
    */
  def qExtAttributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.lastTouchAttribution(
        ev.select(col("user_id"), col("event_type"), col("event_id"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us", "event_id",
        convertType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 86400000000L)
      .orderBy("conv_id")
  }


  /** First-touch attribution ([[Funnel.firstTouchAttribution]]): the
    * last-touch mirror — each purchase credits the EARLIEST in-window
    * click/view (min over the (ts, id, type) struct, ties to the
    * smallest id), organic bucket kept. Same 1-day window, so both
    * buckets are populated at both SFs; the oracle reproduces the winner
    * via min-ts then min-id chains.
    */
  def qExtAttributionFirstTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.firstTouchAttribution(
        ev.select(col("user_id"), col("event_type"), col("event_id"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us", "event_id",
        convertType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 86400000000L)
      .orderBy("conv_id")
  }


  /** Multi-touch attribution ([[Funnel.multiTouchAttribution]]): every
    * in-window touch of each purchase with integer basis-point credit
    * under the linear and U-shaped position models — floor division plus
    * the remainder-to-last rule makes every credit a pure integer
    * function of the pair set, so the full report (positions, counts,
    * both credit columns) hash-matches the window-function SQL.
    */
  def qExtAttributionMulti(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.multiTouchAttribution(
        ev.select(col("user_id"), col("event_type"), col("event_id"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us", "event_id",
        convertType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 86400000000L)
      .orderBy("conv_id", "pos")
  }


  /** Time-decay attribution ([[Funnel.timeDecayAttribution]], 24 h window,
    * 6 h half-life): integer halvings by age make the exponential-decay
    * credit model bit-portable — every credit is exact integer arithmetic,
    * summing to exactly 10000 bp per conversion.
    */
  def qExtAttributionDecay(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Funnel.timeDecayAttribution(
        ev.select(col("user_id"), col("event_type"), col("event_id"),
          Sources.eventTsMicros(ev).as("ts_us")),
        "user_id", "event_type", "ts_us", "event_id",
        convertType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 86400000000L, halfLifeUs = 21600000000L)
      .orderBy("conv_id", "pos")
  }


  // ------------------------------------------------- events (JSON, time)

  /** As-of join showcase ([[AsofJoin.asofJoin]]): each event enriched with
    * the latest error event at-or-before it for the same user — exact
    * oracle via DuckDB's native ASOF JOIN. Errors are pre-deduped to one
    * per (user, ts) (max event_id) because ambiguous as-of matches are
    * undefined in both engines.
    */
  def qExtAsofLastError(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    val ev = events
      .select(col("event_id"), col("user_id"),
        Sources.eventTsMicros(events).as("ts_us"), col("event_type"))
    val err = ev.filter(col("event_type") === "error")
      .groupBy("user_id", "ts_us").agg(max("event_id").as("last_error_id"))
      .withColumn("last_error_us", col("ts_us"))
    AsofJoin.asofJoin(ev.drop("event_type"), err,
        keys = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us",
        payload = Seq("last_error_id", "last_error_us"))
      .orderBy("event_id")
  }


  def qExtJsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') as int)").as("k_int"))
      .orderBy("event_id")


  /** Event-time daily aggregation per user (the batch shape of the streaming
    * windowed count; ts converted via the type-adaptive Sources.eventTs).
    */
  def qExtEventsDaily(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    events
      .withColumn("day", Sources.eventTs(events).cast("date").cast("string"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"))
      .orderBy("user_id", "day")
  }


  /** Range join showcase ([[RangeJoin.rangeJoin]]): every event assigned to
    * its 30-minute-gap session by joining against the sessionize output's
    * [start_us, end_us] intervals per user. Sessions partition each user's
    * events, so the result has exactly one row per event — the invariant
    * the oracle (sessionize CTE + BETWEEN join) checks value-by-value.
    */
  def qExtRangeJoinSessions(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    val sessions = graft.streaming.EventStream.batchSessionize(
      events,
      tsMicros = Sources.eventTsMicros(events),
      tieBreak = col("event_id"),
      gapMicros = 30L * 60 * 1000000)
    // fresh scan for the probe side: `sessions` derives from `events`, and
    // a shared-lineage rangeJoin makes left("user_id") === right("user_id")
    // resolve to ONE attribute — Spark disambiguates the self-join but
    // warns 'trivially true equals predicate'; independent scans give the
    // join genuinely distinct attribute ids (same rows, same plan shape)
    val events2 = t(spark, dir, "events")
    val ev = events2
      .select(col("event_id"), col("user_id"),
        Sources.eventTsMicros(events2).as("ts_us"))
    RangeJoin.rangeJoin(ev, sessions, keys = Seq("user_id"),
        timeCol = "ts_us", startCol = "start_us", endCol = "end_us")
      .select("event_id", "user_id", "ts_us", "session_idx")
      .orderBy("event_id")
  }


  /** Batch gap sessionization (30-minute gap) over event time — the window
    * form of the streaming sessionizer; exact SQL oracle.
    */
  def qExtSessionize(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    graft.streaming.EventStream.batchSessionize(
        events,
        tsMicros = Sources.eventTsMicros(events),
        tieBreak = col("event_id"),
        gapMicros = 30L * 60 * 1000000)
      .orderBy("user_id", "session_idx")
  }


  /** Per-session outcome classification
    * ([[graft.streaming.EventStream.classifySessions]]): the
    * q_ext_sessionize stitching plus bounce / abandoned / converted
    * labels and integer durations — one shared user_id exchange, all
    * integer arithmetic, CASE precedence defined (conversion wins over
    * bounce). All three outcomes occur at both SFs.
    */
  def qExtSessionOutcomes(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
    graft.streaming.EventStream.classifySessions(
        events,
        tsMicros = Sources.eventTsMicros(events),
        tieBreak = col("event_id"),
        gapMicros = 30L * 60 * 1000000,
        convertType = "purchase")
      .orderBy("user_id", "session_idx")
  }


  /** Snapshot diff ([[SnapshotDiff.diff]]): yesterday's corpus (drops
    * doc_id % 10 == 0) vs today's (drops % 11 == 0, edits % 7 == 0), so
    * all four statuses occur. Content equality via the normalized md5
    * ([[TextDedup.contentHash]]); the DuckDB oracle is a literal
    * full-outer join — the form the engine's union+groupBy replaces.
    */
  def qExtSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val a = docs.filter(col("doc_id") % 10 =!= 0)
    val b = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(lit("v2 "), col("text"))).otherwise(col("text")))
    SnapshotDiff.diff(a, b, "doc_id", df => TextDedup.contentHash(df("text")))
      .orderBy("doc_id")
  }


  /** SCD2 history merge ([[Scd2.merge]]): the [[qExtSnapshotDiff]] drops
    * replayed as a version history — snapshot A bootstraps at 2026-01-01,
    * snapshot B merges at 2026-02-01, and the result is the full version
    * chain (closed betas, reopened v2s, deleted gammas, fresh deltas).
    * The oracle is the full-outer-join + two-branch-union form the
    * engine's single union+groupBy+explode replaces.
    */
  def qExtScd2(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val hashOf = (df: DataFrame) => TextDedup.contentHash(df("text"))
    val a = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val b = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(lit("v2 "), col("text"))).otherwise(col("text")))
      .select("doc_id", "text")
    val hist = Scd2.init(a, "doc_id", Seq("text"), hashOf, "2026-01-01")
    Scd2.merge(hist, b, "doc_id", Seq("text"), hashOf, "2026-02-01")
      .orderBy("doc_id", "valid_from")
  }


  /** SCD2 time-travel read ([[Scd2.asOf]]): the corpus as it stood
    * between the two [[qExtScd2]] drops — the "which text did run X
    * sample" audit query. Attribute-only predicates (pushable on a
    * stored history).
    */
  def qExtScd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val hashOf = (df: DataFrame) => TextDedup.contentHash(df("text"))
    val a = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val b = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(lit("v2 "), col("text"))).otherwise(col("text")))
      .select("doc_id", "text")
    val hist = Scd2.merge(
      Scd2.init(a, "doc_id", Seq("text"), hashOf, "2026-01-01"),
      b, "doc_id", Seq("text"), hashOf, "2026-02-01")
    Scd2.asOf(hist, "2026-01-15")
      .select("doc_id", "text", "valid_from")
      .orderBy("doc_id")
  }


  /** Markov transition matrix over the event stream: per ordered
    * (from_type → to_type) pair, count and transition probability — the
    * user-journey model behind next-action prediction and anomaly
    * flagging. One window (lead over the per-user time order, unique by
    * (ts_us, event_id) tie-break), one groupBy, an integer totals join;
    * probability is a single IEEE division per row.
    */
  def qExtEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy("ts_us", "event_id")
    val pairs = ev.select(col("user_id"), col("event_id"),
        col("event_type"), Sources.eventTsMicros(ev).as("ts_us"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
    pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }


  /** Weekly cohort retention: users bucketed by first-seen week (integer
    * epoch-day div 7 — no date_trunc, which disagrees on week starts
    * across engines), distinct actives per (cohort_week, week_offset).
    * All-integer output.
    */
  def qExtCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val weeksNamed = ev.select(col("user_id"),
        Sources.eventTsMicros(ev).as("__us"))
      .select(col("user_id"), expr(s"__us div ${86400000000L * 7}").as("week"))
      .distinct()
    val first = weeksNamed.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeksNamed.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private[queries] lazy val eventsTierQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ext_event_funnel" -> (qExtEventFunnel _),
    "q_ext_funnel_timed" -> (qExtFunnelTimed _),
    "q_ext_funnel_latency" -> (qExtFunnelLatency _),
    "q_ext_attribution_last_touch" -> (qExtAttributionLastTouch _),
    "q_ext_attribution_first_touch" -> (qExtAttributionFirstTouch _),
    "q_ext_attribution_multi" -> (qExtAttributionMulti _),
    "q_ext_attribution_decay" -> (qExtAttributionDecay _),
    "q_ext_top_paths" -> (qExtTopPaths _),
    "q_ext_json_extract" -> (qExtJsonExtract _),
    "q_ext_events_daily" -> (qExtEventsDaily _),
    "q_ext_asof_last_error" -> (qExtAsofLastError _),
    "q_ext_sessionize" -> (qExtSessionize _),
    "q_ext_session_outcomes" -> (qExtSessionOutcomes _),
    "q_ext_range_join_sessions" -> (qExtRangeJoinSessions _),
    "q_ext_snapshot_diff" -> (qExtSnapshotDiff _),
    "q_ext_scd2" -> (qExtScd2 _),
    "q_ext_scd2_asof" -> (qExtScd2AsOf _),
    "q_ext_event_transitions" -> (qExtEventTransitions _),
    "q_ext_cohort_retention" -> (qExtCohortRetention _),
  )

  private[queries] lazy val eventsTierOracles: Map[String, String] = Map(
    "q_ext_event_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s AS (
        |  SELECT user_id, min(ts_us) AS signup_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id
        |)
        |SELECT ev.user_id, s.signup_us, min(ev.ts_us) AS purchase_us,
        |       min(ev.ts_us) - s.signup_us AS latency_us
        |FROM ev JOIN s USING (user_id)
        |WHERE ev.event_type = 'purchase' AND ev.ts_us >= s.signup_us
        |GROUP BY ev.user_id, s.signup_us
        |ORDER BY ev.user_id""".stripMargin,

    // Same lead chain over the same (ts_us, event_id) per-user order;
    // ranking (count desc, path asc) is a total order — LIMIT-safe.
    "q_ext_top_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), led AS (
        |  SELECT event_type AS t0,
        |         lead(event_type, 1) OVER w AS t1,
        |         lead(event_type, 2) OVER w AS t2
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |)
        |SELECT t0 || ' > ' || t1 || ' > ' || t2 AS path,
        |       count(*) AS n_occurrences
        |FROM led WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY 1
        |ORDER BY n_occurrences DESC, path ASC
        |LIMIT 20""".stripMargin,

    // Winner = max touch ts then max event_id — the same lexicographic
    // (ts, id) choice the engine's max-over-struct makes; event_id is
    // globally unique, so the type lookup by id is exact.
    "q_ext_attribution_last_touch" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_us, event_id AS conv_id FROM ev
        |  WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id, ts_us AS t_us, event_id AS t_id, event_type AS t_type
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pairs AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id, t.t_us, t.t_id
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.t_us < c.conv_us AND t.t_us >= c.conv_us - 86400000000
        |), win AS (
        |  SELECT conv_id, max(t_us) AS touch_us FROM pairs GROUP BY conv_id
        |), win2 AS (
        |  SELECT p.conv_id, w.touch_us, max(p.t_id) AS touch_id
        |  FROM pairs p JOIN win w ON p.conv_id = w.conv_id AND p.t_us = w.touch_us
        |  GROUP BY p.conv_id, w.touch_us
        |)
        |SELECT c.user_id, c.conv_us, c.conv_id, w2.touch_us, w2.touch_id,
        |       t.t_type AS touch_type
        |FROM conv c
        |LEFT JOIN win2 w2 ON c.conv_id = w2.conv_id
        |LEFT JOIN touch t ON w2.touch_id = t.t_id
        |ORDER BY c.conv_id""".stripMargin,

    // Winner = min touch ts then min event_id — the engine's
    // min-over-struct mirror of the last-touch rule.
    "q_ext_attribution_first_touch" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_us, event_id AS conv_id FROM ev
        |  WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id, ts_us AS t_us, event_id AS t_id, event_type AS t_type
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pairs AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id, t.t_us, t.t_id
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.t_us < c.conv_us AND t.t_us >= c.conv_us - 86400000000
        |), win AS (
        |  SELECT conv_id, min(t_us) AS touch_us FROM pairs GROUP BY conv_id
        |), win2 AS (
        |  SELECT p.conv_id, w.touch_us, min(p.t_id) AS touch_id
        |  FROM pairs p JOIN win w ON p.conv_id = w.conv_id AND p.t_us = w.touch_us
        |  GROUP BY p.conv_id, w.touch_us
        |)
        |SELECT c.user_id, c.conv_us, c.conv_id, w2.touch_us, w2.touch_id,
        |       t.t_type AS touch_type
        |FROM conv c
        |LEFT JOIN win2 w2 ON c.conv_id = w2.conv_id
        |LEFT JOIN touch t ON w2.touch_id = t.t_id
        |ORDER BY c.conv_id""".stripMargin,

    // Integer basis-point credits: floor division + remainder-to-last is
    // the normative definition, so both models are exact BIGINTs in any
    // engine; positions by (t_us, t_id) window order, organic bucket via
    // NOT EXISTS with pos=0.
    "q_ext_attribution_multi" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_us, event_id AS conv_id FROM ev
        |  WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id, ts_us AS t_us, event_id AS t_id, event_type AS t_type
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pairs AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id, t.t_us, t.t_id, t.t_type
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.t_us < c.conv_us AND t.t_us >= c.conv_us - 86400000000
        |), pos AS (
        |  SELECT user_id, conv_us, conv_id, t_us, t_id, t_type,
        |         CAST(row_number() OVER (PARTITION BY conv_id
        |           ORDER BY t_us, t_id) AS BIGINT) AS pos,
        |         count(*) OVER (PARTITION BY conv_id) AS n_touches
        |  FROM pairs
        |), credited AS (
        |  SELECT user_id, conv_us, conv_id, t_us AS touch_us,
        |         t_id AS touch_id, t_type AS touch_type, pos, n_touches,
        |         CAST(CASE WHEN pos = n_touches
        |           THEN 10000 - (n_touches - 1) * (10000 // n_touches)
        |           ELSE 10000 // n_touches END AS BIGINT)
        |           AS credit_bp_linear,
        |         CAST(CASE WHEN n_touches = 1 THEN 10000
        |           WHEN n_touches = 2 THEN 5000
        |           WHEN pos = 1 THEN 4000
        |           WHEN pos = n_touches
        |             THEN 6000 - (n_touches - 2) * (2000 // (n_touches - 2))
        |           ELSE 2000 // (n_touches - 2) END AS BIGINT)
        |           AS credit_bp_position
        |  FROM pos
        |), organic AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id,
        |         CAST(NULL AS BIGINT) AS touch_us,
        |         CAST(NULL AS BIGINT) AS touch_id,
        |         CAST(NULL AS VARCHAR) AS touch_type,
        |         CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n_touches,
        |         CAST(10000 AS BIGINT) AS credit_bp_linear,
        |         CAST(10000 AS BIGINT) AS credit_bp_position
        |  FROM conv c
        |  WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.conv_id = c.conv_id)
        |)
        |SELECT * FROM credited
        |UNION ALL SELECT * FROM organic
        |ORDER BY conv_id, pos""".stripMargin,

    // Time-decay credits: integer halvings by age (>> with a 13-halving
    // floor), floored shares, remainder to the LAST touch — bit-portable
    // exponential decay, summing to exactly 10000 bp per conversion.
    "q_ext_attribution_decay" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_us, event_id AS conv_id FROM ev
        |  WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id, ts_us AS t_us, event_id AS t_id, event_type AS t_type
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pairs AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id, t.t_us, t.t_id, t.t_type,
        |         CAST(least((c.conv_us - t.t_us) // 21600000000, 13) AS BIGINT)
        |           AS halvings
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.t_us < c.conv_us AND t.t_us >= c.conv_us - 86400000000
        |), pos AS (
        |  SELECT *, CAST(10000 >> halvings AS BIGINT) AS weight,
        |         CAST(row_number() OVER (PARTITION BY conv_id
        |           ORDER BY t_us, t_id) AS BIGINT) AS pos,
        |         count(*) OVER (PARTITION BY conv_id) AS n_touches,
        |         sum(CAST(10000 >> halvings AS BIGINT))
        |           OVER (PARTITION BY conv_id) AS wsum
        |  FROM pairs
        |), cr AS (
        |  SELECT *, CAST(10000 * weight // wsum AS BIGINT) AS c,
        |         sum(CAST(10000 * weight // wsum AS BIGINT))
        |           OVER (PARTITION BY conv_id) AS csum
        |  FROM pos
        |), credited AS (
        |  SELECT user_id, conv_us, conv_id, t_us AS touch_us, t_id AS touch_id,
        |         t_type AS touch_type, pos, n_touches, halvings, weight,
        |         CAST(CASE WHEN pos = n_touches THEN 10000 - csum + c
        |              ELSE c END AS BIGINT) AS credit_bp_decay
        |  FROM cr
        |), organic AS (
        |  SELECT c.user_id, c.conv_us, c.conv_id,
        |         CAST(NULL AS BIGINT) AS touch_us,
        |         CAST(NULL AS BIGINT) AS touch_id,
        |         CAST(NULL AS VARCHAR) AS touch_type,
        |         CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS n_touches,
        |         CAST(0 AS BIGINT) AS halvings, CAST(0 AS BIGINT) AS weight,
        |         CAST(10000 AS BIGINT) AS credit_bp_decay
        |  FROM conv c
        |  WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.conv_id = c.conv_id)
        |)
        |SELECT * FROM credited UNION ALL SELECT * FROM organic
        |ORDER BY conv_id, pos""".stripMargin,

    // First-touch greedy min-chains over integer microseconds — the
    // timed-funnel definition is the same chain in both engines.
    "q_ext_funnel_timed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts_us) AS step1_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT ev.user_id, min(ev.ts_us) AS step2_us
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE ev.event_type = 'click' AND ev.ts_us > s1.step1_us
        |    AND ev.ts_us <= s1.step1_us + 259200000000
        |  GROUP BY ev.user_id
        |), s3 AS (
        |  SELECT ev.user_id, min(ev.ts_us) AS step3_us
        |  FROM ev JOIN s2 USING (user_id)
        |  WHERE ev.event_type = 'purchase' AND ev.ts_us > s2.step2_us
        |    AND ev.ts_us <= s2.step2_us + 259200000000
        |  GROUP BY ev.user_id
        |)
        |SELECT s1.user_id, s1.step1_us, s2.step2_us, s3.step3_us,
        |       1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
        |         AS reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,

    // The funnel chain + quantile_cont: same two-sided interpolation as
    // Spark's percentile over integer-derived doubles → FP-exact; tiers
    // with no defined latency yield NULL quartiles in both engines.
    "q_ext_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts_us) AS step1_us FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT ev.user_id, min(ev.ts_us) AS step2_us
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE ev.event_type = 'click' AND ev.ts_us > s1.step1_us
        |    AND ev.ts_us <= s1.step1_us + 259200000000
        |  GROUP BY ev.user_id
        |), s3 AS (
        |  SELECT ev.user_id, min(ev.ts_us) AS step3_us
        |  FROM ev JOIN s2 USING (user_id)
        |  WHERE ev.event_type = 'purchase' AND ev.ts_us > s2.step2_us
        |    AND ev.ts_us <= s2.step2_us + 259200000000
        |  GROUP BY ev.user_id
        |), chains AS (
        |  SELECT s1.user_id,
        |         1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
        |           AS reached,
        |         CAST(s2.step2_us - s1.step1_us AS DOUBLE) AS lat12,
        |         CAST(s3.step3_us - s2.step2_us AS DOUBLE) AS lat23
        |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |)
        |SELECT reached, count(*) AS n_users,
        |       quantile_cont(lat12, 0.25) AS lat12_p25,
        |       quantile_cont(lat12, 0.5) AS lat12_p50,
        |       quantile_cont(lat12, 0.75) AS lat12_p75,
        |       quantile_cont(lat23, 0.25) AS lat23_p25,
        |       quantile_cont(lat23, 0.5) AS lat23_p50,
        |       quantile_cont(lat23, 0.75) AS lat23_p75
        |FROM chains GROUP BY reached
        |ORDER BY reached""".stripMargin,

    // Exact integer arithmetic end-to-end: BIGINT prefix sums, HUGEINT
    // products — the stride walk is bit-identical to the engine's BigInt
    // form at any k and weight scale.
    "q_ext_json_extract" ->
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    "q_ext_asof_last_error" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
        |  FROM events
        |), err AS (
        |  SELECT user_id, ts_us AS err_us, max(event_id) AS last_error_id
        |  FROM ev WHERE event_type = 'error' GROUP BY user_id, ts_us
        |)
        |SELECT e.event_id, e.user_id, e.ts_us,
        |       r.last_error_id, r.err_us AS last_error_us
        |FROM ev e ASOF LEFT JOIN err r
        |  ON e.user_id = r.user_id AND e.ts_us >= r.err_us
        |ORDER BY e.event_id""".stripMargin,

    "q_ext_sessionize" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ordered
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), numbered AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM numbered GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // Sessionize CTEs + per-type conversion count folded into the same
    // aggregate; CASE precedence mirrors the engine's definition
    "q_ext_session_outcomes" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ordered
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), numbered AS (
        |  SELECT user_id, event_type, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged
        |), sessions AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |         min(ts_us) AS start_us, max(ts_us) AS end_us,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_conversions
        |  FROM numbered GROUP BY user_id, session_idx
        |)
        |SELECT user_id, session_idx, n_events, start_us, end_us, n_conversions,
        |       end_us - start_us AS duration_us,
        |       CASE WHEN n_conversions > 0 THEN 'converted'
        |            WHEN n_events = 1 THEN 'bounce'
        |            ELSE 'abandoned' END AS outcome
        |FROM sessions
        |ORDER BY user_id, session_idx""".stripMargin,

    // Sessionize CTEs (same as q_ext_sessionize) + key-equality BETWEEN
    // join: each event lands in exactly one of its user's sessions.
    "q_ext_range_join_sessions" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ordered
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), numbered AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged
        |), sessions AS (
        |  SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM numbered GROUP BY user_id, session_idx
        |)
        |SELECT e.event_id, e.user_id, e.ts_us, s.session_idx
        |FROM ordered e JOIN sessions s
        |  ON e.user_id = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us
        |ORDER BY e.event_id""".stripMargin,

    "q_ext_events_daily" ->
      """SELECT user_id,
        |  CAST(CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS VARCHAR) AS day,
        |  count(*) AS n_events,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |FROM events GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,

    // BM25 mirror of Retrieval.bm25: rational idf, fixed-order term sum.
    // Every fractional literal is ::DOUBLE (DuckDB parses bare 0.5 as
    // DECIMAL, whose arithmetic is exact-decimal, not IEEE); expression
    // association matches the Scala Column build token for token, so each
    // double op is the same correctly-rounded operation in both engines.
    "q_ext_snapshot_diff" ->
      s"""WITH a AS (
         |  SELECT doc_id, md5($normSql) AS h
         |  FROM documents WHERE doc_id % 10 <> 0
         |), b0 AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 0
         |), b AS (SELECT doc_id, md5($normSql) AS h FROM b0)
         |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |       a.h AS hash_a, b.h AS hash_b,
         |       CASE WHEN a.h IS NULL THEN 'added'
         |            WHEN b.h IS NULL THEN 'removed'
         |            WHEN a.h = b.h THEN 'unchanged'
         |            ELSE 'changed' END AS status
         |FROM a FULL JOIN b ON a.doc_id = b.doc_id
         |ORDER BY doc_id""".stripMargin,

    // Generated CTE chain, one (pairs, best, rewrite) level per BPE
    // iteration — the same greedy leftmost-non-overlapping replace
    // semantics as Bpe.applyMerge (DuckDB replace == Java replace:
    // literal, no rescan of replaced output).
    "q_ext_event_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000 AS ts_us FROM events
        |), nxt AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts_us, event_id) AS to_type
        |  FROM ev
        |), pairs AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
        |), tot AS (
        |  SELECT from_type, sum(n)::BIGINT AS n_from FROM pairs GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n, t.n_from,
        |       round(p.n::DOUBLE / t.n_from, 6) AS p
        |FROM pairs p JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // Integer week buckets (epoch-micros div 7 days) — date_trunc week
    // starts disagree across engines; distinct-count output only.
    "q_ext_cohort_retention" ->
      s"""WITH wk AS (
         |  SELECT DISTINCT user_id,
         |         (epoch_ns(ts) // 1000) // ${86400000000L * 7} AS week
         |  FROM events
         |), first AS (
         |  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
         |SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
         |       count(DISTINCT w.user_id)::BIGINT AS n_users
         |FROM wk w JOIN first f USING (user_id)
         |GROUP BY f.cohort_week, week_offset
         |ORDER BY cohort_week, week_offset""".stripMargin,

    // Same cosine/rank shape as the q_ext_sim_topk oracle with the
    // other-label predicate; cand_label travels to the output.
    "q_ext_scd2_asof" ->
      """SELECT doc_id, text, '2026-01-01' AS valid_from
        |FROM documents WHERE doc_id % 10 <> 0
        |ORDER BY doc_id""".stripMargin,

    // SCD2 as the literal full-outer-join + branch-union the engine's
    // union+groupBy+explode replaces: old-version branch (close on change
    // or delete) plus new-version branch (open on change or insert).
    "q_ext_scd2" ->
      s"""WITH a AS (
         |  SELECT doc_id, text, md5($normSql) AS h
         |  FROM documents WHERE doc_id % 10 <> 0
         |), b0 AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 0
         |), b AS (SELECT doc_id, text, md5($normSql) AS h FROM b0),
         |j AS (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         a.text AS text_a, a.h AS ha, b.text AS text_b, b.h AS hb
         |  FROM a FULL JOIN b ON a.doc_id = b.doc_id)
         |SELECT doc_id, text_a AS text, ha AS content_hash,
         |       '2026-01-01' AS valid_from,
         |       CASE WHEN hb IS NULL OR hb <> ha THEN '2026-02-01' END AS valid_to,
         |       (hb IS NOT NULL AND hb = ha) AS is_current
         |FROM j WHERE ha IS NOT NULL
         |UNION ALL
         |SELECT doc_id, text_b, hb, '2026-02-01', NULL, true
         |FROM j WHERE hb IS NOT NULL AND (ha IS NULL OR ha <> hb)
         |ORDER BY doc_id, valid_from""".stripMargin,

    // Hybrid RRF: the sparse leg is the BM25 CTE (top 50 + rank), the
    // dense leg mirrors q_ext_sim_topk's cosine with query vec_id = 0;
    // fusion is 1/(60+rank) with missing legs contributing 0. DuckDB may
    // use a real FULL JOIN here — the engine's union+groupBy form exists
    // precisely because full outer cannot broadcast in Spark.
  )
}
