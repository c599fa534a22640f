package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming data-intake drift monitor: the unbounded form of
  * [[graft.ops.Profiler.drift]]. Each event-time window of the arriving
  * stream is profiled per column (row/null counts, min/max as strings —
  * the [[graft.ops.Profiler.profile]] shape) with ONE windowed
  * aggregation, and each closed window's per-column stats are compared
  * against a static reference profile by a stream-static broadcast join —
  * so "the generator/upstream changed" (the round-9 events.ts class of
  * breakage) surfaces as a flagged row at window-close latency instead of
  * a downstream failure hours later.
  *
  * Scale shape: the windowed agg carries O(monitored columns) state per
  * open window (counts + two extremum strings per column — no sketches,
  * no row retention); the reference side is one row per column, always
  * broadcast. Append mode end-to-end: windows emit once, on watermark
  * close, and the per-column explode + join are stateless over the closed
  * aggregates.
  */
object DriftStream {

  /** Per-window per-column intake profile of `cols` over event-time
    * `tsCol`: (window_start, window_end, column, n_rows, n_nulls, min,
    * max), emitted when the watermark closes the window. min/max are
    * cast to string (the [[graft.ops.Profiler.profile]] convention) so
    * one frame carries any column type.
    */
  def windowProfile(rows: DataFrame, tsCol: String, watermark: String,
                    windowLen: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "monitor at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        // HLL++ sketch state, O(1) per column per open window; exact in
        // the sparse regime (small cardinalities — the categorical-guard
        // case), ±rsd at scale (drift() applies a tolerance band)
        approx_count_distinct(col(c)).as(s"__nd_$c"))
    }
    val w = rows.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("__n"), aggs: _*)
    // one output row per (window, column): stack the per-column stat
    // tuples — stateless over the closed aggregate, stays append-mode
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"),
        col(s"__nd_$c").as("n_distinct"))
    }
    w.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("__n").as("n_rows"),
        explode(array(stacked: _*)).as("s"))
      .select(col("window_start"), col("window_end"), col("s.column"),
        col("n_rows"), col("s.n_nulls"), col("s.min"), col("s.max"),
        col("s.n_distinct"))
  }

  /** Per-window per-column quantiles of numeric `cols` over event-time
    * `tsCol` — the distribution half of the intake monitor ([[windowProfile]]
    * covers counts/nulls/extrema/distincts; a distribution can shift
    * arbitrarily inside fixed bounds, which only quantiles catch). One row
    * per (window, column): (window_start, window_end, column, n_rows, then
    * one `p<prob>` column per requested probability, named exactly like
    * [[graft.ops.Profiler.quantiles]] so a blessed Profiler snapshot is
    * directly joinable as the reference).
    *
    * State shape: ONE windowed aggregation whose per-open-window state is
    * O(cols × accuracy) sketch entries (`percentile_approx`, a mergeable
    * KLL-style summary — default accuracy 1000 keeps streaming state small;
    * an all-null window yields null quantiles). Append mode end-to-end: the
    * per-column explode is stateless over the closed aggregate.
    */
  def windowQuantiles(rows: DataFrame, tsCol: String, watermark: String,
                      windowLen: String, cols: Seq[String],
                      probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
                      accuracy: Int = 1000): DataFrame = {
    require(cols.nonEmpty && probs.nonEmpty, "need at least one column and prob")
    require(probs.forall(p => p >= 0 && p <= 1), s"probs must be in [0,1]: $probs")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val probsArr = array(probs.map(lit): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), probsArr, lit(accuracy))
        .as(s"__q_$c"))
    val w = rows.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("__n"), aggs: _*)
    val names = probs.map(graft.ops.Profiler.probName)
    val stacked = cols.map { c =>
      struct(lit(c).as("column") +: names.zipWithIndex.map { case (nm, i) =>
        // element_at on a null array (all-null window) is null, never an
        // ANSI index error: the index is a constant inside bounds
        element_at(col(s"__q_$c"), i + 1).as(nm)
      }: _*)
    }
    w.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("__n").as("n_rows"),
        explode(array(stacked: _*)).as("s"))
      .select(Seq(col("window_start"), col("window_end"), col("s.column"),
        col("n_rows")) ++ names.map(nm => col(s"s.$nm").as(nm)): _*)
  }

  /** Per-window per-value counts of low-cardinality `cols` over event-time
    * `tsCol` — the categorical leg of the intake monitor: (window_start,
    * window_end, column, value, n), values rendered as strings
    * ([[graft.ops.Profiler.categories]]' convention, so a blessed
    * categories snapshot is directly joinable as [[categoryDrift]]'s
    * reference). ONE windowed aggregation (stack column/value pairs
    * statelessly, then group by window × column × value); per-open-window
    * state is O(Σ per-column cardinality) count cells — low-cardinality
    * columns by contract. NULLs are excluded (the null-fraction rule's
    * jurisdiction); an all-null window emits no rows for that column.
    * Append mode end-to-end.
    */
  def windowCategories(rows: DataFrame, tsCol: String, watermark: String,
                       windowLen: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "monitor at least one column")
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value")))
    rows.withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(array(stacked: _*)).as("s"))
      .filter(col("s.value").isNotNull)
      .groupBy(window(col(tsCol), windowLen),
        col("s.column").as("column"), col("s.value").as("value"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("column"), col("value"),
        col("n"))
  }

  /** Flag each closed window's per-column VALUE MIX against a static
    * reference categories snapshot ([[graft.ops.Profiler.categories]]
    * output of the blessed intake): drift when the total-variation
    * distance `TV = ½ Σ_v |p_v − q_v|` between the window's value
    * frequencies p and the reference's q exceeds `tvTol` — the standard
    * third leg after the profile escape rules and the quantile band: a
    * source silently FLIPPING its `lang`/`source` mix inside fixed bounds
    * moves no extremum, no null count, and (below the distinct tolerance)
    * no cardinality, but moves TV by exactly the flipped mass.
    *
    * The sum runs over the UNION of value sets without materializing it:
    * a left join covers v ∈ window (reference-missing values contribute
    * their full window mass), and the reference-only remainder is
    * `1 − Σ_{matched} q_v` (q sums to 1). A column absent from the
    * reference has every q_v null → TV = 1 → flags; `tvTol` must be < 1
    * so that degenerate case can never pass. Input `categories` is closed
    * per-window aggregates ([[windowCategories]] output, or a whole-batch
    * frame with null window bounds — grouping treats null bounds as one
    * group, so the batch form needs no special casing). Unlike
    * [[drift]]/[[quantileDrift]] (join-only, stateless), the TV sum is an
    * AGGREGATION — on a live stream apply it inside `foreachBatch` over
    * [[windowCategories]]' closed output (append mode emits each window
    * exactly once, so per-batch TV is computed on whole windows), which is
    * exactly how [[graft.pipelines.CorpusPrepStream]] wires it. Cost:
    * frame algebra over windows × columns × cardinality rows — closed
    * aggregates, not raw data.
    */
  def categoryDrift(categories: DataFrame, reference: DataFrame,
                    tvTol: Double = 0.1): DataFrame = {
    require(tvTol >= 0 && tvTol < 1,
      s"tvTol must be in [0,1) — at 1 a reference-missing column would " +
        s"pass: $tvTol")
    val refCounts = reference.select(col("column"),
      col("value").cast("string").as("value"),
      col("n").cast("double").as("__rn"))
    val refTotals = refCounts.groupBy("column").agg(sum("__rn").as("__rtot"))
    val ref = broadcast(refCounts.join(refTotals, "column")
      .select(col("column"), col("value"),
        (col("__rn") / col("__rtot")).as("__q")))
    // per-(window, column) totals via a window function, NOT a self-join:
    // the whole-batch form carries null window bounds, which partitionBy
    // groups together but join equality would drop
    val byWinCol = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start", "window_end", "column")
    categories.select(col("window_start"), col("window_end"), col("column"),
        col("value").cast("string").as("value"),
        col("n").cast("double").as("__wn"))
      .withColumn("__wtot", sum("__wn").over(byWinCol))
      .join(ref, Seq("column", "value"), "left")
      .groupBy("window_start", "window_end", "column")
      .agg(sum("__wn").cast("long").as("n_rows"),
        count(lit(1)).as("n_values"),
        sum(abs(col("__wn") / col("__wtot")
          - coalesce(col("__q"), lit(0.0)))).as("__l1w"),
        sum(coalesce(col("__q"), lit(0.0))).as("__qm"))
      // verdict on the UNROUNDED distance — rounding is display-only (a
      // true TV within 5e-7 above the tolerance must still flag)
      .withColumn("__tv",
        (col("__l1w") + greatest(lit(0.0), lit(1.0) - col("__qm"))) / 2.0)
      .withColumn("drift", coalesce(col("__tv") > tvTol, lit(true)))
      .withColumn("tv", round(col("__tv"), 6))
      .select(col("window_start"), col("window_end"), col("column"),
        col("n_rows"), col("n_values"), col("tv"), col("drift"))
  }

  /** Flag each closed window's per-column MEDIAN against a static reference
    * quantile profile ([[graft.ops.Profiler.quantiles]] output of the
    * blessed snapshot): drift when the window median escapes the
    * reference's [lo, hi] band widened by `bandTol` × (hi − lo) on each
    * side. A band rule, not equality — per-window medians of a healthy
    * stream wander inside the blessed IQR; only a distribution SHIFT walks
    * the median past the widened tails. Columns missing from the reference,
    * all-null windows, and degenerate references (null band edges) all
    * flag: an unadjudicable window is a drifted window.
    */
  def quantileDrift(windowed: DataFrame, reference: DataFrame,
                    bandTol: Double = 0.25, lo: String = "p25",
                    mid: String = "p50", hi: String = "p75"): DataFrame = {
    require(bandTol >= 0, s"bandTol must be >= 0: $bandTol")
    val ref = broadcast(reference.select(col("column"),
      col(lo).cast("double").as("ref_lo"), col(mid).cast("double").as("ref_mid"),
      col(hi).cast("double").as("ref_hi")))
    val band = (col("ref_hi") - col("ref_lo")) * lit(bandTol)
    windowed.join(ref, Seq("column"), "left")
      .withColumn("drift", coalesce(
        col(mid) < col("ref_lo") - band || col(mid) > col("ref_hi") + band,
        lit(true))) // null anywhere (no ref / all-null window) → flagged
      .select(col("window_start"), col("window_end"), col("column"),
        col("n_rows"), col(mid).as("window_mid"), col("ref_lo"),
        col("ref_mid"), col("ref_hi"), col("drift"))
  }

  /** Flag each closed window's columns against a static `reference`
    * profile ([[graft.ops.Profiler.profile]] output of the blessed
    * snapshot): drift when the column is missing from the reference, its
    * null fraction moves by more than `nullFracTol`, its min/max fall
    * OUTSIDE the reference bounds, or its distinct count EXCEEDS the
    * reference's by more than `distinctTol`× (new category values — a
    * window being a SAMPLE can only lose distincts, never legitimately
    * gain past the blessed full set; the tolerance absorbs HLL error at
    * large cardinalities). Escape rules, not equality — equality on
    * extrema/distincts would false-positive every window. Same
    * null-fraction algebra as [[graft.ops.Profiler.drift]].
    */
  def drift(windowed: DataFrame, reference: DataFrame,
            nullFracTol: Double = 0.01,
            distinctTol: Double = 1.05): DataFrame = {
    require(nullFracTol >= 0, s"nullFracTol must be >= 0: $nullFracTol")
    require(distinctTol >= 1, s"distinctTol must be >= 1: $distinctTol")
    val ref = broadcast(reference.select(
      col("column"),
      when(col("n_rows") > 0, col("n_nulls").cast("double") / col("n_rows"))
        .otherwise(lit(0.0)).as("ref_null_frac"),
      col("min").as("ref_min"), col("max").as("ref_max"),
      col("n_distinct").as("ref_distinct")))
    // extrema live as strings (any-type frame): compare numerically when
    // BOTH sides parse as numbers — lexicographic order is wrong there
    // ("9" > "10") — and as strings otherwise
    def outside(v: String, bound: String, below: Boolean): Column = {
      val vn = expr(s"try_cast($v AS double)")
      val bn = expr(s"try_cast($bound AS double)")
      when(vn.isNotNull && bn.isNotNull, if (below) vn < bn else vn > bn)
        .otherwise(if (below) col(v) < col(bound) else col(v) > col(bound))
    }
    windowed.join(ref, Seq("column"), "left")
      .withColumn("null_frac",
        when(col("n_rows") > 0, col("n_nulls").cast("double") / col("n_rows"))
          .otherwise(lit(0.0)))
      .withColumn("drift",
        col("ref_null_frac").isNull ||
          abs(col("null_frac") - col("ref_null_frac")) > nullFracTol ||
          outside("min", "ref_min", below = true) ||
          outside("max", "ref_max", below = false) ||
          col("n_distinct").cast("double") >
            col("ref_distinct").cast("double") * lit(distinctTol))
      .select(col("window_start"), col("window_end"), col("column"),
        col("n_rows"), col("null_frac"), col("ref_null_frac"),
        col("min"), col("max"), col("ref_min"), col("ref_max"),
        col("n_distinct"), col("ref_distinct"), col("drift"))
  }
}
