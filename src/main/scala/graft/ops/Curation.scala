package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation primitives: per-group caps, fixed-schema pivot counts,
  * and per-group quantile tiers. The reference (payroll ETL) has no
  * counterpart; these are the curation steps between cleaning and packing
  * in a training-data pipeline (cap a dominant domain, inspect the
  * lang × source matrix, tier documents for curriculum selection).
  */
object Curation {

  /** Temperature-rebalanced mixture weights at α = 1/2: the sampling
    * distribution over groups is p_g ∝ n_g^α — the standard multilingual /
    * multi-source upsampling curve (α = 1 is proportional, α = 0 uniform;
    * 1/2 sits between, boosting small groups without drowning large ones).
    * α is FIXED at 1/2 because sqrt is the one power IEEE requires
    * correctly rounded — the weights are bit-reproducible cross-engine,
    * where a pow(n, 0.3) would not be.
    *
    * Output per group: `n`, `w` = round(√n, 6), `rate` (normalized — the
    * group's share of draws; w summed as DECIMAL so the total is exact and
    * order-independent), and `boost` = rate·N/n (the up/down-sampling
    * factor vs proportional: >1 means upsample). Feed `rate` × budget into
    * [[Sampling.systematicWeighted]] (or a per-group cap) to realize the
    * mixture.
    *
    * Scale: one partial-agg count shuffle of \|groups\| rows + a 1-row
    * broadcast — nothing touches the corpus twice.
    */
  def sqrtTemperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val w = counts.withColumn("w", round(sqrt(col("n")), 6))
    val tot = w.agg(sum(col("w").cast("decimal(38,6)")).as("__W"),
      sum("n").as("__N"))
    w.crossJoin(broadcast(tot))
      .withColumn("rate", round(col("w") / col("__W").cast("double"), 6))
      .withColumn("boost", round(col("rate") * col("__N") / col("n"), 6))
      .select(col(groupCol), col("n"), col("w"), col("rate"), col("boost"))
  }

  /** Keep at most `n` rows per group under an EXPLICIT total order
    * (`orderBy` must be deterministic — tie-break on a unique column; the
    * engine-wide rule that every kept-vs-dropped decision is reproducible).
    * Adds `rk` (1-based rank within the group).
    *
    * Scale: the rank-filter shape is planned as WindowGroupLimit in Spark
    * 4 — each input partition pre-prunes to its local top-`n` per group
    * BEFORE the shuffle, so the exchange moves O(groups × n) rows per
    * partition, not the corpus. A dominant group (the reason you cap) is
    * exactly the case the pre-shuffle prune wins biggest on.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderBy: Seq[Column],
                  n: Int): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** Fixed-schema pivot counts: one row per `rowCol` value, one column per
    * entry of `values` (in order), cells = row counts, absent combinations
    * 0. The value list is EXPLICIT by design: `pivot(col)` without values
    * runs a hidden distinct-scan job to discover them and makes the output
    * schema data-dependent — both wrong at corpus scale. One aggregation,
    * partial map-side.
    */
  def pivotCounts(df: DataFrame, rowCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivot values must be explicit and non-empty")
    df.groupBy(rowCol)
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .na.fill(0L, values)
  }

  /** Token-budget mixture selection: keep rows per group, in the EXPLICIT
    * `orderBy` priority order, until the group's token budget is reached —
    * the "mix N tokens of source X, M of source Y" recipe step of
    * training-set assembly. A row is kept iff the cumulative token count
    * UP TO AND INCLUDING it is within budget, so the selection
    * deterministically overshoots by at most one document (taking the
    * boundary doc beats silently under-filling; callers wanting
    * strict-under semantics pass `inclusive = false`).
    *
    * Scale: one window aggregation partitioned by group — the same
    * shuffle any per-group selection pays; no global order, no driver
    * state. Budgets are a small map resolved to a CASE column.
    */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, tokenCol: String,
                          orderBy: Seq[Column], budgetByGroup: Map[String, Long],
                          defaultBudget: Long,
                          inclusive: Boolean = true): DataFrame = {
    (budgetByGroup.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0, s"budgets must be >= 0, got $b"))
    val budget = budgetByGroup.foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
    val keep =
      if (inclusive) col("cum_tokens") - col(tokenCol) < budget
      else col("cum_tokens") <= budget
    withCum.filter(keep)
  }

  /** [[tokenBudgetPerGroup]] with the budget carried as a COLUMN — for
    * budgets DERIVED from the corpus itself (e.g. per-group shares from
    * [[sqrtTemperatureWeights]] joined on) rather than a driver-held map.
    * Same boundary rule: the document that crosses the budget line is
    * included (`inclusive = true`) or excluded strictly.
    */
  def tokenBudgetFromColumn(df: DataFrame, groupCol: String, tokenCol: String,
                            orderBy: Seq[Column], budgetCol: Column,
                            inclusive: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
    val keep =
      if (inclusive) col("cum_tokens") - col(tokenCol) < budgetCol
      else col("cum_tokens") <= budgetCol
    withCum.filter(keep)
  }

  /** `tiles`-quantile tier (1-based) of every row WITHIN its
    * `partitionCol` group, under an explicit deterministic order — the
    * curriculum-selection bucketing step ("top quartile per language").
    *
    * Scale: ntile is a single-task window per partition value, so the
    * operator deliberately has NO un-partitioned form — a global ntile
    * funnels the corpus through one task. Group size is the skew bound
    * (fine for language/domain strata); for corpus-global tiers, cut at
    * [[Profiler.quantiles]] thresholds instead — a constant-memory
    * aggregation plus a codegen'd CASE, no window at all.
    */
  def ntileTiers(df: DataFrame, partitionCol: String, orderBy: Seq[Column],
                 tiles: Int): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    val w = Window.partitionBy(col(partitionCol)).orderBy(orderBy: _*)
    df.withColumn("tier", ntile(tiles).over(w))
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [pLo, pHi] interpolated-quantile interval — the standard
    * outlier-taming step before length/score-based curation (a handful
    * of pathological documents otherwise dominate means, budgets, and
    * temperature weights).
    *
    * Shape: one aggregation pass computes the two bounds per group
    * (built-in `percentile`, the same exact interpolated statistic the
    * DuckDB `quantile_cont` oracle computes), the |groups|-row bounds
    * frame broadcasts back, and the clip itself is a codegen'd
    * least/greatest — comparisons only, no arithmetic, so clipped
    * values are input values (or the bound) bit-for-bit. Adds
    * `<valueCol>_clipped` (double).
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val bounds = df.groupBy(col(groupCol).as("__g")).agg(
      percentile(col(valueCol).cast("double"), lit(pLo)).as("__lo"),
      percentile(col(valueCol).cast("double"), lit(pHi)).as("__hi"))
    // Null-safe join key: groupBy emits a bounds row for the null group,
    // and `<=>` lets rows with a null group key reach it (a plain inner
    // equi-join would silently drop them). least/greatest skip nulls, so
    // a group whose bound is null (all-null values) passes through.
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"), "left")
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
  }
}
