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
}
