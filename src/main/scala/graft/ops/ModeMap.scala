package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-key mode (SURVEY §2.6 A1).
  *
  * The reference builds a dict of `key → Series.mode().iat[0]` (falling back to
  * first value) and `Series.map`s it over the fact column (reference
  * etl_payroll_pipeline_demo.py:224-226,:310-324,:617-650). pandas sorts modes
  * ascending, so ties break to the SMALLEST value — Spark's builtin `mode` is
  * tie-nondeterministic, so this is the count + row_number composition
  * (ORDER BY cnt DESC, value ASC), which stays SQL-oracle-checkable.
  *
  * Scale: two shuffles bounded by |distinct(key, value)|, not fact row count
  * (partial aggregation runs map-side); the result is a tiny (key → mode)
  * table meant to be broadcast-joined back, exactly like the reference's dict map.
  */
object ModeMap {

  /** (key, modeCol, cnt) with one row per key: the most frequent value,
    * ties to the smallest.
    */
  def modePerKey(df: DataFrame, key: String, value: String,
                 modeCol: String = "mode_value", cntCol: String = "cnt"): DataFrame = {
    val counted = df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value))
      .agg(count(lit(1)).as(cntCol))
    val w = Window.partitionBy(col(key)).orderBy(col(cntCol).desc, col(value).asc)
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed(value, modeCol)
  }

  /** The reference's full pattern: compute the per-key mode of `value`, then
    * fill `target` where blank with the mode looked up by `key` (the
    * `Series.map` becomes a broadcast left join — SURVEY §4.1).
    */
  def fillWithModePerKey(df: DataFrame, key: String, value: String, target: String): DataFrame = {
    val modes = modePerKey(df, key, value, modeCol = "__mode")
      .select(col(key).as("__mk"), col("__mode"))
    df.join(broadcast(modes), df(key) === col("__mk"), "left")
      .withColumn(target, coalesce(Normalize.blankToNull(col(target)), col("__mode")))
      .drop("__mk", "__mode")
  }
}
