package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication (SURVEY §2.7 D2-D4).
  *
  * pandas `drop_duplicates(subset=..., keep="first")` keeps the first row in
  * the frame's CURRENT order (reference etl_payroll_pipeline_demo.py:339-343,
  * :668,:695) — order that Spark's distributed collections don't have. The
  * engine therefore requires an EXPLICIT ordering for keep-first dedup
  * (SURVEY §7.6 risk 1); full-row dedup is order-free and maps to `distinct()`.
  *
  * Scale: one hash-partition shuffle on the business key — at 100 TB this is
  * the dominant exchange of the pipeline, and downstream writes can reuse the
  * same partitioning (SURVEY §4.2).
  */
object Dedup {

  /** Keep the first row per key under the given total order (D2/D4). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "keepFirst needs keys and an explicit order")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[keepFirst]] for ALL-ASCENDING orders, as an algebraic aggregate:
    * `min(struct(orderCols ++ payload))` per key instead of a sort-window.
    * Same result when `orderCols` totally order each key's rows (the
    * operator's contract in either form — nulls sort first, like the
    * window's default asc).
    *
    * Why it exists: the window form shuffles EVERY row and sorts each
    * partition; the aggregate form partial-min's map-side, so the exchange
    * carries at most one candidate struct per key per input partition and
    * nothing is sorted — the SpanDedup "algebraic min instead of a rank
    * window" argument (SCALE.md round 9), applied to the reference's own
    * D2/D4 dedup. At 100 TB with a handful of rows per key this is the
    * difference between shuffling the corpus and shuffling ~the distinct
    * keys. Keep the window form for descending/mixed orders, where struct
    * ordering can't express the comparison.
    */
  def keepFirstAsc(df: DataFrame, keys: Seq[String],
                   orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty,
      "keepFirstAsc needs keys and an explicit order")
    val payload = df.columns.filterNot(c => keys.contains(c) || orderCols.contains(c))
    val packed = struct((orderCols ++ payload).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min(packed).as("__first"))
      .select(df.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c) else col(s"__first.`$c`").as(c)
      }: _*)
  }

  /** Full-row dedup (D3, reference etl_payroll_pipeline_demo.py:667,:693):
    * order-insensitive, exact `distinct()` parity.
    */
  def fullRow(df: DataFrame): DataFrame = df.distinct()
}
