package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic column-level data profiling — the corpus-intake generalization
  * of the reference's inline validation checks (null counts, ranges,
  * row-count guards, `etl_payroll_pipeline_demo.py:495-512,:686-691`):
  * one summary row per column.
  *
  * Two execution shapes by distinct-count mode:
  *
  *  - **HLL (default)**: ALL metrics for ALL columns ride a single
  *    aggregation (one pass, constant memory via approx_count_distinct);
  *    the one aggregated row is reshaped driver-side. Right for wide
  *    tables and routine intake audits.
  *  - **exact**: one narrow aggregation per column — scan pruned to that
  *    column, shuffle carries only its distinct values — unioned into one
  *    lazy frame. Spark's multi-distinct-in-one-agg EXPAND path multiplies
  *    every row by (columns+1) and measured 3.9s where the per-column
  *    shape takes a fraction; per-column also never collects.
  */
object Profiler {

  private val outSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true)))

  /** One row per column: (column, dtype, n_rows, n_nulls, n_distinct,
    * min, max) with min/max rendered as strings (profile output is for
    * humans and drift checks, not arithmetic).
    */
  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame =
    if (exactDistinct) profileExact(df) else profileHll(df)

  private def profileExact(df: DataFrame): DataFrame =
    df.schema.fields.map { f =>
      df.select(col(f.name).as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__cnt"))
        .agg(
          coalesce(sum("__cnt"), lit(0L)).as("__n"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))
            .otherwise(0L)), lit(0L)).as("__nulls"),
          count(when(col("__v").isNotNull, lit(1))).as("__distinct"),
          min(col("__v")).cast("string").as("__min"),
          max(col("__v")).cast("string").as("__max"))
        .select(lit(f.name).as("column"),
          lit(f.dataType.simpleString).as("dtype"),
          col("__n").as("n_rows"), col("__nulls").as("n_nulls"),
          col("__distinct").as("n_distinct"),
          col("__min").as("min"), col("__max").as("max"))
    }.reduce(_ unionByName _)

  /** Per-column quantiles for the numeric columns of `df` — the
    * distribution half of intake profiling (drift checks need medians and
    * tails, not just min/max). One row per column: (column, then one
    * `q<prob>` column per requested probability).
    *
    * Two modes, like [[profile]]:
    *
    *  - **approximate (default)**: `approx_percentile` (KLL-style sketch) —
    *    ALL columns ride ONE aggregation, constant memory, the only shape
    *    that holds at 100 TB.
    *  - **exact**: `percentile` (linear interpolation over the sorted
    *    column — matches DuckDB `quantile_cont` bit-for-bit on clean
    *    doubles, so it is oracle-checkable). Spark implements it as a
    *    counts-map aggregation: memory scales with per-column distinct
    *    values — fine for bounded domains, use approximate for open ones.
    *
    * All requested columns ride the same single aggregation in both modes.
    */
  def quantiles(df: DataFrame, cols: Seq[String],
                probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
                exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty && probs.nonEmpty, "need at least one column and prob")
    require(probs.forall(p => p >= 0 && p <= 1), s"probs must be in [0,1]: $probs")
    val probsArr = array(probs.map(lit): _*)
    val aggs = cols.map { c =>
      val q = if (exact) percentile(col(c).cast("double"), probsArr)
              else percentile_approx(col(c).cast("double"), probsArr, lit(10000))
      q.as(s"__q_$c")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    // decimal (not double) scaling: 0.05 * 100 must name "p5", not "p5_000..01"
    val probNames = probs.map { p =>
      val pct = BigDecimal(p.toString) * 100
      if (pct.isWhole) s"p${pct.toBigInt}"
      else s"p${pct.bigDecimal.stripTrailingZeros.toPlainString.replace('.', '_')}"
    }
    val schema = StructType(
      StructField("column", StringType, nullable = false) +:
        probNames.map(StructField(_, DoubleType, nullable = true)))
    val out = cols.zipWithIndex.map { case (c, i) =>
      // percentile over an empty / all-null column yields a null array
      val qs = Option(row.getSeq[Double](i))
        .map(_.map(q => q: Any)).getOrElse(probs.map(_ => null))
      Row.fromSeq(c +: qs)
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out, 1), schema)
  }

  private def profileHll(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        // coalesce: sum over zero rows is null, and getLong would NPE on
        // an empty input table (approx_count_distinct already yields 0)
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${f.name} nulls"),
        approx_count_distinct(c).as(s"${f.name} distinct"),
        min(c).cast("string").as(s"${f.name} min"),
        max(c).cast("string").as(s"${f.name} max"))
    }
    val row = df.agg(count(lit(1)).as("n"), aggs: _*).collect().head
    val n = row.getLong(0)
    val out = fields.zipWithIndex.map { case (f, i) =>
      val base = 1 + i * 4
      Row(f.name, f.dataType.simpleString, n,
        row.getLong(base), row.getLong(base + 1),
        row.getString(base + 2), row.getString(base + 3))
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out.toSeq, 1), outSchema)
  }
}
