package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime data-quality checks (SURVEY §2.10 V1-V6).
  *
  * The reference's checks are print-only except the fiscal-year staleness
  * abort (etl_payroll_pipeline_demo.py:507-512). The engine mirrors that:
  * checks RETURN structured results (lazy DataFrames or issue lists) and the
  * caller decides whether to warn or abort (strict mode).
  */
object Validate {

  sealed trait SchemaIssue { def column: String }
  final case class MissingColumn(column: String) extends SchemaIssue
  final case class ExtraColumn(column: String) extends SchemaIssue
  final case class PositionMismatch(column: String, expected: Int, actual: Int) extends SchemaIssue

  /** Order-sensitive expected-columns assertion (V4, reference
    * etl_payroll_pipeline_demo.py:521-554): reports missing, extra, and
    * out-of-position columns; empty result = clean.
    */
  def schemaCheck(df: DataFrame, expected: Seq[String]): Seq[SchemaIssue] = {
    val actual = df.columns.toSeq
    val missing = expected.filterNot(actual.contains).map(MissingColumn)
    val extra = actual.filterNot(expected.contains).map(ExtraColumn)
    val moved = expected.zipWithIndex.collect {
      case (name, i) if actual.contains(name) && actual.indexOf(name) != i =>
        PositionMismatch(name, i, actual.indexOf(name))
    }
    missing ++ extra ++ moved
  }

  /** Rows whose `c` does NOT match `pattern` (V5/F7, derived-code format
    * validation, reference etl_payroll_pipeline_demo.py:563-581).
    */
  def formatViolations(df: DataFrame, c: Column, pattern: String): DataFrame =
    df.filter(c.isNull || !c.rlike(pattern))

  /** Null count after a coercion (V6/A3, reference
    * etl_payroll_pipeline_demo.py:686-691), as a lazy 1-row frame. Computed as
    * count(*) - count(col) so both legs stay plain BIGINT counts.
    */
  def nullCount(df: DataFrame, c: Column): DataFrame =
    df.agg(
      (count(lit(1)) - count(c)).as("n_null"),
      count(lit(1)).as("n_total"))
}
