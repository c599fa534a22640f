package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String / null normalization primitives (SURVEY §2.4 E1, E2, E8, E10, E11; F8).
  *
  * Models the two distinct null regimes the reference uses:
  *   - NA-preserving string cast (`astype("string")`,
  *     reference etl_payroll_pipeline_demo.py:228-231) → plain `cast(StringType)`;
  *   - NA→"nan" string cast (`astype(str)`, reference
  *     etl_payroll_pipeline_demo.py:558,:589-591,:676-682) → [[astypeStr]].
  *
  * All helpers are pure Column expressions (codegen-friendly, no UDFs).
  */
object Normalize {

  /** Null-or-blank predicate: pandas `isna() | strip().isin(['','nan','NaN'])`
    * (reference etl_payroll_pipeline_demo.py:354).
    */
  def isBlank(c: Column): Column =
    c.isNull || trim(c).isin("", "nan", "NaN")

  /** `strip_decimal_str` (reference etl_payroll_pipeline_demo.py:219-222):
    * string-cast, trim, drop a trailing ".0" so integer-valued codes read as
    * integers ("10.0" → "10", "10.05" unchanged, null stays null).
    */
  def stripDecimal(c: Column): Column =
    regexp_replace(trim(c.cast("string")), "\\.0$", "")

  /** pandas `astype(str)` parity: null becomes the literal string "nan"
    * (reference etl_payroll_pipeline_demo.py:558 produces "nan-nan" keys).
    */
  def astypeStr(c: Column): Column =
    coalesce(c.cast("string"), lit("nan"))

  /** `strip_decimal_str` in its EXACT reference form: `astype(str)` first, so a
    * null code becomes the string "nan" before the ".0" strip (reference
    * etl_payroll_pipeline_demo.py:219-222 — fed by `:259,:272-273`).
    */
  def stripDecimalNan(c: Column): Column =
    regexp_replace(trim(astypeStr(c)), "\\.0$", "")

  /** NA-preserving string cast + trim (`ensure_string`, reference
    * etl_payroll_pipeline_demo.py:228-231).
    */
  def ensureString(c: Column): Column = trim(c.cast("string"))

  /** Cast-and-trim a set of columns to string in place (reference
    * etl_payroll_pipeline_demo.py:347-348,:402-405).
    */
  def ensureStringCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.filter(df.columns.contains).map(n => n -> ensureString(col(n))).toMap)

  /** Conditional default fill: where [[isBlank]], use `default`, else keep
    * (reference etl_payroll_pipeline_demo.py:352-357 — ADJ Reason ← 'INT').
    */
  def fillBlankWith(c: Column, default: Column): Column =
    when(isBlank(c), default).otherwise(c)

  /** Empty-string (after trim) to null; building block for coalesce-style
    * "existing else mapped" logic (reference etl_payroll_pipeline_demo.py:321-324).
    */
  def blankToNull(c: Column): Column =
    when(isBlank(c), lit(null).cast("string")).otherwise(c)
}
