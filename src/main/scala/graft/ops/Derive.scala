package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-key / column-surgery expressions (SURVEY §2.4 E3-E6).
  *
  * All null-propagating concat semantics follow pandas `"string"` dtype `+`
  * (reference etl_payroll_pipeline_demo.py:257,:261,:268-269,:274,:278).
  * Spark's `concat` is itself null-propagating, so these compose built-ins only.
  */
object Derive {

  /** Separator-joined key, null-propagating (E3):
    * `TS-Org Code = TS COA + '-' + TS ORG` (reference
    * etl_payroll_pipeline_demo.py:257). Any null input nulls the whole key.
    */
  def concatKey(sep: String, cols: Column*): Column = {
    require(cols.nonEmpty, "concatKey needs at least one column")
    cols.map(_.cast("string")).reduce((a, b) => concat(a, lit(sep), b))
  }

  /** `astype(str)`-regime key (E11 + E3): nulls become "nan" before joining,
    * so a fully-null pair yields "nan-nan" (reference
    * etl_payroll_pipeline_demo.py:558,:591).
    */
  def concatKeyNan(sep: String, cols: Column*): Column =
    concatKey(sep, cols.map(Normalize.astypeStr): _*)

  /** Separator-less n-way concat (E4): `Pay Event = Year+PayID+Pay#+Seq#`
    * (reference etl_payroll_pipeline_demo.py:268-269).
    */
  def concatAll(cols: Column*): Column =
    concat(cols.map(_.cast("string")): _*)

  /** Fixed-length prefix (E5): `Dept TS-Org = TS-Org Code[:5]` (reference
    * etl_payroll_pipeline_demo.py:560-561). 1-based, like SQL SUBSTRING.
    */
  def prefix(c: Column, len: Int): Column = substring(c, 1, len)

  /** Split once on a literal separator into (head, tail) — tail is null when
    * the separator is absent, matching the reference's Python row loop over
    * `COLLEGE.split("-", 1)` (reference etl_payroll_pipeline_demo.py:698-706).
    * Vectorized replacement for the O(n) driver loop.
    */
  def splitOnce(c: Column, sep: String): (Column, Column) = {
    val parts = split(c, java.util.regex.Pattern.quote(sep), 2)
    // `get` (not getItem): ANSI mode must yield null, not raise, when the
    // separator is absent — pandas `.split(sep, 1)` parity.
    (get(parts, lit(0)), get(parts, lit(1)))
  }
}
