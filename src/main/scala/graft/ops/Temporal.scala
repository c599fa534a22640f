package graft.ops

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time coercion + fiscal-year window (SURVEY §2.4 E7, §2.2 F6).
  *
  * The reference derives the fiscal year from `datetime.today()`
  * (etl_payroll_pipeline_demo.py:499-503); for determinism the engine takes an
  * explicit `runDate` everywhere (SURVEY §7.6 risk 4).
  */
object Temporal {

  /** `pd.to_datetime(errors='coerce')` parity (reference
    * etl_payroll_pipeline_demo.py:350,:407,:494,:685,:689): unparseable
    * values become null instead of raising (ANSI-safe via try_to_timestamp).
    */
  def coerceTimestamp(c: Column): Column = try_to_timestamp(c.cast("string"))

  /** Like [[coerceTimestamp]] with an explicit pattern. */
  def coerceTimestamp(c: Column, fmt: String): Column =
    try_to_timestamp(c.cast("string"), lit(fmt))

  /** US-academic fiscal year containing `runDate`: Jul 1 of the previous
    * calendar year through Jun 30 (reference etl_payroll_pipeline_demo.py:499-503).
    */
  def fiscalYearBounds(runDate: LocalDate): (LocalDate, LocalDate) = {
    val fyEndYear = if (runDate.getMonthValue >= 7) runDate.getYear + 1 else runDate.getYear
    (LocalDate.of(fyEndYear - 1, 7, 1), LocalDate.of(fyEndYear, 6, 30))
  }

  /** The CPA pipeline's fiscal window is CALENDAR-year based, ignoring the
    * current month (reference etl_payroll_pipeline_demo.py:499-503:
    * `fy_start = datetime(current_year - 1, 7, 1)` always): Jul 1 of last
    * year through Jun 30 of this year, even in August.
    */
  def calendarFiscalYearBounds(runDate: LocalDate): (LocalDate, LocalDate) =
    (LocalDate.of(runDate.getYear - 1, 7, 1), LocalDate.of(runDate.getYear, 6, 30))

  /** Closed fiscal-year range predicate (F6, reference
    * etl_payroll_pipeline_demo.py:515-518).
    */
  def inFiscalYear(c: Column, runDate: LocalDate): Column = {
    val (start, end) = fiscalYearBounds(runDate)
    betweenDates(c, start, end)
  }

  /** Inclusive [start 00:00, end 00:00] timestamp range on whole-day bounds. */
  def betweenDates(c: Column, start: LocalDate, end: LocalDate): Column =
    c.between(
      to_timestamp(lit(start.toString), "yyyy-MM-dd"),
      to_timestamp(lit(end.toString), "yyyy-MM-dd"))

  /** Staleness abort (V3, the reference's only hard failure,
    * etl_payroll_pipeline_demo.py:507-512): data older than one FY before the
    * window start is a fatal error.
    */
  def requireFresh(minDate: java.sql.Timestamp, fyStart: LocalDate): Unit = {
    val floor = java.sql.Timestamp.valueOf(fyStart.minusYears(1).atStartOfDay)
    require(minDate.compareTo(floor) >= 0,
      s"stale input: min date $minDate predates fiscal-year floor $floor")
  }
}
