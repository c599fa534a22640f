package graft.io

import java.time.LocalDate

/** Excel number-format date semantics shared by [[Xls]] (BIFF8 FORMAT/XF
  * records) and [[Xlsx]] (OOXML styles.xml) — round-16 verdict item 3:
  * `pd.read_excel` surfaces date-formatted numeric cells as datetimes
  * (the reference then `to_datetime`s them,
  * etl_payroll_pipeline_demo.py:94,:350); an adapter that renders the raw
  * serial string instead silently nulls those columns at the E7 coercion.
  *
  * Written against the PUBLIC specs: ECMA-376 §18.8.30 (builtin numFmtId
  * table — shared verbatim by [MS-XLS] ifmt) and [MS-XLS] 2.4.126 FORMAT /
  * 2.4.353 XF / 2.4.77 Date1904.
  *
  * Rendering contract: ISO-8601 strings — `yyyy-MM-dd` for whole-day
  * serials, `yyyy-MM-dd HH:mm:ss` otherwise (both parse under the engine's
  * E7 `try_to_timestamp` coercion, [[graft.ops.Temporal.coerceTimestamp]]).
  * EXCEPTION: 1900-system serials in [0,1) are time-of-day only and render
  * bare `HH:mm:ss`, which does NOT survive the E7 coercion — deliberately
  * matching pandas, where `read_excel` yields a `datetime.time` whose
  * `to_datetime(..., errors="coerce")` is NaT too; both engines agree the
  * cell is not a datetime. Values the date system cannot represent
  * (negative serials, the phantom 1900-02-29 at serial 60, post-9999
  * overflow) fall back to the raw numeric rendering — total, never
  * throwing.
  */
object ExcelDates {

  /** Builtin date/time numFmtIds (ECMA-376 §18.8.30; [MS-XLS] ifmt):
    * 14-22 date/time, 27-36 + 50-58 East Asian date variants, 45-47
    * elapsed mm:ss forms.
    */
  private val builtinDateIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Heuristic for CUSTOM format codes (the same shape xlrd/openpyxl use):
    * after removing quoted literals, bracketed sections ([Red], [$-409],
    * [h] elapsed markers), backslash escapes and the `_`/`*` pad pairs,
    * any surviving y/m/d/h/s code letter marks a date/time format. Pure
    * numeric codes (`#,##0.00`, `0.00E+00`, `General`, `@`) contain none
    * of those letters once literals are stripped.
    */
  def looksLikeDateFormat(code: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '"' =>
          i += 1
          while (i < code.length && code.charAt(i) != '"') i += 1
          i += 1
        case '[' =>
          // [h]/[mm]/[ss] elapsed-time blocks ARE time formats
          val close = code.indexOf(']', i)
          val inner = if (close > i) code.substring(i + 1, close) else ""
          if (inner.nonEmpty && inner.toLowerCase.forall(c => "hms".contains(c)))
            sb.append(inner)
          i = if (close < 0) code.length else close + 1
        case '\\' | '_' | '*' => i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString.toLowerCase.exists(c => "ymdhs".contains(c))
  }

  /** Is numFmtId/ifmt `id` a date/time format, given the file's custom
    * format table (id -> format code)?
    */
  def isDateFormat(id: Int, customFormats: collection.Map[Int, String]): Boolean =
    builtinDateIds.contains(id) ||
      customFormats.get(id).exists(looksLikeDateFormat)

  /** Render an Excel date serial as an ISO string under the workbook's
    * date system. None = not representable (caller falls back to the raw
    * numeric rendering).
    *
    * 1900 system (default): serial 1 = 1900-01-01, with Lotus's phantom
    * leap day at serial 60 — serials 1-59 sit one day later than the
    * uniform epoch, so the epoch is 1899-12-31 below 60 and 1899-12-30
    * from 61 (the xlrd split); serial 60 itself (the nonexistent
    * 1900-02-29) is unrepresentable. Serials in [0,1) are time-of-day
    * only. 1904 system: serial 0 = 1904-01-01, no phantom day.
    */
  def serialToString(serial: Double, date1904: Boolean): Option[String] = {
    if (serial.isNaN || serial.isInfinite || serial < 0.0) return None
    if (serial >= 2958466.0) return None // >= year 10000
    val days = math.floor(serial).toLong
    var secs = math.round((serial - days) * 86400.0)
    var d = days
    if (secs >= 86400L) { secs -= 86400L; d += 1L }
    def hms: String = {
      val h = secs / 3600; val m = (secs % 3600) / 60; val s = secs % 60
      f"$h%02d:$m%02d:$s%02d"
    }
    if (!date1904 && d == 0L) return Some(hms) // 1900 system: time-only
    val epoch =
      if (date1904) LocalDate.of(1904, 1, 1)
      else if (d >= 61L) LocalDate.of(1899, 12, 30)
      else if (d == 60L) return None // phantom 1900-02-29
      else LocalDate.of(1899, 12, 31)
    val date = epoch.plusDays(d)
    if (secs == 0L) Some(date.toString) else Some(s"$date $hms")
  }

  /** Inverse of [[serialToString]] for the 1900 system — writer support
    * ([[Xls.write]]/[[Xlsx.write]] `dateColumns`): `yyyy-MM-dd` or
    * `yyyy-MM-dd HH:mm:ss` to an Excel serial. None = not a renderable
    * ISO date (caller keeps the plain string cell).
    */
  def dateToSerial(s: String): Option[Double] = {
    val t = s.trim
    val (datePart, timePart) =
      t.indexOf(' ') match {
        case -1 => (t, None)
        case i => (t.substring(0, i), Some(t.substring(i + 1).trim))
      }
    try {
      val d = LocalDate.parse(datePart)
      if (d.getYear < 1900 || d.getYear > 9999) return None
      val secs = timePart.fold(0.0) { tp =>
        val p = tp.split(":")
        if (p.length != 3) return None
        // fractional seconds accepted: java.sql.Timestamp.toString renders
        // "HH:mm:ss.S" (the typed-column write path)
        p(0).toLong * 3600.0 + p(1).toLong * 60.0 + p(2).toDouble
      }
      val epoch =
        if (d.isBefore(LocalDate.of(1900, 3, 1))) LocalDate.of(1899, 12, 31)
        else LocalDate.of(1899, 12, 30)
      Some((d.toEpochDay - epoch.toEpochDay).toDouble + secs / 86400.0)
    } catch { case _: java.time.format.DateTimeParseException => None
      case _: NumberFormatException => None }
  }
}
