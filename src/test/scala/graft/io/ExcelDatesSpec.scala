package graft.io

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** [[ExcelDates]] — serial/ISO conversion and date-format detection
  * (round-16 verdict item 3). Ground truth: ECMA-376 §18.8.30 builtin
  * ids and the documented Lotus 1900 leap-day quirk (serial 60 is the
  * nonexistent 1900-02-29; 61 = 1900-03-01).
  */
class ExcelDatesSpec extends AnyFlatSpec with Matchers {

  "looksLikeDateFormat" should "accept date/time codes and reject numeric ones" in {
    Seq("yyyy-mm-dd", "m/d/yy h:mm", "dd\\-mmm\\-yy", "[h]:mm:ss",
      "hh:mm AM/PM", "yyyy\"年\"m\"月\"").foreach { f =>
      withClue(f) { ExcelDates.looksLikeDateFormat(f) shouldBe true }
    }
    Seq("General", "0.00", "#,##0.00;[Red](#,##0.00)", "0.00E+00", "@",
      "\"yes\";\"no\"", "$#,##0_);($#,##0)", "# ?/?").foreach { f =>
      withClue(f) { ExcelDates.looksLikeDateFormat(f) shouldBe false }
    }
  }

  "isDateFormat" should "know the builtin ranges and consult custom codes" in {
    Seq(14, 22, 27, 45, 47, 58).foreach(ExcelDates.isDateFormat(_, Map.empty) shouldBe true)
    Seq(0, 1, 2, 9, 10, 11, 37, 44, 48, 49).foreach(
      ExcelDates.isDateFormat(_, Map.empty) shouldBe false)
    ExcelDates.isDateFormat(164, Map(164 -> "yyyy-mm-dd")) shouldBe true
    ExcelDates.isDateFormat(164, Map(164 -> "#,##0")) shouldBe false
    ExcelDates.isDateFormat(165, Map(164 -> "yyyy-mm-dd")) shouldBe false
  }

  "serialToString" should "render the 1900 system with the Lotus leap-day split" in {
    ExcelDates.serialToString(1, date1904 = false) shouldBe Some("1900-01-01")
    ExcelDates.serialToString(59, date1904 = false) shouldBe Some("1900-02-28")
    ExcelDates.serialToString(60, date1904 = false) shouldBe None // phantom Feb 29
    ExcelDates.serialToString(61, date1904 = false) shouldBe Some("1900-03-01")
    ExcelDates.serialToString(45306, date1904 = false) shouldBe Some("2024-01-15")
  }

  it should "render time fractions, time-only serials and the 1904 epoch" in {
    ExcelDates.serialToString(45306.354166666664, date1904 = false) shouldBe
      Some("2024-01-15 08:30:00")
    ExcelDates.serialToString(0.5, date1904 = false) shouldBe Some("12:00:00")
    ExcelDates.serialToString(0, date1904 = true) shouldBe Some("1904-01-01")
    ExcelDates.serialToString(43844, date1904 = true) shouldBe Some("2024-01-15")
  }

  it should "refuse unrepresentable serials (total, no throw)" in {
    ExcelDates.serialToString(-1, date1904 = false) shouldBe None
    ExcelDates.serialToString(Double.NaN, date1904 = false) shouldBe None
    ExcelDates.serialToString(3e6, date1904 = false) shouldBe None // > year 9999
  }

  "dateToSerial" should "invert serialToString on dates and datetimes" in {
    ExcelDates.dateToSerial("2024-01-15") shouldBe Some(45306.0)
    ExcelDates.dateToSerial("1900-01-01") shouldBe Some(1.0)
    ExcelDates.dateToSerial("1900-03-01") shouldBe Some(61.0)
    val rt = ExcelDates.dateToSerial("2024-01-15 08:30:00").get
    ExcelDates.serialToString(rt, date1904 = false) shouldBe
      Some("2024-01-15 08:30:00")
    ExcelDates.dateToSerial("not a date") shouldBe None
    ExcelDates.dateToSerial("01/15/2024") shouldBe None // non-ISO stays string
  }
}
