package graft.ops

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  "coerceTimestamp" should "null out invalid dates instead of raising (errors=coerce)" in {
    val out = Seq("2024-01-15", "2024-01-35", "garbage", "2024-01-15 10:30:00")
      .toDF("x").select(Temporal.coerceTimestamp($"x").as("t")).collect()
    out.map(_.isNullAt(0)) shouldBe Array(false, true, true, false)
  }

  "fiscalYearBounds" should "span Jul 1 through Jun 30 around the run date" in {
    Temporal.fiscalYearBounds(LocalDate.of(2026, 8, 12)) shouldBe
      (LocalDate.of(2026, 7, 1), LocalDate.of(2027, 6, 30))
    Temporal.fiscalYearBounds(LocalDate.of(2026, 2, 1)) shouldBe
      (LocalDate.of(2025, 7, 1), LocalDate.of(2026, 6, 30))
    Temporal.fiscalYearBounds(LocalDate.of(2026, 7, 1)) shouldBe
      (LocalDate.of(2026, 7, 1), LocalDate.of(2027, 6, 30))
  }

  "inFiscalYear" should "keep only rows inside the closed FY window" in {
    val out = Seq("2025-06-30", "2025-07-01", "2026-06-30", "2026-07-01")
      .toDF("d").select($"d".cast("timestamp").as("t"))
      .filter(Temporal.inFiscalYear($"t", LocalDate.of(2026, 2, 1)))
      .count()
    out shouldBe 2
  }

  "requireFresh" should "abort when data predates the FY floor (V3 hard failure)" in {
    val fyStart = LocalDate.of(2025, 7, 1)
    noException should be thrownBy
      Temporal.requireFresh(java.sql.Timestamp.valueOf("2024-07-01 00:00:00"), fyStart)
    an[IllegalArgumentException] should be thrownBy
      Temporal.requireFresh(java.sql.Timestamp.valueOf("2024-06-30 23:59:59"), fyStart)
  }
}
