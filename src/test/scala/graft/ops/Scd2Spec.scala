package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Scd2]]: version-chain semantics across two merges, closed-tier
  * pass-through, and the join-free plan shape.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val hash = (df: DataFrame) => TextDedup.contentHash(df("text"))

  private val snap1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    .toDF("id", "text")
  private val snap2 = Seq((1L, "alpha"), (2L, "BETA v2"), (4L, "delta"))
    .toDF("id", "text")

  private def hist2: DataFrame = Scd2.merge(
    Scd2.init(snap1, "id", Seq("text"), hash, "2026-01-01"),
    snap2, "id", Seq("text"), hash, "2026-02-01")

  private def rows(df: DataFrame) = df
    .select("id", "text", "valid_from", "valid_to", "is_current")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getString(3)), r.getBoolean(4)))
    .toSet

  "merge" should "close, open, and retain versions per the SCD2 contract" in {
    rows(hist2) shouldBe Set(
      (1L, "alpha", "2026-01-01", None, true),               // unchanged
      (2L, "beta", "2026-01-01", Some("2026-02-01"), false), // closed
      (2L, "BETA v2", "2026-02-01", None, true),             // reopened
      (3L, "gamma", "2026-01-01", Some("2026-02-01"), false), // deleted
      (4L, "delta", "2026-02-01", None, true))               // new key
  }

  it should "pass closed rows through untouched on the next merge" in {
    val snap3 = Seq((2L, "BETA v2"), (4L, "delta v3")).toDF("id", "text")
    val h3 = rows(Scd2.merge(hist2, snap3, "id", Seq("text"), hash,
      "2026-03-01"))
    // round-2 closures unchanged
    h3 should contain((2L, "beta", "2026-01-01", Some("2026-02-01"), false))
    h3 should contain((3L, "gamma", "2026-01-01", Some("2026-02-01"), false))
    // key 1 deleted in snap3; key 4 changed
    h3 should contain((1L, "alpha", "2026-01-01", Some("2026-03-01"), false))
    h3 should contain((4L, "delta v3", "2026-03-01", None, true))
    h3.count(_._5) shouldBe 2 // currents: 2 and 4
  }

  it should "treat normalization-equivalent text as unchanged" in {
    val hist = Scd2.init(Seq((1L, "Same  Text")).toDF("id", "text"),
      "id", Seq("text"), hash, "2026-01-01")
    val merged = Scd2.merge(hist, Seq((1L, "same text")).toDF("id", "text"),
      "id", Seq("text"), hash, "2026-02-01")
    rows(merged) shouldBe Set((1L, "Same  Text", "2026-01-01", None, true))
  }

  it should "plan no join (union+groupBy, closed tier outside the shuffle)" in {
    hist2.queryExecution.executedPlan.toString should not include "Join"
  }

  "asOf" should "read the version live at a date" in {
    // between the two drops: the January versions, including later-deleted 3
    rows(Scd2.asOf(hist2, "2026-01-15")).map(r => r._1 -> r._2).toMap shouldBe
      Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    // after the second drop: the February state
    rows(Scd2.asOf(hist2, "2026-02-15")).map(r => r._1 -> r._2).toMap shouldBe
      Map(1L -> "alpha", 2L -> "BETA v2", 4L -> "delta")
    // before any load: empty
    rows(Scd2.asOf(hist2, "2025-12-31")) shouldBe empty
  }

  it should "exclude a version on its own close date (half-open interval)" in {
    rows(Scd2.asOf(hist2, "2026-02-01")).map(_._2).toSet should
      contain noneOf ("beta", "gamma")
  }
}
