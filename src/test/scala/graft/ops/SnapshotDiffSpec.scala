package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotDiff]] status algebra and its join-free plan shape. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private val snapA = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
  private val snapB = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")

  private def statuses = SnapshotDiff.diff(snapA, snapB, "id",
      df => TextDedup.contentHash(df("text")))
    .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

  "diff" should "classify added/removed/changed/unchanged" in {
    statuses shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added")
  }

  it should "treat normalization-equivalent texts as unchanged" in {
    val snapA2 = Seq((1L, "  Same   TEXT ")).toDF("id", "text")
    val snapB2 = Seq((1L, "same text")).toDF("id", "text")
    SnapshotDiff.diff(snapA2, snapB2, "id", df => TextDedup.contentHash(df("text")))
      .head().getString(3) shouldBe "unchanged"
  }

  it should "summarize counts per status" in {
    SnapshotDiff.summary(SnapshotDiff.diff(snapA, snapB, "id",
        df => TextDedup.contentHash(df("text"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L)
  }

  it should "plan no join (union+groupBy)" in {
    val plan = SnapshotDiff.diff(snapA, snapB, "id",
        df => TextDedup.contentHash(df("text")))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
  }
}
