package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (1L, 1L, 5L), (2L, 1L, 15L), (3L, 1L, 30L), (4L, 2L, 10L))
    .toDF("event_id", "user_id", "ts")

  private val windows = Seq(
    (1L, 0L, 10L, "w1"), (1L, 20L, 40L, "w2"), (2L, 50L, 60L, "w3"))
    .toDF("user_id", "lo", "hi", "win")

  "rangeJoin" should "match rows into same-key inclusive intervals" in {
    val out = RangeJoin.rangeJoin(events, windows, Seq("user_id"),
        "ts", "lo", "hi")
      .select("event_id", "win").as[(Long, String)].collect().toSet
    out shouldBe Set(1L -> "w1", 3L -> "w2") // 15 in a gap; user 2 before w3
  }

  it should "honor exclusive upper bounds and outer joins" in {
    val excl = RangeJoin.rangeJoin(events, windows, Seq("user_id"),
        "ts", "lo", "hi", endExclusive = true)
      .select("event_id").as[Long].collect().toSet
    excl shouldBe Set(1L, 3L) // 5 < 10 and 30 < 40 still match
    val left = RangeJoin.rangeJoin(events, windows, Seq("user_id"),
        "ts", "lo", "hi", how = "left_outer")
    left.count() shouldBe 4L // unmatched events survive with null window
    left.filter("win IS NULL").count() shouldBe 2L
  }

  it should "plan a hash join on the equality key, not a nested loop" in {
    val plan = RangeJoin.rangeJoin(events, windows, Seq("user_id"),
      "ts", "lo", "hi").queryExecution.executedPlan.toString
    plan should include("HashJoin")
    plan should not include "BroadcastNestedLoopJoin"
  }
}
