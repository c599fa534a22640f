package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup
import graft.tools.WriteAudit

/** Write-path plan contract (PLANS.md write audit, SCALE.md §Dedup):
  * file sinks require an ordering, never a distribution — so a write after
  * keep-first dedup adds NO exchange, and when the write's partition columns
  * are a prefix of the dedup window's keys, no sort either. Bucketed tables
  * joined on the bucket key join with zero exchanges.
  *
  * Counts come from the executed-plan string, which under AQE prints the
  * initial AND final plan — all counts are 2x the physical operator count,
  * uniformly, so the assertions here are relative (same/zero/greater), never
  * absolute.
  */
class WritePathSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    (1 to 200).map(i => (i % 3, i % 20, i, s"p${i % 5}")).toDF("status", "key", "seq", "prio")
  }

  private def deduped = Dedup.keepFirst(df, Seq("status", "key"), Seq(col("seq").asc))

  private def tmp() = Files.createTempDirectory("wp_spec_").toString

  "a parquet write after keepFirst" should "add no exchange, partitioned or not" in {
    val plain = WriteAudit.planCounts(WriteAudit.captureWritePlan(spark) {
      Sinks.parquet(deduped, s"${tmp()}/plain")
    })
    val prefix = WriteAudit.planCounts(WriteAudit.captureWritePlan(spark) {
      Sinks.parquet(deduped, s"${tmp()}/by_status", partitionBy = Seq("status"))
    })
    val nonPrefix = WriteAudit.planCounts(WriteAudit.captureWritePlan(spark) {
      Sinks.parquet(deduped, s"${tmp()}/by_prio", partitionBy = Seq("prio"))
    })

    plain("shuffleExchange") should be > 0 // the window's own hash partitioning
    prefix("shuffleExchange") shouldBe plain("shuffleExchange")
    nonPrefix("shuffleExchange") shouldBe plain("shuffleExchange")

    // window-key-prefix partition columns: the window's sort already satisfies
    // the write's required ordering; any other column pays one extra sort.
    prefix("sort") shouldBe plain("sort")
    nonPrefix("sort") should be > prefix("sort")
  }

  "tables bucketed on the join key" should "join with zero exchanges" in {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sinks.bucketedTable(df, "wp_left", "key", 4, path = Some(s"${tmp()}/left"))
      Sinks.bucketedTable(df.select(col("key"), col("prio").as("rprio")),
        "wp_right", "key", 4, path = Some(s"${tmp()}/right"))
      val joined = spark.table("wp_left").join(spark.table("wp_right"), "key")
      joined.collect()
      val c = WriteAudit.planCounts(joined.queryExecution.executedPlan.toString)
      c("shuffleExchange") shouldBe 0
      c("smj") should be > 0 // co-located sort-merge, not a hidden broadcast

      // contrast: the unbucketed shape shuffles both sides
      val raw = df.join(df.select(col("key"), col("prio").as("rprio")), "key")
      raw.collect()
      WriteAudit.planCounts(raw.queryExecution.executedPlan.toString)(
        "shuffleExchange") should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS wp_left")
      spark.sql("DROP TABLE IF EXISTS wp_right")
    }
  }
}
