package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Demonstrates the division of labor for skew (SCALE.md / Skew scaladoc):
  * AQE's skew-join optimization splits oversized JOIN partitions at
  * runtime with no code change — so the engine's salting (`ops/Skew`) is
  * reserved for what AQE cannot touch: skewed AGGREGATIONS, and joins
  * below AQE's size thresholds. This spec pins the AQE half so the claim
  * is executable, not folklore.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  "AQE" should "split a skewed sort-merge join partition at runtime" in {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // enough partitions that the MEDIAN partition is a non-hot one —
      // skew detection compares against factor × median, so with too few
      // partitions the hot partition IS the median and never triggers
      conf.set("spark.sql.shuffle.partitions", "16")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 100k-row fact, 90% on one key -> one shuffle partition dwarfs the rest
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), lit("d").as("v"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS QueryExecution — count() would spawn its
      // own, leaving this plan un-finalized (isFinalPlan=false, no AQE
      // rewrite visible)
      joined.collect().length shouldBe 90100 // 90k on hot key 0 + ids 0,10,…,990
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      withClue(s"expected a skew=true SMJ in:\n$plan\n") {
        plan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  "salted aggregation" should "remain necessary where AQE skew-join cannot help" in {
    // AQE's skew handling only rewrites JOIN partitions; a skewed groupBy
    // still funnels one key's rows through one task — Skew.saltedCount is
    // the engine's answer, asserted equivalent to the plain aggregate.
    val skewed = spark.range(0, 50000)
      .select(when(col("id") % 100 =!= 0, lit("hot")).otherwise(lit("cold")).as("k"),
        col("id"))
    val salted = Skew.saltedCount(skewed.toDF(), "k",
        saltSource = col("id"), salts = 8)
      .orderBy("k").as[(String, Long)].collect()
    val plain = skewed.groupBy("k").count()
      .orderBy("k").as[(String, Long)].collect()
    salted shouldBe plain
  }
}
