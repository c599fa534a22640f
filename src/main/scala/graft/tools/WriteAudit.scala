package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.io.Sinks
import graft.ops.Dedup

/** Write-path plan audit (PLANS.md covers reads; this covers sinks).
  *
  * Captures the EXECUTED plan of each write command via a
  * QueryExecutionListener and counts the operators that matter at scale:
  * shuffle exchanges, sorts, windows. The claims under audit (SCALE.md §Dedup,
  * `Sinks.parquet` scaladoc):
  *
  *  1. a parquet write after `Dedup.keepFirst` adds NO exchange beyond the
  *     window's own hash partitioning — file sinks require a task-local sort
  *     (V1Writes), never a distribution;
  *  2. when the write's partition columns are a PREFIX of the window's
  *     partition keys, the window's existing sort also satisfies the write's
  *     required ordering — no second sort;
  *  3. two tables bucketed on their join key join with zero exchanges on
  *     either side (broadcast disabled to force the worst case).
  *
  * Usage: `sbt "runMain graft.tools.WriteAudit [sfDir] [outDir]"`.
  */
object WriteAudit {

  /** Run `work` and return the executed-plan string of the write command it
    * triggers. The listener bus is async, so poll briefly (dev tool — the
    * bounded wait is fine here).
    */
  def captureWritePlan(spark: SparkSession)(work: => Unit): String = {
    val captured = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val cmd = qe.executedPlan.toString
        if (cmd.contains("WriteFiles") || cmd.contains("InsertIntoHadoopFsRelationCommand") ||
            cmd.contains("CreateDataSourceTableAsSelectCommand"))
          captured.add(cmd)
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      work
      var tries = 0
      while (captured.isEmpty && tries < 200) { Thread.sleep(50); tries += 1 }
      require(!captured.isEmpty, "no write command captured — listener saw nothing in 10s")
      captured.peek()
    } finally spark.listenerManager.unregister(listener)
  }

  /** (shuffle exchanges, sorts, windows) in a plan string. BroadcastExchange
    * is counted separately from shuffles; `Sort [` does not match
    * SortMergeJoin/SortAggregate.
    */
  def planCounts(plan: String): Map[String, Int] = Map(
    "shuffleExchange" -> "(?<!Broadcast)Exchange ".r.findAllIn(plan).length,
    "broadcastExchange" -> "BroadcastExchange".r.findAllIn(plan).length,
    "sort" -> "Sort \\[".r.findAllIn(plan).length,
    "window" -> "Window \\[".r.findAllIn(plan).length,
    "smj" -> "SortMergeJoin".r.findAllIn(plan).length
  )

  def fmt(c: Map[String, Int]): String =
    f"shuffle=${c("shuffleExchange")} bcast=${c("broadcastExchange")} sort=${c("sort")} window=${c("window")} smj=${c("smj")}"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_write_audit")
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // PUA/CPA shape: keep-first dedup on a business key under an explicit
    // total order (Dedup.scala keepFirst), then persist.
    def deduped: DataFrame = Dedup.keepFirst(
      orders,
      keys = Seq("o_orderstatus", "o_custkey"),
      order = Seq(col("o_orderdate").asc, col("o_orderkey").asc))

    def report(label: String, plan: String): Map[String, Int] = {
      val c = planCounts(plan)
      println(f"$label%-42s ${fmt(c)}")
      if (sys.env.contains("WRITE_AUDIT_DUMP")) println(plan)
      c
    }

    val plain = captureWritePlan(spark) { Sinks.parquet(orders, s"$out/plain") }
    report("write, no dedup (baseline)", plain)

    val afterDedup = captureWritePlan(spark) { Sinks.parquet(deduped, s"$out/dedup_plain") }
    report("keepFirst -> unpartitioned parquet", afterDedup)

    val prefixPart = captureWritePlan(spark) {
      Sinks.parquet(deduped, s"$out/dedup_by_status", partitionBy = Seq("o_orderstatus"))
    }
    report("keepFirst -> partitionBy(window-key prefix)", prefixPart)

    val nonPrefix = captureWritePlan(spark) {
      Sinks.parquet(deduped, s"$out/dedup_by_prio", partitionBy = Seq("o_orderpriority"))
    }
    report("keepFirst -> partitionBy(non-key column)", nonPrefix)

    // Bucketed co-location: force the no-broadcast worst case and show the
    // bucket metadata removes both exchanges from the join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    Sinks.bucketedTable(orders, "wa_orders", "o_custkey", 16, path = Some(s"$out/bt_orders"))
    Sinks.bucketedTable(customer.withColumnRenamed("c_custkey", "o_custkey"),
      "wa_customer", "o_custkey", 16, path = Some(s"$out/bt_customer"))
    val joined = spark.table("wa_orders").join(spark.table("wa_customer"), "o_custkey")
    joined.collect()
    report("bucketed(16) join, broadcast disabled",
      joined.queryExecution.executedPlan.toString)

    // Contrast: same join over the raw (unbucketed) parquet shuffles both sides.
    val rawJoin = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    rawJoin.collect()
    report("unbucketed join, broadcast disabled",
      rawJoin.queryExecution.executedPlan.toString)

    spark.stop()
  }
}
