package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke harness mirroring the driver's t1 check: SparkEntry.entry must
  * return rows > 0 on sf0.001. Usage: `sbt "runMain graft.tools.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (${if (n > 0) "PASS" else "FAIL"})")
    spark.stop()
  }
}
