package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the dev harnesses (Smoke, demos, Explain,
  * TimeOne, Profile) — one place for the UTC/nanosAsLong/partition settings
  * instead of seven copies.
  */
object LocalSession {
  def apply(cores: Int = 4, logLevel: String = "WARN"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
