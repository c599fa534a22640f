package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the dev harnesses (Smoke, demos, Explain,
  * TimeOne, Profile) — one place for the UTC/nanosAsLong/partition settings
  * instead of seven copies.
  */
object LocalSession {
  def apply(cores: Int = 4, logLevel: String = "WARN"): SparkSession = {
    // SPARK_GRAFT_SHUFFLE overrides shuffle parallelism for scale
    // experiments (default: one partition per core — right for the test
    // scale factors; raise with data volume, see SCALE.md 100x notes)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
