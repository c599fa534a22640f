package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for operator specs (one JVM-wide session —
  * getOrCreate — so the suite pays startup once).
  */
trait SparkSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  protected def sql = spark.sqlContext
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bounded-buffer typed aggregates: avoid the 128-key
      // ObjectHashAggregate sort fallback (SCALE.md round-10 probe)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
    .getOrCreate()
}
