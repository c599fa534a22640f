package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY §2.1 S5-S7).
  *
  * The reference writes single CSV/XLSX files back to Box
  * (etl_payroll_pipeline_demo.py:426-479,:744-799). Engine core emits CSV and
  * Parquet; Excel is an adapter boundary (no POI jar — SURVEY §7.5).
  */
object Sinks {

  /** Single headered CSV file (reference-parity shape, S5). `coalesce(1)` is
    * deliberate and only valid for dim-scale outputs; large outputs use
    * [[parquet]] with partitioning.
    */
  def singleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Scale-path sink: partitioned Parquet. Partition columns chosen by the
    * caller to match the upstream shuffle key so the write adds no exchange.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed table sink: co-locates future joins/aggregations on
    * `bucketBy` — two tables bucketed identically on their join key join with
    * NO exchange on either side (the brief's "bucketing for co-located
    * joins"). Requires a table (bucket metadata lives in the catalog);
    * `path` makes it external (data outside the warehouse dir).
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** JSON-lines sink, optionally partitioned — the interchange format for
    * downstream non-JVM consumers of pipeline outputs.
    */
  def jsonLines(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  /** ORC sink, optionally partitioned — same columnar guarantees as the
    * parquet sink for Hive-ecosystem consumers.
    */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Date-stamped output name (S7, reference etl_payroll_pipeline_demo.py:432):
    * explicit runDate, never wall-clock (SURVEY §7.6 risk 4).
    */
  def stampedName(prefix: String, runDate: java.time.LocalDate, ext: String): String =
    f"${prefix}_${runDate.getMonthValue}%02d${runDate.getDayOfMonth}%02d${runDate.getYear}.$ext"
}
