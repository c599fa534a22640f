package graft.tools

import java.time.LocalDate

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.pipelines.{Cpa, Pua}

/** Dev harness: runs both payroll pipelines end-to-end on tiny reference-shaped
  * inputs and writes CSV outputs (exercising graft.io.Sinks), printing row
  * counts and layouts. Usage: `sbt "runMain graft.tools.PipelineDemo [outDir]"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_pipeline_demo")
    val spark = LocalSession(cores = 4, logLevel = "WARN")
    run(spark, outDir)
    spark.stop()
  }

  /** The demo body, callable from specs (golden-output regression). */
  def run(spark: org.apache.spark.sql.SparkSession, outDir: String): Unit = {
    import spark.implicits._

    // --- PUA ---
    val pua = Seq(
      ("U1", "BW", "2026", "7", "1", "123.0", "0.0", "KL", "Engineering", "1",
        "602000", "604.0", "CS Dept", "CA", "Civil Service", "W", "RGS",
        "Regular", "", "", "2026-01-15"),
      ("U2", "MN", "2026", "8", "1", "456", "1", "LP", "Arts", "2", null,
        "999", "Fallback Dept", "AB", "Academic", "P", "RGS", "Regular",
        "nan", "x", "bogus"))
      .toDF("UIN", "Pay ID", "Year", "Pay #", "Seq #", "POSN", "SUFF",
        "College Code", "College Name", "TS COA", "TS ORG", "DEPT Code",
        "Department Name", "ECLS", "ECLS DESC", "TE M", "Earn Code",
        "DESCRIPTION", "ADj Reason Code", "Adj Reason", "Calc Date")
    val puaLookups = Pua.Lookups(
      tsOrg = Seq(("1-602000", "Engineering Org")).toDF("TS-Org Code", "TS-Org Title"),
      tsDept = Seq(("1-604", "Engineering Dept Title")).toDF("TS-Org Dept Code", "TS-Org Dept Title"),
      overtime = Seq(("CA", "Eligible")).toDF("Job Eclass", "Overtime FLSA"),
      teM = Seq(("W", "Web"), ("P", "Positive")).toDF("TE M", "Time Entry Method"))
    val puaOut = Pua.run(pua, puaLookups, dedupOrder = Seq(col("Calc Date")))
    puaOut.show(5, truncate = false)
    graft.io.Sinks.singleCsv(puaOut, s"$outDir/pretam_pua")
    // reference writes CSV + XLSX side by side (S5+S6)
    new java.io.File(outDir).mkdirs()
    graft.io.Xlsx.write(puaOut, s"$outDir/pretam_pua.xlsx")
    val xlsxBack = graft.io.Xlsx.read(spark, s"$outDir/pretam_pua.xlsx").count()
    println(s"[demo] PUA rows=${puaOut.count()} cols=${puaOut.columns.length} -> $outDir/pretam_pua (+ .xlsx, reads back $xlsxBack rows)")

    // --- CPA ---
    val cols = Cpa.expectedColumns
    def row(vals: Map[String, String]): Row =
      Row.fromSeq(cols.map(c => vals.getOrElse(c, "x")))
    val base = Map("PAY_YEAR" -> "2026", "PAY_NBR" -> "7", "PAY_SEQ" -> "1",
      "ACTION" -> "3 - Apply", "HRLY_RATE" -> "10.5")
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    def mk(rows: Seq[Map[String, String]]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.map(row), 2), schema)
    val bw = mk(Seq(base ++ Map("UIN" -> "100", "TRAN_ID" -> "T1", "PAY_ID" -> "BW",
      "TRAN_CREATE_DT" -> "2025-09-01", "TRAN_CLOSED_DT" -> "2025-09-02",
      "JOB" -> "101.0", "JOB_TS_COAS" -> "1", "JOB_TS_ORGN" -> "602000",
      "JOB_ECLS" -> "CA", "COLLEGE" -> "KL-Engineering")))
    val mn = mk(Seq(base ++ Map("UIN" -> "400", "TRAN_ID" -> "T5", "PAY_ID" -> "MN",
      "TRAN_CREATE_DT" -> "2026-01-10", "TRAN_CLOSED_DT" -> "2026-01-11",
      "JOB" -> "201", "JOB_TS_COAS" -> "nan", "JOB_TS_ORGN" -> "nan",
      "JOB_ECLS" -> "AB", "COLLEGE" -> "LAW")))
    val cpaLookups = Cpa.Lookups(
      tsOrg = Seq(("1-602000", "Engineering Org")).toDF("TS-Org Code", "TS-Org Title"),
      tsDept = Seq(("1-602", "Engineering Dept")).toDF("TS-Org Dept Code", "TS-Org Dept Title"),
      overtime = Seq(("CA", "BW", "Eligible", "Civil Service Long"))
        .toDF("Job Eclass", "Pay ID", "Overtime FLSA", "Job Detail E-Class Long Desc"),
      teM = Seq(("100-101.0", "W", "Web", "T1")).toDF("UIN Job", "TE M", "Time Entry Method", "Time Entry Type"))
    val result = Cpa.run(bw, mn, cpaLookups, LocalDate.of(2026, 8, 12),
      dedupOrder = Seq(col("TRAN_ID")))
    result.output.show(5, truncate = false)
    graft.io.Sinks.singleCsv(result.output, s"$outDir/cpa_final")
    println(s"[demo] CPA rows=${result.output.count()} cols=${result.output.columns.length}" +
      s" schemaIssues=${result.schemaIssues.size} -> $outDir/cpa_final")
  }
}
