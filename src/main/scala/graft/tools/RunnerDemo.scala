package graft.tools

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.pipelines.{Cpa, Runner}

/** Dev harness: drives the whole-program Runner — file discovery by regex,
  * first-match pick, CSV ingest, both pipelines, stamped CSV outputs, V1
  * load summary. Usage: `sbt "runMain graft.tools.RunnerDemo"`.
  */
object RunnerDemo {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession(cores = 4, logLevel = "WARN")

    val dir = Files.createTempDirectory("graft_runner_demo").toFile
    def write(name: String, lines: Seq[String]): Unit =
      Files.writeString(new java.io.File(dir, name).toPath, lines.mkString("\n"))

    write("monthly_PUA_file.csv", Seq(
      "UIN,Pay ID,Year,Pay #,Seq #,POSN,SUFF,College Code,College Name,TS COA,TS ORG,DEPT Code,Department Name,ECLS,ECLS DESC,TE M,Earn Code,DESCRIPTION,ADJ Reason Code,ADJ Reason DESC,Calc Date",
      "U1,BW,2026,7,1,123.0,0,KL,Engineering,1,602000,604.0,CS Dept,CA,Civil Service,W,RGS,Regular,,,2026-01-15"))
    val certHeader = Cpa.expectedColumns.mkString(",")
    def certRow(uin: String, tran: String, dt: String, job: String, payId: String) =
      s"$uin,2026,$payId,7,1,$tran,C,R,$dt,$dt,$job,T,1,602000,CA,KL-Engineering,O,L,F,E,e@x,10.5,,,,1,R,3 - Apply,RB,N,,1,2,3"
    write("cert_BW_2026.csv", Seq(certHeader, certRow("100", "T1", "2025-09-01", "101", "BW")))
    write("cert_MN_2026.csv", Seq(certHeader, certRow("400", "T5", "2026-01-10", "201", "MN")))
    write("TS_Org.csv", Seq("TS-Org Code,TS-Org Title", "1-602000,Engineering Org"))
    write("TS_Dept.csv", Seq("TS-Org Dept Code,TS-Org Dept Title", "1-604,Engineering Dept"))
    write("Overtime_E_Class.csv", Seq(
      "Job Eclass,Pay ID,Overtime FLSA,Job Detail E-Class Long Desc",
      "CA,BW,Eligible,Civil Service Long"))
    write("TE_M.csv", Seq("UIN Job,TE M,Time Entry Method,Time Entry Type", "100-101,W,Web,T1"))

    val outDir = Files.createTempDirectory("graft_runner_demo_out").toString
    val result = Runner.run(spark, dir.getAbsolutePath, Some(outDir),
      LocalDate.of(2026, 8, 12), dedupOrder = Seq(col("UIN")))

    result.loadSummary.foreach(s =>
      println(f"[runner-demo] input ${s.name}%-10s found=${s.found}%-5s used=${s.used}%-5s ${s.path.getOrElse("-")}"))
    println(s"[runner-demo] pua rows=${result.pua.map(_.count()).getOrElse(-1L)}")
    println(s"[runner-demo] cpa rows=${result.cpa.map(_.output.count()).getOrElse(-1L)}")
    println(s"[runner-demo] outputs: " + new java.io.File(outDir).list().sorted.mkString(", "))
    spark.stop()
  }
}
