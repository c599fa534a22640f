package graft.pipelines

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** End-to-end golden regression (SURVEY §5.2 item 4): the demo pipelines'
  * CSV outputs must match the committed golden files byte-for-byte. Catches
  * any unintended semantic drift in the PUA/CPA composition across rounds.
  *
  * To regenerate intentionally: run `graft.tools.PipelineDemo /tmp/golden_gen`
  * and concatenate each dataset's part CSVs into
  * src/test/resources/golden/{pretam_pua,cpa_final}.csv.
  */
class GoldenSpec extends SparkSpec {

  private def golden(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def produced(dir: String, dataset: String): Seq[String] = {
    val files = Files.list(Paths.get(dir, dataset)).iterator().asScala
      .filter(_.toString.endsWith(".csv")).toSeq
    files.flatMap(f => Files.readAllLines(f).asScala).toSeq
  }

  "PipelineDemo outputs" should "match the committed golden CSVs exactly" in {
    val out = Files.createTempDirectory("graft_golden").toString
    graft.tools.PipelineDemo.run(spark, out)
    produced(out, "pretam_pua") shouldBe golden("pretam_pua.csv")
    produced(out, "cpa_final") shouldBe golden("cpa_final.csv")
  }
}
