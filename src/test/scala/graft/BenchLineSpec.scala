package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Locks the bench stdout contract: the driver's harness keeps only the
  * LAST 2000 characters of the line, so the summary must fit that window at
  * any realistic registry size — BENCH_r10–r12 were `parsed: null` for
  * three consecutive rounds because the per-query map overflowed it and
  * pushed every summary key past the cut. No SparkSession needed: the line
  * builder is pure.
  */
class BenchLineSpec extends AnyFlatSpec with Matchers {

  private val mapper = new ObjectMapper()

  private def parseTail2000(line: String): com.fasterxml.jackson.databind.JsonNode = {
    val tail = if (line.length > 2000) line.substring(line.length - 2000) else line
    mapper.readTree(tail)
  }

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q_ext_some_quite_long_query_name_number_$i%03d", i * 0.137))

  "Bench.summaryLine" should "fit the 2000-char stdout window at 200 queries" in {
    val line = Bench.summaryLine(fakeResults(200), 3,
      Seq(68.1, 106.2, 70.6), 71.2, 3.69, Seq(7.13, 6.2, 2.6),
      Nil, "/root/testdata/sf0.1")
    line.length should be <= 1900
    val js = parseTail2000(line)
    js.get("value").asDouble() should be > 0.0
    js.get("n_queries").asInt() shouldBe 200
    js.get("s_per_query").asDouble() should be > 0.0
    js.get("ratio_vs_r1").asDouble() should be > 0.0
    js.get("pass_totals").size() shouldBe 3
    js.get("n_errors").asInt() shouldBe 0
  }

  it should "stay inside the window with many errors (degrades, never overflows)" in {
    val errs = (1 to 120).map(i => f"q_ext_failing_query_with_a_long_name_$i%03d")
    val line = Bench.summaryLine(fakeResults(200), 3,
      Seq(68.1, 106.2, 70.6), 71.2, 3.69, Seq(7.13, 6.2, 2.6),
      errs, "/root/testdata/sf0.1")
    line.length should be <= 1900
    val js = parseTail2000(line)
    js.get("n_errors").asInt() shouldBe 120
    js.get("errors").size() should be > 0
  }

  it should "emit the fixed-mix core25 ratio when all 25 are present at sf0.1" in {
    val core = Bench.Core25.toSeq.sorted.map(k => (k, 0.2))
    val ext = (1 to 95).map(i => (f"q_ext_x_$i%03d", 0.3))
    val line = Bench.summaryLine(core ++ ext, 3, Seq(33.5), 33.5, 1.0,
      Seq(1.0), Nil, "/root/testdata/sf0.1")
    val js = parseTail2000(line)
    js.get("core25_n").asInt() shouldBe 25
    js.get("core25_total").asDouble() shouldBe (25 * 0.2) +- 0.01
    js.get("core25_ratio").asDouble() shouldBe (5.0 / Bench.Core25BaseTotal) +- 0.01
  }

  it should "omit the sf0.1-anchored ratios at other scale factors" in {
    val line = Bench.summaryLine(fakeResults(120), 1, Seq(10.0), 10.0, 1.0,
      Seq(1.0), Nil, "/root/testdata/sf0.01")
    val js = parseTail2000(line)
    js.has("ratio_vs_r1") shouldBe false
    js.has("core25_ratio") shouldBe false
    js.get("n_queries").asInt() shouldBe 120
  }
}
