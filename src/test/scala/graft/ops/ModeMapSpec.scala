package graft.ops

import graft.SparkSpec

class ModeMapSpec extends SparkSpec {
  import spark.implicits._

  "modePerKey" should "pick the most frequent value per key" in {
    val df = Seq(("k1", "a"), ("k1", "b"), ("k1", "b"), ("k2", "z")).toDF("k", "v")
    val out = ModeMap.modePerKey(df, "k", "v").orderBy("k").collect()
    out.map(r => (r.getString(0), r.getString(1), r.getLong(2))) shouldBe
      Array(("k1", "b", 2L), ("k2", "z", 1L))
  }

  it should "break ties to the SMALLEST value (pandas mode() sorts ascending)" in {
    val df = Seq(("k", "z"), ("k", "a"), ("k", "z"), ("k", "a")).toDF("k", "v")
    val out = ModeMap.modePerKey(df, "k", "v").collect()
    out.head.getString(1) shouldBe "a"
  }

  it should "ignore null values" in {
    val df = Seq(("k", Some("a")), ("k", None), ("k", None)).toDF("k", "v")
    val out = ModeMap.modePerKey(df, "k", "v").collect()
    out.head.getString(1) shouldBe "a"
  }

  "fillWithModePerKey" should "fill blank targets from the per-key mode" in {
    val df = Seq(
      ("g1", "web", "web"), ("g1", "web", ""), ("g1", "api", null),
      ("g2", "cli", "KEEP")).toDF("k", "v", "t")
    val out = ModeMap.fillWithModePerKey(df, "k", "v", "t")
      .orderBy("k", "v").select("t").as[String].collect()
    out shouldBe Array("web", "web", "web", "KEEP")
  }
}
