package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact jane.doe+spam@example.co.uk or call 555-123-4567 today"),
    (2L, "ssn 123-45-6789 leaked from host 192.168.1.254 yesterday"),
    (3L, "no personal information in this row at all"),
    (4L, "intl +1 (555) 123-4567 and plain text"))
    .toDF("doc_id", "text")

  "tag" should "count each PII type and set has_pii" in {
    val out = Pii.tag(docs, "text")
      .select("doc_id", "n_email", "n_ssn", "n_ip", "n_phone", "has_pii")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Int, Boolean)].collect()
    out shouldBe Array(
      (1L, 1, 0, 0, 1, true),
      (2L, 0, 1, 1, 0, true),
      (3L, 0, 0, 0, 0, false),
      (4L, 0, 0, 0, 1, true))
  }

  "redact" should "replace matches with placeholders, specificity-first" in {
    val out = docs.select(col("doc_id"), Pii.redact(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    out(1L) shouldBe "contact [EMAIL] or call [PHONE] today"
    out(2L) shouldBe "ssn [SSN] leaked from host [IP] yesterday"
    out(3L) shouldBe "no personal information in this row at all"
    out(4L) shouldBe "intl [PHONE] and plain text"
  }

  it should "be idempotent" in {
    val once = docs.select(Pii.redact(col("text")).as("r"))
    val twice = once.select(Pii.redact(col("r")).as("r"))
    twice.as[String].collect() shouldBe once.as[String].collect()
  }

  it should "not let the SSN pattern be eaten by the phone pattern" in {
    // 3-2-4 digit grouping is SSN-shaped, not phone-shaped (3-3-4)
    val out = Seq("id 987-65-4321 on file").toDF("text")
      .select(Pii.redact(col("text"))).as[String].collect().head
    out shouldBe "id [SSN] on file"
  }
}
