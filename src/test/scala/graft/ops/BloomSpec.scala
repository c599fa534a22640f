package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Bloom]] — the semi-join reducer must be EXACT (equal to the plain
  * join) despite the sketch's false positives, across string and long keys,
  * tiny fpp-stressing filters, and empty key sides; and the tagBloom
  * decontamination variant must be row-identical to the broadcast form.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val left = (1L to 200L).map(i => (i, s"k${i % 50}"))
    .toDF("id", "key")
  private val rightKeys = Seq("k3", "k17", "k31", "k45", "nope")
    .toDF("rk")

  "semiJoin" should "equal the plain left-semi join" in {
    val expected = left.join(rightKeys.select(col("rk").as("key")),
        Seq("key"), "left_semi")
      .select("id").as[Long].collect().sorted
    val got = Bloom.semiJoin(left, "key", rightKeys, "rk",
        expectedItems = 5)
      .select("id").as[Long].collect().sorted
    got shouldBe expected
    got.nonEmpty shouldBe true
  }

  it should "stay exact when the filter is undersized (high fpp)" in {
    // expectedItems=1 for 5 keys: saturated filter, many false positives —
    // the confirm join must still reduce to the exact result
    val expected = left.join(rightKeys.select(col("rk").as("key")),
        Seq("key"), "left_semi")
      .select("id").as[Long].collect().sorted
    Bloom.semiJoin(left, "key", rightKeys, "rk",
        expectedItems = 1, fpp = 0.5)
      .select("id").as[Long].collect().sorted shouldBe expected
  }

  it should "return no rows for an empty key side" in {
    Bloom.semiJoin(left, "key", rightKeys.limit(0), "rk",
      expectedItems = 1).count() shouldBe 0L
  }

  "antiJoin" should "equal the plain left-anti join, including null keys" in {
    val withNull = left.unionAll(
      Seq((999L, null.asInstanceOf[String])).toDF("id", "key"))
    val expected = withNull.join(rightKeys.select(col("rk").as("key")),
        Seq("key"), "left_anti")
      .select("id").as[Long].collect().sorted
    val got = Bloom.antiJoin(withNull, "key", rightKeys, "rk",
        expectedItems = 5)
      .select("id").as[Long].collect().sorted
    got shouldBe expected
    got should contain(999L) // null key never matches -> kept
  }

  it should "keep everything for an empty key side" in {
    Bloom.antiJoin(left, "key", rightKeys.limit(0), "rk",
      expectedItems = 1).count() shouldBe left.count()
  }

  "build" should "reject out-of-range fpp" in {
    an[IllegalArgumentException] should be thrownBy
      Bloom.build(rightKeys, col("rk"), 5, fpp = 0.0)
  }

  "tagBloom" should "be row-identical to the broadcast tag" in {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_contaminated", "contaminated")
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    val viaBroadcast =
      rows(Decontaminate.tag(train, "doc_id", "text", bench, "text", n = 3))
    val viaBloom =
      rows(Decontaminate.tagBloom(train, "doc_id", "text", bench, "text", n = 3))
    viaBloom shouldBe viaBroadcast
    viaBroadcast.count(_._3) should be > 0 // the leak path is exercised
  }
}
