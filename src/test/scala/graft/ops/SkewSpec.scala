package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val fact = (1 to 80).map(i => ("hot", i)).++(Seq(("cold", 99), ("miss", 1)))
    .toDF("k", "ord")
  private val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "name")

  "saltedLookupLeft" should "produce the same result as a plain lookup join" in {
    val plain = LookupJoin.lookupLeft(fact, dim, Seq("k"))
      .orderBy("k", "ord").select("k", "ord", "name").collect()
    val salted = Skew.saltedLookupLeft(fact, dim, "k", saltSource = col("ord"), salts = 4)
      .orderBy("k", "ord").select("k", "ord", "name").collect()
    salted shouldBe plain
    salted.length shouldBe 82 // no fan-out, no loss
  }

  "saltedCount" should "match groupBy().count() exactly" in {
    val expected = fact.groupBy("k").count().orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedCount(fact, "k", saltSource = col("ord"), salts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    salted shouldBe expected
  }

  "keySkewProfile" should "surface the hot key with its share" in {
    val top = Skew.keySkewProfile(fact, "k", topN = 1).collect().head
    top.getString(0) shouldBe "hot"
    top.getLong(1) shouldBe 80L
    top.getDouble(2) shouldBe (80.0 / 82) +- 1e-4
  }
}
