package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextDedup

/** Parity of the native jaccard_sim kernel with the
  * array_intersect/array_union composition on every edge shape.
  */
class JaccardExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (1, Seq("a", "b", "c"), Seq("b", "c", "d")),            // plain overlap
    (2, Seq("a", "a", "b"), Seq("a", "b", "b")),            // duplicates collapse
    (3, Seq("a"), Seq("x")),                                 // disjoint
    (4, Seq.empty[String], Seq.empty[String]),               // both empty -> 0.0
    (5, Seq.empty[String], Seq("x")),                        // one empty
    (6, Seq("a", null, "b"), Seq(null, "b")),                // null elements match
    (7, Seq("a", null), Seq("a")),                           // null on one side only
    (8, Seq("same"), Seq("same")))                           // identical singletons
    .toDF("id", "a", "b")

  "jaccard_sim" should "match the intersect/union composition on all edge shapes" in {
    val native = pairs.select(col("id"),
      TextDedup.jaccard(col("a"), col("b")).as("j"))
      .orderBy("id").as[(Int, Double)].collect()
    val hof = pairs.select(col("id"),
      TextDedup.jaccardHof(col("a"), col("b")).as("j"))
      .orderBy("id").as[(Int, Double)].collect()
    native shouldBe hof
    native.find(_._1 == 4).get._2 shouldBe 0.0 // both-empty guard
    native.find(_._1 == 8).get._2 shouldBe 1.0
  }

  it should "propagate a null array as null like the composition" in {
    val withNull = Seq((1, Seq("a"), null.asInstanceOf[Seq[String]]))
      .toDF("id", "a", "b")
    val n = withNull.select(TextDedup.jaccard(col("a"), col("b"))).collect().head
    val h = withNull.select(TextDedup.jaccardHof(col("a"), col("b"))).collect().head
    n.isNullAt(0) shouldBe true
    h.isNullAt(0) shouldBe true
  }

  it should "match on real shingle pairs from the corpus" in {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
    val p = docs.as("x").join(
        docs.withColumn("doc_id", col("doc_id") + 1).as("y"), Seq("doc_id"))
      .select(col("x.sh").as("a"), col("y.sh").as("b"))
    val diff = p.select(
      sum(when(abs(TextDedup.jaccard(col("a"), col("b")) -
        TextDedup.jaccardHof(col("a"), col("b"))) > 0, 1).otherwise(0)).as("d"))
      .collect().head.getLong(0)
    diff shouldBe 0L
  }
}
