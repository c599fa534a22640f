package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Property-based checks (SURVEY §5.2): normalizer idempotence/null-safety,
  * dedup invariants, guarded-join row counts. ScalaCheck generators sampled
  * directly (no scalatestplus bridge in the offline cache); each property
  * runs several generated batches through real Spark plans.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val codeGen: Gen[String] = Gen.oneOf(
    Gen.choose(0, 99999).map(_.toString),
    Gen.choose(0, 99999).map(n => s"$n.0"),
    Gen.choose(0, 999).map(n => s"$n.05"),
    Gen.const(""), Gen.const("  "), Gen.const("nan"),
    Gen.alphaNumStr.map(_.take(8)))

  private val trials = 5

  "stripDecimal" should "be idempotent and never leave a trailing .0" in {
    (1 to trials).foreach { _ =>
      val xs = sample(codeGen, 30)
      val once = xs.toDF("x").select(Normalize.stripDecimal($"x").as("y"))
      val onceVals = once.as[String].collect()
      val twiceVals = once.select(Normalize.stripDecimal($"y")).as[String].collect()
      onceVals shouldBe twiceVals
      onceVals.foreach(s => s should not endWith ".0")
    }
  }

  "astypeStr" should "never produce null" in {
    (1 to trials).foreach { _ =>
      val xs = sample(Gen.option(codeGen), 30)
      xs.toDF("x").select(Normalize.astypeStr($"x")).as[String].collect()
        .foreach(s => s should not be null)
    }
  }

  "keepFirst" should "emit one row per key, a subset of the input, stably" in {
    val rowGen = for {
      k <- Gen.choose(0, 5); ord <- Gen.choose(0, 100)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (k, ord, v)
    (1 to trials).foreach { _ =>
      val rows = sample(rowGen, 40)
      val df = rows.toDF("k", "ord", "v")
      val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("v")))
      out.select("k").distinct().count() shouldBe out.count()
      out.count() shouldBe rows.map(_._1).distinct.size.toLong
      out.join(df, Seq("k", "ord", "v"), "left_anti").count() shouldBe 0
      // permutation stability under the total order
      val shuffled = Dedup.keepFirst(scala.util.Random.shuffle(rows).toDF("k", "ord", "v"),
        Seq("k"), Seq(col("ord"), col("v")))
      shuffled.orderBy("k").collect() shouldBe out.orderBy("k").collect()
    }
  }

  "lookupLeft" should "preserve fact row count exactly when the dim is deduped" in {
    (1 to trials).foreach { _ =>
      val fact = sample(Gen.zip(Gen.choose(0, 8), Gen.alphaStr.map(_.take(3))), 25)
      val dim = sample(Gen.zip(Gen.choose(0, 8), Gen.const("D")), 15)
      val joined = LookupJoin.lookupLeft(fact.toDF("k", "v"), dim.toDF("k", "name"), Seq("k"))
      joined.count() shouldBe fact.size.toLong
    }
  }

  "unionHarmonize" should "preserve total row count with missing columns" in {
    (1 to trials).foreach { _ =>
      val a = sample(Gen.choose(0, 100), 10)
      val b = sample(Gen.choose(0, 100), 7)
      val da = a.toDF("id").withColumn("extra", lit("x"))
      val db = b.toDF("id")
      Reshape.unionHarmonize(Seq(da, db)).count() shouldBe (a.size + b.size).toLong
    }
  }

  "misra_gries" should "hold the presence and lower-bound guarantees on random skewed streams" in {
    val tokenGen = Gen.frequency(
      5 -> Gen.const("heavy"), 2 -> Gen.const("warm"),
      3 -> Gen.choose(0, 500).map(i => s"rare$i"))
    (1 to trials).foreach { _ =>
      val toks = sample(tokenGen, 400)
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val cap = 4
      val got = toks.toDF("token")
        .repartition(5)
        .agg(graft.functions.SketchExpressions.misra_gries(col("token"), cap))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got.size should be <= cap
      got.foreach { case (t, c) =>
        c should be <= truth(t)          // lower bound never exceeds truth
        c should be >= truth(t) - n / (cap + 1)
      }
      truth.filter(_._2 > n / (cap + 1)).keys
        .foreach(t => got.keySet should contain(t)) // guaranteed presence
    }
  }

  "systematicWeighted" should "draw k copies with per-row proportionality within 1" in {
    val rowGen = Gen.zip(Gen.choose(1L, 500L), Gen.choose(0L, 20L))
    (1 to trials).foreach { i =>
      val rows = sample(rowGen, 60).groupBy(_._1).map {
        case (id, ws) => (id, ws.head._2)
      }.toSeq
      val total = rows.map(_._2).sum
      if (total > 0) {
        val k = 10L + i
        val out = Sampling.systematicWeighted(rows.toDF("id", "w"), "id", "w", k)
          .as[(Long, Long, Long)].collect()
        out.map(_._3).sum shouldBe k
        out.foreach { case (_, w, c) =>
          math.abs(c - k.toDouble * w / total) should be <= 1.0
        }
      }
    }
  }
}
