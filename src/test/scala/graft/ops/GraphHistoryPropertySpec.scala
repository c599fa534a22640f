package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Property checks for the round-10 graph/history/LM tiers: invariants
  * that example specs can't sweep — random graphs, random snapshot
  * chains, random corpora (ScalaCheck generators sampled directly, as in
  * [[PropertySpec]]).
  */
class GraphHistoryPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val trials = 3

  private val edgeGen: Gen[(Long, Long)] = for {
    s <- Gen.choose(0L, 19L); d <- Gen.choose(0L, 19L)
  } yield (s, d)

  "pageRank" should "conserve mass within truncation and stay non-negative" in {
    (1 to trials).foreach { _ =>
      val edges = sample(edgeGen, 40).distinct
      val r = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 3)
        .collect().map(_.getLong(1))
      val n = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
      r.foreach(_ should be >= 0L)
      // each of 3 iterations truncates <= 1 unit per node per term
      r.sum should be > (PageRank.Scale - 10L * n)
      r.sum should be <= PageRank.Scale
    }
  }

  "trustRank" should "never rank an unreachable node above zero" in {
    (1 to trials).foreach { _ =>
      // component A on 0-9, component B on 10-19, seeds only in A
      val a = sample(edgeGen.map { case (s, d) => (s % 10, d % 10) }, 20)
      val b = sample(edgeGen.map { case (s, d) => (s % 10 + 10, d % 10 + 10) }, 20)
      val r = PageRank.trustRank((a ++ b).distinct.toDF("src", "dst"),
          "src", "dst", Seq(0L, 3L).toDF("node"), "node", 3)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      r.filter(_._1 >= 10).values.foreach(_ shouldBe 0L)
    }
  }

  "hits" should "keep both score vectors in [0, Scale] and L1 ~ Scale" in {
    (1 to trials).foreach { _ =>
      val edges = sample(edgeGen, 40).distinct
      val rows = Hits.hits(edges.toDF("src", "dst"), "src", "dst", 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      rows.foreach { case (h, a) =>
        h should (be >= 0L and be <= PageRank.Scale)
        a should (be >= 0L and be <= PageRank.Scale)
      }
      val n = rows.length
      rows.map(_._2).sum should be > (PageRank.Scale - 2L * n)
    }
  }

  private val wordGen: Gen[String] = Gen.oneOf("a", "b", "c", "dd", "ee")
  private val textGen: Gen[String] =
    Gen.listOfN(4, wordGen).map(_.mkString(" "))

  "Scd2 merge chains" should "reconstruct each snapshot via asOf" in {
    val hash = (df: DataFrame) => TextDedup.contentHash(df("text"))
    (1 to trials).foreach { _ =>
      val dates = Seq("2026-01-01", "2026-02-01", "2026-03-01")
      val snaps = dates.map { d =>
        d -> sample(for {
          k <- Gen.choose(0L, 6L); t <- textGen
        } yield (k, t), 8).distinctBy(_._1)
      }
      var hist = Scd2.init(snaps.head._2.toDF("id", "text"), "id",
        Seq("text"), hash, snaps.head._1)
      snaps.tail.foreach { case (d, rows) =>
        hist = Scd2.merge(hist, rows.toDF("id", "text"), "id", Seq("text"),
          hash, d)
      }
      snaps.foreach { case (d, rows) =>
        val got = Scd2.asOf(hist, d)
          .select("id", "text").as[(Long, String)].collect().toSet
        // asOf compares by content hash: normalization-equivalent edits
        // keep the ORIGINAL payload, so compare normalized text
        def norm(s: Set[(Long, String)]) =
          s.map { case (k, t) => (k, t.trim.toLowerCase.replaceAll("\\s+", " ")) }
        norm(got) shouldBe norm(rows.toSet)
      }
    }
  }

  "NgramLm.avgLogProb" should "only produce non-positive nano-nat sums" in {
    (1 to trials).foreach { _ =>
      val docs = sample(textGen, 10).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      NgramLm.avgLogProb(docs.toDF("id", "text"), "id", "text")
        .collect().foreach { r =>
          // add-one smoothing: every probability < 1 -> ln < 0
          r.getLong(2) should be <= 0L
          r.getDouble(3) should be <= 0.0
        }
    }
  }
}
