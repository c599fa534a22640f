package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup in its OWN regime — near-identical duplicates (the paper
  * operates at cosine ≥ ~0.95) over a TOPIC-STRUCTURED corpus — on a
  * planted-duplicate fixture. The testdata embeddings carry essentially
  * no such pairs (1 pair at tau 0.6 at sf0.1; SCALE.md round-10 recall
  * note), so until round 11 the high-tau recall claim rested on the
  * k-law probe alone. Here the true pair set is known by construction:
  *
  *  - 8 topic anchors (seeded Gaussian unit directions, d=32 — nearly
  *    orthogonal, as high-d random directions are);
  *  - 200 bases, base i in topic i%8: anchor + moderate intra-topic
  *    noise (clearly inside its topic, margins to other topics large —
  *    the clustered structure SemDeDup's blocking presumes; a
  *    DIRECTION-UNIFORM corpus has razor-thin assignment margins
  *    everywhere and is exactly where cluster blocking loses recall,
  *    per the round-10 probe);
  *  - 50 planted copies of the first 50 bases (base + 1%-scale noise,
  *    renormalized → cosine ≈ 0.998 with its base — the "scraped the
  *    same page twice" regime).
  *
  * Asserted: (1) every planted pair co-assigns to one cluster — the
  * near-collinear co-assignment property the paper's regime relies on;
  * (2) the cluster-blocked survivor set EQUALS the brute-force all-pairs
  * survivor set (same min-id rule, no blocking) — i.e. at high tau over
  * clustered data the blocking trade costs nothing.
  */
class SemDedupRecallSpec extends SparkSpec {
  import spark.implicits._

  private val d = 32
  private val nTopic = 8
  private val nBase = 200
  private val nDup = 50
  private val tau = 0.95

  // deterministic fixture: seeded RNG, values fixed forever
  private lazy val corpus: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(42)
    def gaussian(): Array[Double] = Array.fill(d)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val anchors = IndexedSeq.fill(nTopic)(normalize(gaussian()))
    // intra-topic noise 0.08/component -> noise norm ~0.45: members sit
    // ~24 deg off their anchor, ~90 deg off every other — wide margins
    val bases = (0 until nBase).map { i =>
      val noise = gaussian().map(_ * 0.08)
      normalize(anchors(i % nTopic).zip(noise).map { case (a, b) => a + b })
    }
    val baseRows = bases.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val dupRows = (0 until nDup).map { i =>
      val noise = gaussian().map(_ * 0.01)
      val v = normalize(bases(i).zip(noise).map { case (a, b) => a + b })
      ((nBase + i).toLong, v.map(_.toFloat).toSeq)
    }
    baseRows ++ dupRows
  }

  private lazy val df = corpus.toDF("vec_id", "embedding")

  // fixed centroids = one representative base per topic (ids 0..7 cover
  // topics 0..7 since topic = id % 8) — same model family as the
  // registry's q_ext_semdedup
  private lazy val model = Ivf.fixedModel(df, "vec_id", "embedding",
    (0 until nTopic).map(_.toLong))

  // driver-side brute force over the 250-vector corpus: float-widened
  // cosine, rounded like the engine; margins are huge (planted ≈ 0.998,
  // intra-topic non-dup ≈ 0.8, cross-topic ≈ 0), so arithmetic-order
  // bit noise cannot flip a pair
  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val truePairs: Seq[(Long, Long)] = for {
    (ia, va) <- corpus
    (ib, vb) <- corpus
    if ia < ib && BigDecimal(cos(va, vb)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
  } yield (ia, ib)

  "the planted fixture" should "contain exactly the planted pairs at tau" in {
    // construction check: the only cosine>=0.95 pairs are (base i, dup i)
    truePairs.toSet shouldBe (0 until nDup)
      .map(i => (i.toLong, (nBase + i).toLong)).toSet
  }

  "cluster blocking" should "co-assign every planted pair (recall 1.0 at high tau)" in {
    val assign = df
      .withColumn("c", Ivf.assignExpr(col("embedding"), model))
      .select("vec_id", "c").as[(Long, Int)].collect().toMap
    val coAssigned = truePairs.count { case (a, b) => assign(a) == assign(b) }
    withClue(s"recall ${coAssigned.toDouble / truePairs.size}: ") {
      coAssigned shouldBe truePairs.size
    }
  }

  "SemDedup.dedup" should "equal the brute-force survivor set on the planted corpus" in {
    // brute force: drop any id with a smaller-id neighbor at >= tau,
    // computed WITHOUT blocking
    val dropped = truePairs.map(_._2).toSet // pairs are (smaller, larger)
    val expected = corpus.map(_._1).filterNot(dropped).sorted
    val kept = SemDedup.dedup(df, "vec_id", "embedding", model, tau)
      .select("vec_id").as[Long].collect().sorted
    kept.toSeq shouldBe expected
  }
}
