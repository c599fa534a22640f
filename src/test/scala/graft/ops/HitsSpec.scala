package graft.ops

import graft.SparkSpec

/** [[Hits]]: hand-computed hub/authority fixpoints and partitioning
  * invariance of the quantized normalization.
  */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Hits.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  "hits" should "separate hubs from the authority on a fan-in" in {
    // 1 -> 3, 2 -> 3: node 3 is the sole authority, 1 and 2 equal hubs
    val r = run(Seq((1L, 3L), (2L, 3L)), 2)
    r(3L) shouldBe ((0L, 1000000000000L))
    r(1L) shouldBe ((500000000000L, 0L))
    r(2L) shouldBe ((500000000000L, 0L))
  }

  it should "zero the chain endpoints' off-roles" in {
    // 1 -> 2 -> 3: 3 is never a hub, 1 never an authority
    val r = run(Seq((1L, 2L), (2L, 3L)), 3)
    r(3L)._1 shouldBe 0L
    r(1L)._2 shouldBe 0L
    r(2L)._1 shouldBe 500000000000L
    r(2L)._2 shouldBe 500000000000L
  }

  it should "be invariant to input partitioning" in {
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 30), (i, (i * 11 + 5) % 30)))
    val one = run(edges, 3)
    val many = Hits.hits(edges.toDF("src", "dst").repartition(13),
        "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    many shouldBe one
  }
}
