package graft.ops

import graft.SparkSpec

/** The graph tier's `*Managed` cache-lifecycle handles: after `release()`
  * (or `use`), ZERO persisted RDDs introduced by the run remain — neither
  * SQL-cache pins (nodes/edges/outdeg/rank generations) nor the
  * lineage-truncation localCheckpoint blocks, which live outside the SQL
  * cache and leaked until session teardown before round 11.
  *
  * The check diffs `sparkContext.getPersistentRDDs` around the run: the
  * map's entries are removed synchronously by unpersist, and suites run
  * sequentially in the forked test JVM, so the diff is race-free. Value
  * parity with the plain forms is asserted on the same fixtures.
  */
class GraphManagedSpec extends SparkSpec {

  import spark.implicits._

  // this suite locks the DISTRIBUTED loop's cache lifecycle: pin that
  // regime, or the tiny fixtures take the round-14 local fast path and
  // every leak assertion passes vacuously (GraphLocalPathSpec covers the
  // local regime's value parity)
  sys.props("graft.graph.localEdgesMax") = "0"

  override def afterAll(): Unit = {
    sys.props -= "graft.graph.localEdgesMax"
    super.afterAll()
  }

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (2L, 3L))

  /** Run a managed build, assert it pinned something while live, release,
    * and assert the persisted-RDD map returns exactly to its baseline.
    * Returns the materialized rows.
    */
  private def checkLifecycle(build: => Managed): Array[org.apache.spark.sql.Row] = {
    val before = persistedIds
    val m = build
    val rows = m.use(_.collect())
    val after = persistedIds
    withClue(s"leaked persistent RDDs ${after.diff(before)}: ") {
      after.diff(before) shouldBe empty
    }
    rows
  }

  "pageRankManaged" should "release all pins and checkpoint blocks, matching the plain form" in {
    // 7 iterations crosses the cadence-3 checkpoint twice
    val managed = checkLifecycle(
        PageRank.pageRankManaged(edges.toDF("src", "dst"), "src", "dst", 7))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    managed shouldBe plain
  }

  "trustRankManaged" should "release all pins, matching the plain form" in {
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val managed = checkLifecycle(
        PageRank.trustRankManaged(edges.toDF("src", "dst"), "src", "dst",
          seeds, "node", 5))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = PageRank.trustRank(edges.toDF("src", "dst"), "src", "dst",
        seeds, "node", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    managed shouldBe plain
  }

  "pageRankConvergedManaged" should "release the per-round checkpoints" in {
    val before = persistedIds
    val c = PageRank.pageRankConvergedManaged(
      edges.toDF("src", "dst"), "src", "dst",
      epsilonScaled = 1000000000L, maxIterations = 40)
    val rows = c.ranks.use(_.collect())
    rows should not be empty
    c.deltaScaled should be <= 1000000000L
    withClue(s"leaked persistent RDDs ${persistedIds.diff(before)}: ") {
      persistedIds.diff(before) shouldBe empty
    }
  }

  "hitsManaged" should "release all pins and half-step checkpoints, matching the plain form" in {
    val managed = checkLifecycle(
        Hits.hitsManaged(edges.toDF("src", "dst"), "src", "dst", 3))
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val plain = Hits.hits(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    managed shouldBe plain
  }

  "in-loop generation release" should "never free a CALLER'S checkpoint-backed input" in {
    // round-11 review finding: a deep checkpoint-RDD walk on a
    // first-generation frame (round-1 hubs / converged prev = r0) reaches
    // THROUGH the operator's frames into the caller's edges argument —
    // if that argument is itself localCheckpoint-backed, releasing it
    // destroys irrecoverable blocks and the caller's next action throws.
    // The in-loop releases now use directCheckpointRdds; this drives the
    // exact scenario and re-reads the input afterwards.
    val cpEdges = edges.toDF("src", "dst").localCheckpoint(true)
    Hits.hitsManaged(cpEdges, "src", "dst", 3).use(_.count())
    cpEdges.count() shouldBe edges.size // caller's blocks must survive

    val cpEdges2 = edges.toDF("src", "dst").localCheckpoint(true)
    val c = PageRank.pageRankConvergedManaged(cpEdges2, "src", "dst",
      epsilonScaled = 1000000000L, maxIterations = 30)
    c.ranks.use(_.count())
    cpEdges2.count() shouldBe edges.size
  }

  "keywordsManaged" should "release the vocab/edge pins and the inner PageRank state" in {
    val docs = Seq("hub a", "hub b", "hub c", "hub d", "a b")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val managed = checkLifecycle(
        TextRank.keywordsManaged(docs, "id", "text", iterations = 5,
          topN = 3))
      .map(r => (r.getString(0), r.getLong(1)))
    managed.head._1 shouldBe "hub"
    val plain = TextRank.keywords(docs, "id", "text", iterations = 5,
        topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    managed.toSeq shouldBe plain.toSeq
  }
}
