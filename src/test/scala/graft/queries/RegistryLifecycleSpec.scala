package graft.queries

import graft.SparkSpec

/** Registry-level session lifecycle for the graph tier: a Verify/Bench
  * session runs 120 queries back-to-back in ONE SparkSession, so a registry
  * wrapper that leaves pins or localCheckpoint blocks behind accumulates
  * them across every subsequent query — bounded per query, unbounded over a
  * session. Round 12's driver run measured the graph tier +31% on identical
  * code (vs +12% ambient) under exactly this accumulation: the wrappers
  * called the unmanaged operator forms.
  *
  * Each graph registry query must therefore return a SELF-CONTAINED frame
  * (LocalRelation over its k-bounded result / broadcast-localized roots)
  * and leave the persistent-RDD map exactly at its pre-query baseline the
  * moment the registry function RETURNS — not merely after some later
  * release call the harness never makes.
  */
class RegistryLifecycleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private val graphQueries = Seq(
    "q_ext_pagerank", "q_ext_trustrank", "q_ext_hits", "q_ext_textrank",
    "q_ext_components", "q_ext_dedup_groups")

  for (name <- graphQueries)
    name should "leave the persistent-RDD map at baseline once the registry call returns" in {
      val fn = graft.SparkEntry.queries(name)
      val before = persistedIds
      val df = fn(spark, dir)
      // the frame is already self-contained at return: building it must not
      // have left pins behind, and materializing it must not re-pin
      val leakedAtReturn = persistedIds.diff(before)
      val n = df.count()
      val leakedAfterUse = persistedIds.diff(before)
      n should be > 0L
      withClue(s"$name leaked pins at return: ") { leakedAtReturn shouldBe empty }
      withClue(s"$name leaked pins after count(): ") { leakedAfterUse shouldBe empty }
    }

  "a graph registry frame" should "be re-executable after release (no dead checkpoint references)" in {
    val df = graft.SparkEntry.queries("q_ext_pagerank")(spark, dir)
    df.count() shouldBe df.count()
    df.collect() should not be empty
  }
}
