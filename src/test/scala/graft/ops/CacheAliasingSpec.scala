package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adjudicates the bench-tail `CacheManager: Asked to cache already cached
  * data` class (round-14 verdict defect #2). The unmanaged warm-path
  * operators deliberately leave their signature/assignment pin cached so a
  * repeated invocation over the same input ALIASES into the warm entry —
  * round 15 made that explicit via [[Managed.ensurePersisted]] (persist
  * only when `storageLevel == NONE`), which removes the WARN entirely.
  * This spec locks the three properties that make the aliasing benign:
  *
  *   1. a re-invocation returns the SAME rows (aliasing serves the same
  *      snapshot — sound for the engine's immutable-parquet contract; the
  *      round-9 stale-snapshot hazard needs a MUTATED source, which these
  *      paths never have);
  *   2. the persistent-RDD map does not GROW across re-invocations
  *      (aliasing, not accumulation — bounded by distinct inputs, not by
  *      invocation count, so a long-lived session can't leak per call);
  *   3. the Managed form's `use` still leaves the map at its pre-call
  *      baseline (full lifecycle control when the caller wants it).
  */
class CacheAliasingSpec extends SparkSpec {
  import spark.implicits._

  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def weighted = Seq.tabulate(60)(i => (i.toLong, (i % 7 + 1).toLong))
    .toDF("id", "w")

  "an unmanaged re-invocation" should
      "serve identical rows without growing the persistent-RDD map" in {
    spark.sharedState.cacheManager // force init
    val first = Sampling.systematicWeighted(weighted, "id", "w", k = 20)
      .collect().map(_.toSeq).toSeq
    val afterFirst = persisted
    val second = Sampling.systematicWeighted(weighted, "id", "w", k = 20)
      .collect().map(_.toSeq).toSeq
    val afterSecond = persisted
    second shouldBe first
    withClue("re-invocation must alias into the warm cache, not add pins: ") {
      afterSecond shouldBe afterFirst
    }
    spark.catalog.clearCache()
  }

  "ensurePersisted" should "be a no-op on an already-cached plan" in {
    val df = weighted.select(col("id"), col("w") * 2 as "w2")
    val pinned = Managed.ensurePersisted(df,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.count()
    val before = persisted
    // identical plan: ensurePersisted must see the existing entry and
    // leave the block manager untouched
    val again = Managed.ensurePersisted(
      weighted.select(col("id"), col("w") * 2 as "w2"),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    again.count()
    persisted shouldBe before
    pinned.unpersist(true)
  }

  "the managed form" should "leave the map at baseline after use()" in {
    val before = persisted
    val m = Sampling.systematicWeightedManaged(weighted, "id", "w", k = 20)
    val n = m.use(_.count())
    n should be > 0L
    withClue("use() must release every pin the operator took: ") {
      persisted shouldBe before
    }
  }
}
