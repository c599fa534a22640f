package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need samples and train/validation/test splits that
  * are (1) reproducible run-over-run, (2) stable under repartitioning and
  * cluster-size changes, and (3) consistent across engines auditing the
  * same data. Spark's `sample()`/`randomSplit()` give none of these — they
  * are seeded per-partition, so adding an executor reshuffles the split.
  * Hashing a stable row key instead makes membership a pure function of
  * the data: the md5 family here ([[TextDedup.md5Hash60]]-style) is
  * bit-reproducible in any engine with md5, so splits are oracle-checkable
  * and survive re-ingestion.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the row key — the md5 prefix as an
    * integer, mod buckets. `salt` decorrelates different samples over the
    * same keys.
    */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Keep ~`pct` percent of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
                 salt: String = ""): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashBucket(col(keyCol), 100, salt) < pct)
  }

  /** Stratified deterministic sampling: keep a per-stratum percentage of
    * rows (strata absent from `pctByStratum` fall back to `defaultPct`).
    * Same md5-bucket membership as [[hashSample]] — reproducible across
    * runs, repartitions, and engines — but with per-group quotas (e.g.
    * downsample dominant languages, keep all of a rare one).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           pctByStratum: Map[String, Int], defaultPct: Int,
                           salt: String = ""): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be in [0,100], got $p"))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) =>
        when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100, salt) < pct)
  }

  /** Deterministic shuffle key: md5 of (salt, key) — a stable pseudo-random
    * total order. Training pipelines need the corpus globally shuffled
    * (decorrelate document order from crawl/source order) but REPRODUCIBLY:
    * `orderBy(shuffleKey(...))` is a pure function of the data, unlike
    * `rand()`, so the epoch-0 data order is identical run-over-run and
    * auditable cross-engine.
    */
  def shuffleKey(key: Column, salt: String = ""): Column =
    md5(concat(lit(salt), key.cast("string")))

  /** Globally shuffle a corpus deterministically: range-partition by the
    * md5 shuffle key and sort within partitions. At 100 TB this is one
    * range exchange (same geometry as any global sort) and the output is
    * ready for a sharded sequential write — partition i holds the i-th
    * contiguous slice of the shuffled order. Ties (duplicate keys) are
    * broken by the key column itself, making the order total.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           salt: String = ""): DataFrame =
    df.withColumn("__shuffle_key", shuffleKey(col(keyCol), salt))
      .repartitionByRange(col("__shuffle_key"), col(keyCol))
      .sortWithinPartitions(col("__shuffle_key"), col(keyCol))

  /** Label each row train/val/test by key hash: test gets `testPct`
    * buckets, validation the next `valPct`, train the rest.
    */
  def trainValTestSplit(df: DataFrame, keyCol: String, testPct: Int,
                        valPct: Int, salt: String = ""): DataFrame = {
    require(testPct >= 0 && valPct >= 0 && testPct + valPct <= 100,
      s"invalid split: test=$testPct val=$valPct")
    val b = hashBucket(col(keyCol), 100, salt)
    df.withColumn("split",
      when(b < testPct, lit("test"))
        .when(b < testPct + valPct, lit("val"))
        .otherwise(lit("train")))
  }
}
