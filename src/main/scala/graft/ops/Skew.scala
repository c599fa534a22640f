package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale (SURVEY §4.2; builder brief:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover the two places AQE can't: (1) a broadcast-side explode for
  * skewed LOOKUP joins where one fact key dominates, and (2) two-phase
  * salted aggregation when a single group overwhelms one reducer.
  */
object Skew {

  /** Salted left lookup join: the fact side gets a deterministic salt in
    * [0, salts) (hash of a tiebreak column — no randomness, replayable); the
    * dim side is exploded `salts`-fold with every salt value. The join key
    * becomes (key, salt), spreading one hot key over `salts` reducers. The
    * dim stays broadcast, so for broadcastable dims this only matters when
    * the dim outgrows the threshold and AQE falls back to shuffle joins.
    */
  def saltedLookupLeft(fact: DataFrame, dim: DataFrame, key: String,
                       saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
      .dropDuplicates()
    saltedFact.join(broadcast(saltedDim), Seq(key, "__salt"), "left")
      .drop("__salt")
  }

  /** Two-phase salted count aggregation: phase 1 aggregates on
    * (key, salt) — spreading a hot key across `salts` partial groups — and
    * phase 2 combines the partials per key. Equivalent to groupBy(key).count
    * but no single reducer sees a whole hot key.
    */
  def saltedCount(df: DataFrame, key: String, saltSource: Column,
                  salts: Int, cntCol: String = "cnt"): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(cntCol))

  /** Top-N heaviest keys with their share — the diagnostic that decides
    * whether salting / AQE skew thresholds are needed for a given key.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    // single scan: the total comes from a one-row aggregate over the
    // (small) per-key count table cross-joined back in (broadcast — one
    // row), not a second pass over the input (the groupBy exchange is
    // shared, so ReuseExchange serves both subtrees). A global window
    // would plan an unpartitioned WindowExec — Spark 4 folds constant
    // partition keys away (EliminateWindowPartitions), so its
    // no-partition WARN cannot be silenced declaratively.
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("__total"), 6))
      .drop("__total")
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
  }
}
