package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every key across two snapshots as
  * added / removed / changed / unchanged by content hash — the intake
  * check between crawl drops (what actually changed?), the audit for
  * incremental ingest (does old + delta == new?), and the drift alarm
  * that pairs with [[Profiler.drift]]'s schema-level view.
  *
  * Join-free: the two (key, hash) projections union with a side tag and
  * group once on the key (`min` per side selects the single hash each
  * side holds) — the same algebraic union+groupBy shape the engine uses
  * wherever a full-outer join would appear (full outer cannot broadcast;
  * on stats-less frames it degrades to sort-merge). One shuffle on the
  * key, volume = |A| + |B| narrow rows.
  */
object SnapshotDiff {

  /** (key, hash_a, hash_b, status) for every key in either snapshot.
    * `hashOf` derives the comparison hash from a snapshot row (e.g.
    * `TextDedup.contentHash(col("text"))` for normalized-content
    * equality); keys must be unique per snapshot (enforce upstream with
    * the dedup family — duplicate keys would make "the" hash ambiguous,
    * and this operator refuses to guess: `min` makes the result
    * deterministic but a spec'd precondition, not a semantics).
    */
  def diff(a: DataFrame, b: DataFrame, keyCol: String,
           hashOf: DataFrame => Column): DataFrame = {
    val ua = a.select(col(keyCol), hashOf(a).as("hash_a"),
      lit(null).cast("string").as("hash_b"))
    val ub = b.select(col(keyCol), lit(null).cast("string").as("hash_a"),
      hashOf(b).as("hash_b"))
    ua.unionByName(ub)
      .groupBy(col(keyCol))
      .agg(min(col("hash_a")).as("hash_a"), min(col("hash_b")).as("hash_b"))
      .withColumn("status",
        when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .when(col("hash_a") === col("hash_b"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Count per status — the one-line drop report. */
  def summary(diffed: DataFrame): DataFrame =
    diffed.groupBy("status").agg(count(lit(1)).as("n"))
}
