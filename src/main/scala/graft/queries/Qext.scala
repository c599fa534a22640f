package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.ops._




/** Extension queries (SURVEY §7.8): training-data pipeline operators over the
  * `documents`, `embeddings`, and `events` tables — dedup family, similarity
  * search, text analysis, JSON extraction, event-time aggregation.
  *
  * Oracle policy: exact SQL oracles wherever the computation is
  * engine-portable (hashes, counts, rounded double math); hash-seeded
  * operators (xxhash64 minhash/simhash, seeded hyperplanes) have no DuckDB
  * equivalent and are declared without oracle (driver rows-only check) but
  * covered by ScalaTest specs instead.
  */

object Qext extends QextBase
    with QextDedupTier with QextSimTier with QextTextTier
    with QextRankTier with QextEventsTier with QextMiscTier {

  val all: Map[String, (SparkSession, String) => DataFrame] =
    dedupTierQueries ++ simTierQueries ++ textTierQueries ++
      rankTierQueries ++ eventsTierQueries ++ miscTierQueries

  val oracle: Map[String, String] =
    dedupTierOracles ++ simTierOracles ++ textTierOracles ++
      rankTierOracles ++ eventsTierOracles ++ miscTierOracles
}
