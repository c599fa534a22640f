package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-block guard for the LSH-family candidate generators
  * ([[TextDedup.minhashPairsFromPrepared]], [[TextDedup.simhashNearDups]],
  * [[Similarity.cosineNearDups]]).
  *
  * The blocked self-joins are collision-rate-bounded on well-behaved
  * corpora, but a degenerate corpus — millions of boilerplate-identical
  * documents landing in one (band, bucket) — makes within-block candidates
  * quadratic before the verify filter ever runs. The standard mitigation
  * (and the one implemented here): for blocks over a size cap, collapse
  * identical-content members first. Degenerate blocks are dominated by
  * exact duplicates, so
  *
  *   - members sharing a content key (full MinHash signature / SimHash
  *     fingerprint / raw vector) are connected by STAR edges to the
  *     group's minimum id — O(block size) rows, and since downstream
  *     verification recomputes the true similarity on every candidate,
  *     stars introduce no false positives;
  *   - the distinct-content REPRESENTATIVES (one per content group) then
  *     run the normal all-pairs comparison — quadratic only in the number
  *     of distinct contents R, not the block size.
  *
  * Candidate count per oversized block is O(size + R²). The emitted pair
  * SET differs from the uncapped join (member↔member pairs across two
  * different content groups are represented by their rep↔rep pair
  * instead), but the CONNECTED COMPONENTS are preserved whenever
  * same-content-key members are true duplicates (exact for the raw-vector
  * key; a 2^-64-per-pair hash-collision argument for the signature keys) —
  * which is precisely what dedup-group resolution ([[DedupGroups]])
  * consumes. Callers needing the exact pair multiset leave the cap off.
  *
  * A block whose DISTINCT contents exceed the cap stays quadratic in R —
  * that shape is not a boilerplate pile-up but a banding/threshold
  * misconfiguration (the block key no longer discriminates), and silently
  * dropping its pairs would corrupt recall, so it is deliberately left
  * alone.
  */
private[ops] object Blocking {

  /** Candidate pairs (id_a < id_b, distinct) from a block-membership table
    * (one row per member and block), capping per-block fan-out at
    * `maxBlock` via the star-plus-representatives scheme above.
    *
    * @param blocks      one row per (member, block): `blockCols` ++ idCol
    *                    ++ groupKeyCol
    * @param blockCols   the block key (e.g. band+bucket)
    * @param idCol       member id (orderable; pairs come out id_a < id_b)
    * @param groupKeyCol content key equating "identical" members
    * @param maxBlock    size cap; <= 0 disables capping (pure self-join)
    */
  def cappedCandidates(blocks: DataFrame, blockCols: Seq[String],
                       idCol: String, groupKeyCol: String,
                       maxBlock: Int): DataFrame = {
    val bc: Seq[Column] = blockCols.map(col)
    def selfJoin(members: DataFrame): DataFrame = {
      val a = members.select(bc :+ col(idCol).as("id_a"): _*)
      val b = members.select(bc :+ col(idCol).as("id_b"): _*)
      a.join(b, blockCols).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    if (maxBlock <= 0) selfJoin(blocks).distinct()
    else {
      // one extra count aggregation on the block key — same exchange the
      // self-join needs anyway, so AQE's exchange reuse shares the shuffle
      val sized = blocks.join(
        blocks.groupBy(bc: _*).agg(count(lit(1)).as("__bsz")), blockCols)
      val small = selfJoin(sized.filter(col("__bsz") <= maxBlock))
      val big = sized.filter(col("__bsz") > maxBlock)
      val reps = big.groupBy(bc :+ col(groupKeyCol): _*)
        .agg(min(col(idCol)).as("__rep"))
      // rep = group minimum, so star edges are already oriented id_a < id_b
      val stars = big.join(reps, blockCols :+ groupKeyCol)
        .filter(col(idCol) =!= col("__rep"))
        .select(col("__rep").as("id_a"), col(idCol).as("id_b"))
      val repPairs = selfJoin(reps.withColumnRenamed("__rep", idCol))
      small.union(stars).union(repPairs).distinct()
    }
  }
}
