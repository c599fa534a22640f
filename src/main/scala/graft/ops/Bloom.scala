package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — the membership-filter shape for key
  * sets that outgrow a comfortable broadcast hash join but whose Bloom
  * sketch does not (10 bits/key at 1% fpp: 100 M keys ≈ 120 MB, 1 B keys
  * ≈ 1.2 GB — against raw key sets tens of times larger plus hash-table
  * overhead). The reference has no counterpart; this is the standard
  * scale path for blocklists/decontamination sets at corpus scale.
  *
  * Three-step contract, always EXACT in the result:
  *
  *  1. [[build]]: one aggregation over the key side → serialized filter
  *     bytes on the driver (size = numBits/8, bounded by construction —
  *     this is the operator's only driver-side object, and its size is
  *     chosen up front, not data-dependent).
  *  2. [[mightContain]]: scan-side prefilter of the probe side — a native
  *     codegen'd predicate (Spark's own `BloomFilterMightContain`, the
  *     expression its runtime row-filter injection uses), NO shuffle of
  *     the probe side: false-positive rate fpp means ~(matches + fpp ×
  *     corpus) rows survive.
  *  3. exact confirm join of the surviving sliver against the true key
  *     set ([[semiJoin]]/[[antiJoin]]) — removes the false positives, so
  *     the composed result equals the plain semi/anti join while the
  *     shuffle moves only the sliver instead of the full probe side.
  *
  * Hashing: keys are pre-hashed with `xxhash64` on BOTH build and probe
  * (the same pairing Spark's `InjectRuntimeFilter` uses — the aggregate's
  * long-input path). An xxhash64 collision can only add a false positive,
  * which the confirm join removes; correctness never depends on the hash.
  */
object Bloom {

  /** Serialized Bloom filter over `keys`'s `key` expression, or None when
    * the key side is empty (an empty filter would reject everything —
    * callers short-circuit instead). `expectedItems` sizes the filter;
    * pass the known/estimated distinct count (a preflight `count()` is
    * bounded by the key side, which is the small side by contract).
    */
  def build(keys: DataFrame, key: Column, expectedItems: Long,
            fpp: Double = 0.01): Option[Array[Byte]] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val n = math.max(expectedItems, 1L)
    val numBits = BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(key)),
      Literal(n), Literal(numBits)).toAggregateExpression()
    val row = keys.select(bridge.column(agg).as("__bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Native might-contain predicate over the serialized filter: true for
    * every key that was added (plus ~fpp false positives), never a false
    * negative. The filter bytes ride the plan as a literal — exactly the
    * shape Spark's runtime filter injection produces after its subquery
    * executes — so the predicate stays inside whole-stage codegen.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), bridge.expression(xxhash64(key))))

  /** Exact semi join (`left` rows whose `leftKey` exists in `rightKeys`),
    * bloom-prefiltered: the confirm join's probe side is the sliver that
    * passed [[mightContain]], not all of `left`. The confirm is hinted
    * shuffle-hash on the key side — the operator exists precisely for key
    * sets too big to broadcast, and a sort-merge would re-sort both sides.
    */
  def semiJoin(left: DataFrame, leftKey: String, rightKeys: DataFrame,
               rightKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame =
    build(rightKeys, col(rightKey), expectedItems, fpp) match {
      case None => left.limit(0)
      case Some(bf) =>
        left.filter(mightContain(bf, col(leftKey)))
          .join(rightKeys.select(col(rightKey).as(leftKey)).hint("shuffle_hash"),
            Seq(leftKey), "left_semi")
    }

  /** Exact anti join (`left` rows whose `leftKey` does NOT exist in
    * `rightKeys`). The bloom's no-false-negative guarantee makes the
    * split exact: rows failing [[mightContain]] are definitely absent
    * (kept outright, no join at all); only the might-contain sliver needs
    * the confirming anti join. At corpus scale this unions a shuffle-free
    * scan (the overwhelming majority) with a sliver-sized anti join.
    */
  def antiJoin(left: DataFrame, leftKey: String, rightKeys: DataFrame,
               rightKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame =
    build(rightKeys, col(rightKey), expectedItems, fpp) match {
      case None => left
      case Some(bf) =>
        // null keys: mightContain(null) is null; a plain anti join KEEPS
        // null-key rows (null matches nothing), so they belong to the
        // definite-miss leg — coalesce makes the split exhaustive
        val hit = coalesce(mightContain(bf, col(leftKey)), lit(false))
        val definiteMiss = left.filter(!hit)
        val sliver = left.filter(hit)
          .join(rightKeys.select(col(rightKey).as(leftKey)).hint("shuffle_hash"),
            Seq(leftKey), "left_anti")
        // unionByName: the using-key join re-orders leftKey to the front
        definiteMiss.unionByName(sliver)
    }
}
