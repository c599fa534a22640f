package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row is enriched with the right row having the
  * greatest `rightTime <= leftTime` within the same key — the operator
  * behind effective-dated dimensions, price/rate lookups, and
  * last-state-before-event enrichment. Spark has no native ASOF JOIN.
  *
  * Composition (SURVEY §7.4 preference (a) — relational composition before
  * custom Catalyst): tag both sides, union them, and carry the right
  * payload forward with `last(_, ignoreNulls)` over one (key, time) window.
  * Scale posture: a single shuffle on the key — the same exchange a
  * sort-merge as-of scan would need — with no join operator at all; state
  * per partition is one row of payload, streamed in sort order. A
  * range-interval band join (Spark's usual fallback for as-of: join on key
  * + BETWEEN then argmax) would shuffle both sides AND explode the band;
  * this shape does neither.
  */
object AsofJoin {

  /** Returns every `left` row plus `payload` columns from the latest
    * preceding-or-equal right row per `keys` (null when no right row
    * precedes).
    *
    * Requirements: `leftTime`/`rightTime` values must be mutually
    * comparable (same type both sides); `payload` names must not collide
    * with left columns; right rows must be unique per (keys, rightTime) —
    * pre-aggregate otherwise (an ambiguous as-of match is a semantic error,
    * exactly as in DuckDB's ASOF JOIN). Right rows with null time are
    * dropped; left rows with null time get null payload.
    *
    * Payload columns are carried as ONE struct, not per-column: a per-column
    * `last(_, ignoreNulls)` would skip a legitimately-null field of the
    * matched right row and surface a stale value from an older row — and
    * different payload columns could then come from different right rows.
    * The struct itself is never null for a right row (even when every field
    * is), so the whole matched row is taken or skipped atomically, matching
    * DuckDB ASOF JOIN row semantics.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    require(payload.forall(p => !left.columns.contains(p)),
      s"payload columns ${payload.filter(left.columns.contains)} collide with left columns")
    // __side orders rights (0) before lefts (1) at equal time -> <= semantics
    val l = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right
      .filter(col(rightTime).isNotNull)
      .select(keys.map(col) :+ col(rightTime).as("__t")
        :+ struct(payload.map(col): _*).as("__asof_row"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p, col("__asof_row").getField(p))
    }
    unpacked.filter(col("__side") === 1).drop("__t", "__side", "__asof_row")
  }
}
