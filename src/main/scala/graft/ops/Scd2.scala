package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge (Kimball's SCD2): maintain a
  * full change history of a keyed corpus across snapshot drops. Each key
  * holds a chain of versions — (payload, valid_from, valid_to,
  * is_current) — and merging a new snapshot closes changed/removed
  * versions and opens new ones. This is the durable form of
  * [[SnapshotDiff]]: diff classifies one drop; SCD2 accumulates the
  * classification into an auditable history (which document text was
  * live when training run X sampled it?).
  *
  * Join-free merge: current rows and snapshot rows union with a side tag
  * and group once on the key — the same algebraic shape as
  * [[SnapshotDiff.diff]] (a full-outer join cannot broadcast and
  * degrades to sort-merge on stats-less frames). Each group then emits
  * 0-2 rows (closed old version / opened new version) via a built
  * array + explode — no second pass, no window. Closed history rows
  * never enter the shuffle: they are union'd back untouched (at 100 TB
  * the closed tail dwarfs the current tier; shuffling it every merge
  * would dominate the job).
  *
  * Change detection is by caller-supplied content hash, as in
  * [[SnapshotDiff]]; keys must be unique in the snapshot and in the
  * current tier (enforce upstream with the dedup family).
  */
object Scd2 {

  /** History schema columns added around the payload. */
  val MetaCols: Seq[String] = Seq("content_hash", "valid_from", "valid_to", "is_current")

  /** Bootstrap a history from the first snapshot: every row current from
    * `loadDate` (an ISO date string).
    */
  def init(snapshot: DataFrame, keyCol: String, payloadCols: Seq[String],
           hashOf: DataFrame => Column, loadDate: String): DataFrame =
    snapshot.select(
      (col(keyCol) +: payloadCols.map(col)) ++ Seq(
        hashOf(snapshot).as("content_hash"),
        lit(loadDate).as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current")): _*)

  /** Merge `snapshot` (taken at `asOfDate`) into `history`. Semantics per
    * key, comparing the current version's hash H to the snapshot's S:
    *
    *  - S absent (key deleted): current row closes (valid_to = asOfDate).
    *  - H == S: current row unchanged.
    *  - H != S: current row closes AND a new current version opens.
    *  - H absent (new key): a new current version opens.
    *
    * Rows already closed in `history` pass through untouched. Payload and
    * hash travel inside per-side `min(struct)` aggregates — exactly one
    * non-null struct exists per side per key, so `min` is selection, not
    * choice.
    */
  def merge(history: DataFrame, snapshot: DataFrame, keyCol: String,
            payloadCols: Seq[String], hashOf: DataFrame => Column,
            asOfDate: String): DataFrame = {
    val cur = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))

    val pay = (df: DataFrame, hash: Column) => struct(
      payloadCols.map(df(_)) :+ hash.as("content_hash"): _*)
    val a = cur.select(col(keyCol),
      pay(cur, cur("content_hash")).as("side_a"),
      lit(null).cast(snapSideType(snapshot, payloadCols, hashOf)).as("side_b"),
      col("valid_from").as("valid_from_a"))
    val b = snapshot.select(col(keyCol),
      lit(null).cast(snapSideType(snapshot, payloadCols, hashOf)).as("side_a"),
      pay(snapshot, hashOf(snapshot)).as("side_b"),
      lit(null).cast("string").as("valid_from_a"))

    val merged = a.unionByName(b)
      .groupBy(col(keyCol))
      .agg(min(col("side_a")).as("side_a"), min(col("side_b")).as("side_b"),
        min(col("valid_from_a")).as("valid_from_a"))

    val hashA = col("side_a.content_hash")
    val hashB = col("side_b.content_hash")
    val changed = hashA.isNotNull && hashB.isNotNull && hashA =!= hashB
    // old version: survives unchanged, or closes at asOfDate
    val oldRow = when(hashA.isNotNull, struct(
      col("side_a").as("pay"),
      col("valid_from_a").as("valid_from"),
      when(changed || hashB.isNull, lit(asOfDate)).cast("string").as("valid_to"),
      (hashB.isNotNull && !changed).as("is_current")))
    // new version: opens when the key is new or the content changed
    val newRow = when(hashB.isNotNull && (hashA.isNull || changed), struct(
      col("side_b").as("pay"),
      lit(asOfDate).as("valid_from"),
      lit(null).cast("string").as("valid_to"),
      lit(true).as("is_current")))

    val emitted = merged
      .select(col(keyCol), explode(filter(array(oldRow, newRow),
        r => r.isNotNull)).as("r"))
      .select(
        (col(keyCol) +: payloadCols.map(c => col(s"r.pay.$c"))) ++ Seq(
          col("r.pay.content_hash").as("content_hash"),
          col("r.valid_from").as("valid_from"),
          col("r.valid_to").as("valid_to"),
          col("r.is_current").as("is_current")): _*)
    closed.unionByName(emitted)
  }

  /** Time-travel read: the version of each key live at `asOfDate` — which
    * document text did training run X actually sample? A row is live when
    * `valid_from <= asOfDate < valid_to` (open versions have null
    * valid_to). Plain attribute predicates: they push to the parquet scan
    * of a stored history, and with the history partitioned by
    * `is_current` a current-date read prunes to the current tier alone.
    */
  def asOf(history: DataFrame, asOfDate: String): DataFrame =
    history.filter(col("valid_from") <= asOfDate &&
      (col("valid_to").isNull || col("valid_to") > asOfDate))

  /** Shared struct type for both union sides (payload + content_hash). */
  private def snapSideType(snapshot: DataFrame, payloadCols: Seq[String],
                           hashOf: DataFrame => Column)
  : org.apache.spark.sql.types.DataType =
    snapshot.select(struct(
      payloadCols.map(snapshot(_)) :+ hashOf(snapshot).as("content_hash"): _*)
      .as("s")).schema("s").dataType
}
