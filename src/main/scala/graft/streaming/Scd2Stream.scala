package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 current-tier maintenance: turn an unbounded stream of
  * keyed snapshot records into the stream of VERSION TRANSITIONS — the
  * low-latency complement of the batch [[graft.ops.Scd2.merge]] (which
  * reconciles whole snapshot drops and is the only side that can see
  * deletions: absence is not an event, so a stream can never close a key
  * by omission).
  *
  * Per key the state is one (content_hash, valid_from) pair — O(keys)
  * state, no watermark needed (the newest version is live forever until
  * superseded). On arrival: unseen key → emit an `opened` row; same hash
  * → emit nothing (the dedup property: re-crawls of unchanged pages cost
  * zero output); changed hash → emit the `closed` old row and the
  * `opened` new one. Emitted closed rows are exactly the batch merge's
  * closed rows; appending them to a stored history keeps
  * [[graft.ops.Scd2.asOf]] correct at any point covered by the stream.
  *
  * Within one micro-batch a key's records apply in (asOf, payloadHash)
  * order — deterministic under replay, batch-boundary-independent
  * (spec'd): the transitions for records r1..rn are the same whether they
  * arrive in one batch or n.
  */
object Scd2Stream {

  /** One keyed snapshot observation: `asOf` is the observation date
    * (ISO string, any totally ordered format works).
    */
  final case class Observation(key: Long, contentHash: String,
                               payload: String, asOf: String)

  /** A version-chain transition row (the streaming form of a history
    * row): `validTo` null = the version opened and is current.
    */
  final case class Transition(key: Long, payload: String,
                              contentHash: String, validFrom: String,
                              validTo: Option[String], isCurrent: Boolean)

  /** Per-key live-version state (public: Catalyst codegen instantiates
    * it reflectively — a private case class fails janino compilation).
    */
  final case class Cur(contentHash: String, payload: String,
                       validFrom: String)

  implicit private val curEnc: Encoder[Cur] = Encoders.product[Cur]

  /** Fold the observation stream into transitions. Records whose asOf
    * predates the live version's validFrom are stale replays and are
    * ignored (at-least-once sources re-deliver).
    */
  def transitions(obs: Dataset[Observation]): Dataset[Transition] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Cur, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Cur]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var cur = state.getOption
          // deterministic intra-batch order: by date, hash tie-break
          rows.toSeq.sortBy(o => (o.asOf, o.contentHash)).foreach { o =>
            cur match {
              case None =>
                cur = Some(Cur(o.contentHash, o.payload, o.asOf))
                out += Transition(key, o.payload, o.contentHash, o.asOf,
                  None, isCurrent = true)
              case Some(c) if o.asOf < c.validFrom => // stale replay
              case Some(c) if c.contentHash == o.contentHash => // unchanged
              case Some(c) =>
                out += Transition(key, c.payload, c.contentHash, c.validFrom,
                  Some(o.asOf), isCurrent = false)
                cur = Some(Cur(o.contentHash, o.payload, o.asOf))
                out += Transition(key, o.payload, o.contentHash, o.asOf,
                  None, isCurrent = true)
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
