package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget admission — the unbounded form of
  * [[graft.ops.Curation.tokenBudgetPerGroup]]: as documents arrive, each
  * group (source/domain) admits them until its token budget is consumed,
  * then rejects forever. The mixture-recipe step when the corpus is an
  * ingest stream rather than a snapshot.
  *
  * Semantics match the batch operator's boundary rule: a document is
  * admitted iff the group's consumed count BEFORE it is under budget, so
  * the crossing document is included and every group overshoots by at most
  * one document. Within a micro-batch, arrival order is made deterministic
  * by sorting on `doc_id`; across batches the order is arrival order (an
  * unbounded stream has no global priority order — if priority matters
  * more than latency, batch-select with `tokenBudgetPerGroup` instead).
  *
  * Scale posture: state is ONE Long per group (consumed tokens), keyed and
  * partitioned by group across executors — no timeout, no growth with
  * document count; admitted docs flow through append-mode.
  */
object BudgetStream {

  final case class Doc(doc_id: Long, source: String, n_tokens: Long)

  /** Admit arriving docs per source within `budgetByGroup` (fallback
    * `defaultBudget`). Returns the admitted docs (append stream).
    */
  def admitWithinBudget(docs: Dataset[Doc], budgetByGroup: Map[String, Long],
                        defaultBudget: Long): Dataset[Doc] = {
    require((budgetByGroup.values.toSeq :+ defaultBudget).forall(_ >= 0),
      "budgets must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[Long]) =>
          val budget = budgetByGroup.getOrElse(source, defaultBudget)
          var consumed = state.getOption.getOrElse(0L)
          val admitted = Seq.newBuilder[Doc]
          // deterministic within-batch order; cross-batch order is arrival
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (consumed < budget) {
              admitted += d
              consumed += d.n_tokens
            }
          }
          state.update(consumed)
          admitted.result().iterator
      }
  }
}
