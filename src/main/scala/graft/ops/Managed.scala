package graft.ops

import org.apache.spark.sql.DataFrame

/** A lazily-built result frame together with the intermediate frames the
  * operator persisted to build it.
  *
  * The near-dup operators ([[TextDedup]], [[Similarity.cosineNearDups]])
  * persist their signature tables — load-bearing for plan shape — but hand
  * back a lazy frame, so they cannot unpersist for the caller. The managed
  * variants return this handle instead: `use` scopes the caches to one
  * materialization, `release` frees them explicitly. Long-lived sessions
  * issuing many near-dup jobs should prefer these over the blunt
  * `spark.catalog.clearCache()`.
  */
final class Managed(val df: DataFrame, caches: Seq[DataFrame]) {

  /** Unpersist the operator's intermediate caches (non-blocking). Safe to
    * call more than once. The result frame stays valid but recomputes — and
    * re-inlines the signature expressions — if executed again afterwards.
    */
  def release(): Unit = caches.foreach(_.unpersist(false))

  /** Run `f` — which must MATERIALIZE the frame (write/collect/count) — then
    * release the caches.
    */
  def use[T](f: DataFrame => T): T =
    try f(df) finally release()
}
