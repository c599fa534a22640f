package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents that
  * share an n-gram with an evaluation/benchmark set — the standard
  * n-gram-overlap decontamination step of an LLM training-data pipeline
  * (a train document containing a verbatim benchmark shingle leaks the
  * eval into training).
  *
  * Scale posture: the benchmark shingle set is DISTINCT'd and joined to
  * the exploded train shingles with an UNCONDITIONAL broadcast hint —
  * deliberately, not as an optimization guess. The operator's contract is
  * that `benchmark` is an evaluation set (MBs-to-low-GBs against a 100 TB
  * corpus); a sort-merge fallback would shuffle the ENTIRE exploded
  * train-shingle side, which at corpus scale is strictly worse than any
  * plausible benchmark broadcast. A benchmark too large to broadcast is a
  * misuse of this operator (split it and union the tags), and failing
  * loudly beats silently shuffling petabytes. Work is one explode of the
  * train side (bounded by token count) plus one aggregation keyed by doc
  * id; nothing is quadratic and nothing collects to the driver.
  */
object Decontaminate {

  /** Tag every document with its benchmark n-gram overlap: returns all
    * `docs` rows plus `n_contaminated` (distinct shared shingles) and
    * `contaminated` (any overlap). Uses word `n`-gram shingles of the
    * normalized text on both sides ([[TextDedup.shingles]] — documents
    * shorter than `n` tokens contribute their whole text, so short docs
    * still match verbatim leaks).
    */
  def tag(docs: DataFrame, idCol: String, textCol: String,
          benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame =
    tagPrepared(docs, idCol, textCol,
      prepareBenchmark(benchmark, benchTextCol, n), n)

  /** The benchmark's distinct shingle set — [[tag]]'s broadcast side,
    * exposed so a REPEATED tagger (per micro-batch in a streaming prep
    * tier, per split in a sharded batch run) computes it once and persists
    * it instead of re-exploding the benchmark on every call.
    */
  def prepareBenchmark(benchmark: DataFrame, benchTextCol: String,
                       n: Int = 8): DataFrame =
    benchmark
      .select(explode(TextDedup.shingles(col(benchTextCol), n)).as("__s"))
      .distinct()

  /** [[tag]] against a prepared (ideally persisted) benchmark shingle set;
    * `n` must match the set's shingle width.
    */
  def tagPrepared(docs: DataFrame, idCol: String, textCol: String,
                  benchShingles: DataFrame, n: Int): DataFrame = {
    val matches = docs
      .select(col(idCol),
        explode(array_distinct(TextDedup.shingles(col(textCol), n))).as("__s"))
      .join(broadcast(benchShingles), "__s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated"))
    docs.join(matches, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** The filter form: `docs` minus contaminated rows. One shuffle
    * lighter than `tag(...).filter(!contaminated)`: the drop decision
    * needs only contaminated-doc IDS, so the exploded-shingle hits
    * `distinct` to ids and anti-join back — no per-doc overlap count, no
    * count-carrying join-back row for every clean document (the vast
    * majority at corpus scale). Survivor rows identical to the tag form
    * (DecontaminateSpec asserts it).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    // No `.distinct()` on the id list (round-20): a LEFT ANTI build side
    // is an existence test — duplicate ids in the hashed relation cannot
    // change which docs survive — and the distinct's hash exchange was a
    // full serialized stage wave. Broadcast growth is bounded by the
    // CONTAMINATED sliver's (id × matching-shingle) multiplicity, small
    // by the same rarity argument that makes the anti form cheaper than
    // tag+filter; AQE demotes the join if a pathological benchmark ever
    // outgrows broadcast.
    val contaminatedIds = docs
      .select(col(idCol),
        explode(array_distinct(TextDedup.shingles(col(textCol), n))).as("__s"))
      .join(broadcast(prepareBenchmark(benchmark, benchTextCol, n)), "__s")
      .select(idCol)
    docs.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /** [[tag]] for benchmark sets TOO BIG to broadcast — the contract [[tag]]
    * refuses. Same result, different shuffle story ([[Bloom]]): a Bloom
    * sketch of the benchmark shingles (bytes bounded by construction, ~10
    * bits per shingle at 1% fpp) prefilters the exploded train shingles
    * scan-side — no shuffle of the corpus — and only the surviving sliver
    * (true matches + ~fpp of the corpus shingles) pays the exact confirm
    * join, hinted shuffle-hash because the benchmark side is by assumption
    * beyond broadcast. False positives die in the confirm join, so the
    * output is row-identical to [[tag]]'s.
    *
    * Cost anatomy at 100 TB: one aggregation over the benchmark (bounded —
    * the benchmark is the small side even when unbroadcastable), one full
    * scan of the corpus with a codegen'd predicate, one sliver-sized
    * shuffle. [[tag]]'s broadcast is still preferable when the benchmark
    * fits; this lifts the ceiling without changing semantics.
    */
  def tagBloom(docs: DataFrame, idCol: String, textCol: String,
               benchmark: DataFrame, benchTextCol: String, n: Int = 8,
               fpp: Double = 0.01): DataFrame = {
    // No distinct, no persist: a Bloom build is idempotent per key
    // (duplicates re-set the same bits), the sizing pass is a shuffle-free
    // sum of shingle counts (an overestimate of the distinct count only
    // LOWERS the realized fpp), and the confirm join is left_semi — exists
    // semantics, immune to right-side duplicates. Each of the three passes
    // is one scan of the benchmark, the small side by contract.
    val benchShingles = benchmark
      .select(explode(TextDedup.shingles(col(benchTextCol), n)).as("__s"))
    val nShingles = benchmark
      .select(size(TextDedup.shingles(col(benchTextCol), n)).as("__n"))
      .agg(coalesce(sum("__n"), lit(0L))).head().getLong(0)
    val trainShingles = docs
      .select(col(idCol),
        explode(array_distinct(TextDedup.shingles(col(textCol), n))).as("__s"))
    val matches =
      Bloom.semiJoin(trainShingles, "__s", benchShingles, "__s",
          expectedItems = nShingles, fpp = fpp)
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_contaminated"))
    docs.join(matches, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }
}
