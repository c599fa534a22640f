package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank
  * over the word co-occurrence graph — the unsupervised keyword/keyphrase
  * baseline, here as a pure composition of engine operators:
  * [[TextStats.vocabIds]] (deterministic token ids) × [[NgramLm.docBigrams]]
  * (adjacency) × [[PageRank.pageRank]] (integer-exact iteration).
  *
  * Graph: distinct adjacent-token pairs, symmetrized (TextRank's graph is
  * undirected; a directed power iteration over both edge directions is
  * the standard equivalent). Rank mass concentrates on tokens that
  * co-occur with MANY DISTINCT other tokens — connectivity, not raw
  * frequency (a token repeated in one boilerplate pair stays low).
  *
  * Every stage is the engine's scale shape: vocab ids by distributed
  * rank, edges by distinct on the bigram stream, ranks by the O(|V|+|E|)
  * iteration. Integer ranks make the whole composition oracle-checkable
  * end-to-end.
  */
object TextRank {

  /** Top-`topN` corpus keywords: (token, rank_scaled), rank desc, token
    * tie-break. Pins the vocab/edge frames for the session (job-per-query
    * shape); long-lived sessions should use [[keywordsManaged]].
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               iterations: Int = 5, topN: Int = 50): DataFrame =
    keywordsManaged(docs, idCol, textCol, iterations, topN).df

  /** [[keywords]] with an explicit cache-release handle covering the
    * vocab-id and edge pins plus everything the inner [[PageRank]] run
    * pinned or checkpointed.
    */
  def keywordsManaged(docs: DataFrame, idCol: String, textCol: String,
                      iterations: Int = 5, topN: Int = 50): Managed = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ids is read three times (two edge lookups + the final join-back)
    // and edges feeds PageRank's nodes/outdeg/eod builds — pin both or
    // the corpus-side pipelines re-derive per consumer (the 28 s sf0.1
    // first measurement was dominated by exactly these re-derivations)
    val ids = TextStats.vocabIds(
      TextStats.vocabulary(docs, idCol, textCol)).persist(lvl)
    // token ids are vocab-sized: broadcast both lookups onto the RAW
    // bigram stream (map-side — no early string-level distinct), then
    // dedup ONCE on the canonical unordered id pair and explode the two
    // directions after. The round-11 shape shuffled the raw stream twice
    // (distinct on the wide string pairs, then distinct on the 2×
    // symmetrized ids); this is one shuffle of narrow (long, long) rows
    // for the identical edge set — self-loops kept single by the a≠b
    // filter on the reversed branch.
    val und = NgramLm.docBigrams(docs, idCol, textCol)
      .join(broadcast(ids.withColumnRenamed("token", "w1")
        .withColumnRenamed("token_id", "src")), Seq("w1"))
      .join(broadcast(ids.withColumnRenamed("token", "w2")
        .withColumnRenamed("token_id", "dst")), Seq("w2"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.filter(col("a") =!= col("b"))
        .select(col("b").as("src"), col("a").as("dst")))
      .persist(lvl)
    val pr = PageRank.pageRankManaged(edges, "src", "dst", iterations)
    val out = pr.df
      .join(broadcast(ids), col("node") === col("token_id"))
      .select(col("token"), col("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("token").asc)
      .limit(topN)
    new Managed(out, Seq(ids, edges) ++ pr.caches, pr.rdds)
  }
}
