package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops._

/** End-to-end training-corpus preparation — the composition proof that the
  * curation operators fit together the way a real pipeline uses them:
  *
  *   1. exact dedup (normalize → content hash → keep-first by doc_id);
  *   2. quality filter (labeled drop reasons kept for the audit output);
  *   3. benchmark decontamination — broadcast form by default, the Bloom
  *      semi-join path when `bloomBenchmark` says the benchmark outgrows
  *      broadcast;
  *   4. per-source token-budget mixture selection (longest-first);
  *   5. overlapping window chunking of the surviving docs.
  *
  * Returns the chunk frame plus a one-row-per-stage audit summary (docs
  * in/out per stage) — the load-summary discipline the reference applies
  * to its payroll loads (V1), carried to the corpus pipeline.
  *
  * Scale posture is inherited from the parts: one content-hash shuffle
  * (algebraic-min dedup via keepFirst's window — the tie-break order is
  * caller-supplied), codegen'd quality predicates, broadcast-or-bloom
  * decontamination (never an unconditional corpus shuffle), one
  * partitioned window for the budget, shuffle-free chunking.
  */
object CorpusPrep {

  final case class Config(
      shingleN: Int = 3,
      bloomBenchmark: Boolean = false,
      budgetByGroup: Map[String, Long] = Map.empty,
      defaultBudget: Long = Long.MaxValue,
      chunkWidth: Int = 32,
      chunkStride: Int = 24)

  final case class Prepared(chunks: DataFrame, summary: DataFrame)

  /** Every stage frontier as a lazy frame — [[prepare]] adds the counted
    * audit summary; callers needing only the composition (the registry
    * query, the bench) use this and pay for one frontier, not six counts.
    */
  final case class Staged(deduped: DataFrame, kept: DataFrame,
                          clean: DataFrame, budgeted: DataFrame,
                          chunks: DataFrame)

  def stages(docs: DataFrame, benchmark: DataFrame,
             cfg: Config = Config()): Staged = {
    val deduped = TextDedup.exactDedupAsc(docs, "text",
        tieBreakAsc = Seq("doc_id"))
      .drop("__content_hash")
    downstream(deduped, benchmark, cfg)
  }

  /** [[stages]] with a SEMANTIC dedup stage ([[SemDedup]]) between exact
    * dedup and quality: docs with an embedding are cluster-pruned at
    * cosine >= `tau` under `model`; docs WITHOUT an embedding pass
    * through untouched — absence of a vector is not evidence of
    * duplication (the multimodal-boundary rule). The returned `deduped`
    * frontier is the post-semantic one.
    */
  def stagesWithSemantic(docs: DataFrame, benchmark: DataFrame,
                         embeddings: DataFrame, embIdCol: String,
                         embVecCol: String, model: Ivf.Model, tau: Double,
                         cfg: Config = Config()): Staged = {
    val deduped = TextDedup.exactDedupAsc(docs, "text",
        tieBreakAsc = Seq("doc_id"))
      .drop("__content_hash")
    downstream(semanticStage(deduped, embeddings, embIdCol, embVecCol,
      model, tau), benchmark, cfg)
  }

  /** Drop semantic near-dups from a doc frame: embeddings joined on id
    * (co-partitioned doc_id shuffles), [[SemDedup.dedup]] survivors join
    * back, vectorless docs kept. Exposed as a standalone combinator so
    * any pipeline point can take a semantic pass.
    */
  def semanticStage(docs: DataFrame, embeddings: DataFrame, embIdCol: String,
                    embVecCol: String, model: Ivf.Model,
                    tau: Double): DataFrame = {
    val vecs = embeddings.select(col(embIdCol).as("doc_id"),
      col(embVecCol).as("__emb"))
    val tagged = docs.join(vecs, Seq("doc_id"), "left")
    val surv = SemDedup.dedup(
        tagged.filter(col("__emb").isNotNull).select(col("doc_id"), col("__emb")),
        "doc_id", "__emb", model, tau)
      .select(col("doc_id"), lit(1).as("__sem_keep"))
    tagged.join(surv, Seq("doc_id"), "left")
      .filter(col("__emb").isNull || col("__sem_keep").isNotNull)
      .drop("__emb", "__sem_keep")
  }

  private def downstream(deduped: DataFrame, benchmark: DataFrame,
                         cfg: Config): Staged = {
    val quality = TextStats.qualityFilter(deduped, "text")
    val kept = quality.filter(col("keep")).drop("keep", "fail_reason")
    // filter-only use: the anti-join clean form (one shuffle lighter than
    // tag+filter — no per-doc overlap counts; round-16 convergence work,
    // the decontaminate stage was the composition's load-sensitive step)
    val clean =
      if (cfg.bloomBenchmark)
        Decontaminate.tagBloom(kept, "doc_id", "text", benchmark, "text",
            cfg.shingleN)
          .filter(!col("contaminated"))
          .drop("n_contaminated", "contaminated")
      else Decontaminate.clean(kept, "doc_id", "text", benchmark, "text",
        cfg.shingleN)
    val budgeted = Curation.tokenBudgetPerGroup(
        clean.withColumn("__n_tokens", size(TextDedup.tokens(col("text")))),
        groupCol = "source", tokenCol = "__n_tokens",
        orderBy = Seq(col("__n_tokens").desc, col("doc_id").asc),
        budgetByGroup = cfg.budgetByGroup, defaultBudget = cfg.defaultBudget)
      .drop("__n_tokens", "cum_tokens")
    val chunks = Chunker.chunk(budgeted, "doc_id", "text",
      cfg.chunkWidth, cfg.chunkStride)
    Staged(deduped, kept, clean, budgeted, chunks)
  }

  def prepare(docs: DataFrame, benchmark: DataFrame,
              cfg: Config = Config()): Prepared = {
    val spark = docs.sparkSession
    import spark.implicits._
    val s = stages(docs, benchmark, cfg)

    // stage audit: count each frontier once (the stages are lazy; counting
    // here materializes the lineage exactly once per stage boundary)
    val summary = Seq(
      ("input", docs.count()),
      ("deduped", s.deduped.count()),
      ("quality_kept", s.kept.count()),
      ("decontaminated", s.clean.count()),
      ("budgeted", s.budgeted.count()),
      ("chunks", s.chunks.count())).toDF("stage", "n_rows")
    Prepared(s.chunks, summary)
  }
}
