package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance weights for resampling a raw
  * corpus toward a target distribution (Xie, Santurkar, Ma, Liang: "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023). Each raw document is scored by the log-ratio of its
  * bag-of-features likelihood under the TARGET corpus's feature
  * distribution vs the RAW corpus's own:
  *
  *   log w(x) = Σ_{f ∈ x} [ ln p_target(f) − ln p_raw(f) ]
  *
  * with add-one smoothing over the raw feature space (every scored
  * feature exists in raw by construction; target counts may be zero).
  * High-weight documents look like the target; resampling by `w`
  * (compose with [[Sampling.weightedSample]], or take the top-k by
  * weight for hard selection) shifts the corpus mixture toward it —
  * the published use: select web-scale pretraining data to match a
  * curated exemplar set.
  *
  * Features are DSIR's unigram+bigram family over the engine's
  * normalized token stream ([[TextDedup.tokens]] — the shared
  * tokenization every text operator uses). Two forms:
  *
  *   - [[docFeatures]]: raw n-gram strings. Feature-table cardinality is
  *     corpus-vocabulary-sized; exact and ORACLE-portable (the canonical
  *     q_ext_dsir_weights query).
  *   - [[docFeaturesHashed]]: `pmod(xxhash64(f), buckets)` — DSIR's
  *     hashed form. The count tables are bounded by `buckets` (the paper
  *     uses 10⁴) regardless of corpus size, so at 100 TB the two model
  *     frames stay broadcast-sized while the exact form's vocabulary
  *     table would itself be huge. Collisions fold rare features
  *     together — the paper's accepted trade. Spec-locked against the
  *     exact form's shape (hashing is engine-internal, not in the SQL
  *     oracle surface).
  *
  * Scale shape (mirrors [[NgramLm.avgLogProb]]): counting is two
  * groupBy aggregates over the exploded feature stream (map-side
  * partials collapse token skew); scoring joins the doc-feature stream
  * to the count frames co-keyed on the feature — no broadcast assumption
  * for the exact form, broadcast-sized by construction for the hashed
  * form. Totals ride as single-row cross-joined frames, never driver
  * scalars.
  *
  * Engine-portable integer arithmetic: each per-occurrence term
  *   ln(ct+1) − ln(Nt+F) − ln(cr+1) + ln(Nr+F)
  * is computed left-associated exactly as written and floored to
  * integer nano-nats (`floor(1e9·term + 0.5)` BIGINT) — per-doc sums
  * are then exact, associative, and partition-order-independent; the
  * DuckDB oracle evaluates the identical expression (the
  * [[NgramLm]] discipline for the FP-aggregate hazard).
  */
object Dsir {

  /** Nano-nat scale (shared with [[NgramLm.LnScale]]). */
  val LnScale: Double = NgramLm.LnScale

  /** The DSIR feature stream: one row per unigram and per adjacent
    * bigram occurrence — (idCol, keep..., f) with bigrams space-joined.
    * `keep` columns ride along untouched (e.g. an event-time column for
    * the streaming scorer).
    */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String,
                  keep: Seq[String] = Nil): DataFrame = {
    val ts = filter(TextDedup.tokens(col(textCol)), t => t =!= "")
    val bigrams = zip_with(
      slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
      slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    // spread BEFORE the tokenize+explode (round-19: single-row-group
    // inputs otherwise run the whole feature stream on one task); no-op
    // on already-split and streaming inputs
    // .distinct: keep may name textCol — a duplicated column would make
    // the later col(textCol) reference ambiguous (round-19 advice)
    Partitioning.spread(
        docs.select((idCol +: keep :+ textCol).distinct.map(col): _*))
      .select(col(idCol) +: keep.map(col)
        :+ explode(concat(ts, bigrams)).as("f"): _*)
  }

  /** [[docFeatures]] folded to `buckets` hashed features — the
    * fixed-width scale path. xxhash64 is Spark-native codegen; pmod
    * keeps the bucket non-negative.
    */
  def docFeaturesHashed(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    docFeatures(docs, idCol, textCol)
      .select(col(idCol), pmod(xxhash64(col("f")), lit(buckets.toLong)).as("f"))
  }

  /** A fitted DSIR model: the two count frames plus their single-row
    * totals — four plain DataFrames, so a deployment persists them as
    * parquet (the [[Pq.saveCodebook]] amortization pattern) and scores
    * any number of batches with ONE corpus pass each instead of
    * re-counting. In the hashed form every frame is ≤ `buckets` rows.
    */
  final case class Model(rawCounts: DataFrame, targetCounts: DataFrame,
                         rawTotals: DataFrame, targetTotal: DataFrame)

  /** Count the feature distributions of both corpora (the expensive
    * passes; two groupBy aggregates each).
    */
  def fit(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
          buckets: Option[Int] = None): Model = {
    def feats(df: DataFrame) = buckets match {
      case Some(b) => docFeaturesHashed(df, idCol, textCol, b)
      case None => docFeatures(df, idCol, textCol)
    }
    val cr = feats(raw).groupBy("f").agg(count(lit(1)).as("cr"))
    val ct = feats(target).groupBy("f").agg(count(lit(1)).as("ct"))
    Model(cr, ct,
      rawTotals = cr.agg(sum("cr").as("nr"), count(lit(1)).as("fcard")),
      targetTotal = ct.agg(sum("ct").as("nt")))
  }

  /** Attach the per-occurrence nano-nat term to a feature stream under a
    * fitted model — LEFT joins on BOTH count frames, so a feature the
    * fitted raw corpus never saw (possible when scoring a NEW batch, the
    * amortized fit/score use) floors at add-one on both sides and scores
    * the corpus-ratio constant ln((Nr+F)/(Nt+F)) instead of being
    * silently dropped (an inner join would deflate n_feats by exactly
    * the unseen mass). For self-scoring every key matches and the
    * coalesce never fires — identical values.
    */
  def withTermScaled(feats: DataFrame, model: Model): DataFrame =
    feats
      .join(model.rawCounts.withColumnRenamed("cr", "cr_hit"), Seq("f"), "left")
      .join(model.targetCounts.withColumnRenamed("ct", "ct_hit"), Seq("f"), "left")
      .crossJoin(broadcast(model.rawTotals))
      .crossJoin(broadcast(model.targetTotal))
      .withColumn("t", termScaled(coalesce(col("ct_hit"), lit(0L)),
        coalesce(col("cr_hit"), lit(0L)), col("nt"), col("nr"), col("fcard")))

  /** Score `docs` under a fitted model — one feature-stream pass joined
    * co-keyed to the count frames; totals ride as broadcast singletons.
    */
  def score(docs: DataFrame, model: Model, idCol: String, textCol: String,
            buckets: Option[Int] = None): DataFrame = {
    val fr = buckets match {
      case Some(b) => docFeaturesHashed(docs, idCol, textCol, b)
      case None => docFeatures(docs, idCol, textCol)
    }
    withTermScaled(fr, model)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum("t").as("logw_scaled"))
      .withColumn("logw",
        round(col("logw_scaled").cast("double") / LnScale, 6))
  }

  /** Per-document DSIR importance log-weights of `raw` toward `target`:
    * (idCol, n_feats, logw_scaled, logw) where logw_scaled is the exact
    * BIGINT nano-nat sum over the document's feature occurrences and
    * logw = round(logw_scaled / 1e9, 6) nats. Documents with no tokens
    * are absent (no features to score). `buckets = Some(b)` routes both
    * corpora through [[docFeaturesHashed]]. Self-contained [[fit]] +
    * [[score]] — an inner SCORED feature in raw always has cr ≥ 1.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String,
                        buckets: Option[Int] = None): DataFrame =
    score(raw, fit(raw, target, idCol, textCol, buckets), idCol, textCol,
      buckets)

  /** floor(1e9·(ln(ct+1) − ln(Nt+F) − ln(cr+1) + ln(Nr+F)) + 0.5) —
    * left-associated exactly as the oracle SQL writes it.
    */
  private def termScaled(ct: Column, cr: Column,
                         nt: Column, nr: Column, fcard: Column): Column =
    floor(lit(LnScale) *
      (log(ct + 1) - log(nt + fcard) - log(cr + 1) + log(nr + fcard))
      + 0.5).cast("long")
}
