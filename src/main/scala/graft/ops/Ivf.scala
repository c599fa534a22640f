package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vec_cosine

/** IVF (inverted-file) approximate nearest neighbor: spherical k-means coarse
  * quantizer + cluster-probed search (SURVEY §7.8 — "an IVF or LSH-bucketed
  * variant as the scale path"; complements [[Similarity.annTopK]]'s
  * hyperplane LSH).
  *
  * The model (k × dim centroids) is deliberately driver-held: it is a few KB,
  * broadcast into assignment expressions as literals — the classic IVF
  * structure. Training is Lloyd iterations where each step is one distributed
  * pass (assign map-side via the native vec_cosine, recompute centroids with
  * a posexplode + groupBy mean); only the tiny centroid table is collected
  * per iteration.
  *
  * Determinism: centroids initialize from the first k vectors by id; ties in
  * assignment break to the higher cluster id (struct array_max) — no
  * randomness anywhere.
  */
object Ivf {

  final case class Model(centroids: IndexedSeq[Array[Double]]) {
    def k: Int = centroids.size
  }

  /** Above this k, assignment switches from the unrolled literal form to
    * the native [[graft.functions.IvfExpressions.CentroidScores]]
    * expression: unrolled codegen is O(k × dim) Java source and collides
    * with Janino's method limit as k reaches the hundreds, while the
    * native kernel's generated code is constant-size at any k. Below it
    * the unrolled form stays — it inlines fully into whole-stage codegen
    * with zero per-row allocation.
    */
  private val UnrollMaxK = 32

  /** (score, clusterId) structs for a vector against every centroid — the
    * shared building block of assignment (argmax) and probing (top-nprobe).
    * The two forms are value-identical (same per-centroid arithmetic —
    * IvfSpec asserts it), so the choice is purely a codegen-size strategy.
    */
  private def scoredCentroids(vec: Column, model: Model): Column =
    if (model.k <= UnrollMaxK) scoredCentroidsUnrolled(vec, model)
    else scoredCentroidsNative(vec, model)

  private[graft] def scoredCentroidsUnrolled(vec: Column, model: Model): Column =
    array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(vec_cosine(vec, array(c.map(lit): _*)).as("s"), lit(i).as("i"))
    }: _*)

  private[graft] def scoredCentroidsNative(vec: Column, model: Model): Column =
    graft.functions.IvfExpressions.centroid_scores(vec, model.centroids)

  /** argmax-by-cosine cluster assignment expression for a vector column.
    *
    * A null vector assigns to sentinel cluster -1 rather than null. Not a
    * convenience: `coalesce(..., -1)` makes the expression NON-NULLABLE, so
    * joining on the assigned cluster infers no `isnotnull(...)` constraint
    * filter — which would re-evaluate the entire k-centroid scoring a
    * second time per row (flagged by `Explain genfilters`, round 7). Probe
    * ids are real centroids (≥ 0), so -1 never matches a probe, preserving
    * the old null-never-joins behavior.
    */
  def assignExpr(vec: Column, model: Model): Column =
    // the null guard must be EXPLICIT on the vector (IvfSpec locks it): a
    // null vector nulls only each scored struct's SCORE FIELD — the struct
    // itself is non-null, struct ordering still produces a (meaningless)
    // argmax index, and a bare coalesce never fires. Both branches are
    // non-nullable, preserving the no-genfilter property above.
    when(vec.isNotNull,
      coalesce(array_max(scoredCentroids(vec, model)).getField("i"), lit(-1)))
      .otherwise(lit(-1))

  private def l2normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Train a spherical k-means quantizer. Each iteration: one assignment pass
    * (map-side) + one element-wise mean (shuffle bounded by k × dim rows).
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 3): Model = {
    val vecs = df.select(col(idCol), Similarity.toDouble(col(vecCol)).as("__v"))
    val init = vecs.orderBy(col(idCol)).limit(k)
      .select("__v").collect()
      .map(r => l2normalize(r.getSeq[Double](0).toArray)).toIndexedSeq
    (1 to iters).foldLeft(Model(init)) { (model, _) =>
      val assigned = vecs.withColumn("__c", assignExpr(col("__v"), model))
      val means = assigned
        .select(col("__c"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__c", "__pos").agg(avg(col("__x")).as("__m"))
        .groupBy("__c")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ms"))
        .select(col("__c"), transform(col("__ms"), s => s.getField("__m")).as("__centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      Model(model.centroids.indices.map(i =>
        means.get(i).map(l2normalize).getOrElse(model.centroids(i))))
    }
  }

  /** k-means training with engine-portable arithmetic: every centroid
    * element is the exact rational `sumQ / (scale * n)` where `sumQ` is an
    * INTEGER sum of `floor(x * scale + 0.5)` quantizations — integer
    * addition is order-independent, so the distributed sum is reproducible
    * bit-for-bit by any engine (unlike [[train]]'s `avg(double)`, whose
    * partial-aggregation order makes the low bits nondeterministic). That
    * makes the whole train→assign→probe→rank IVF pipeline expressible as
    * unrolled SQL CTEs — the basis of the q_ext_sim_ivf oracle.
    *
    * Two deliberate differences from [[train]], both cosine-neutral:
    * centroids are NOT l2-normalized (cosine assignment is scale-invariant,
    * so normalization is cosmetic — dropping it removes the sqrt/dot from
    * centroid construction, the one place FP accumulation order could
    * diverge across engines), and element means carry ~1/scale quantization
    * error (~1e-6 at the default 2^20 — far below clustering noise; IvfSpec
    * checks the resulting quantizer's search quality directly).
    */
  def trainPortable(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2, scale: Long = 1L << 20): Model = {
    val vecs = df.select(col(idCol), Similarity.toDouble(col(vecCol)).as("__v"))
    val init = vecs.orderBy(col(idCol)).limit(k)
      .select("__v").collect()
      .map(_.getSeq[Double](0).toArray).toIndexedSeq
    (1 to iters).foldLeft(Model(init)) { (model, _) =>
      val sums = vecs.withColumn("__c", assignExpr(col("__v"), model))
        .select(col("__c"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__c", "__pos")
        .agg(sum(floor(col("__x") * lit(scale.toDouble) + lit(0.5)).cast("long")).as("__sq"),
          count(lit(1)).as("__n"))
        .collect()
      val means: Map[Int, Array[Double]] = sums.groupBy(_.getInt(0)).map {
        case (c, rs) =>
          val arr = new Array[Double](rs.length)
          rs.foreach(r =>
            arr(r.getInt(1)) = r.getLong(2).toDouble / (scale.toDouble * r.getLong(3)))
          c -> arr
      }
      // empty clusters keep their previous centroid
      Model(model.centroids.indices.map(i => means.getOrElse(i, model.centroids(i))))
    }
  }

  /** Deterministic fixed-centroid quantizer: the vectors of `ids` (in order)
    * become the centroids, unnormalized — cosine is scale-invariant, so
    * assignment and probing are unaffected, and the model is reproducible
    * from the raw table by any engine (the basis of the IVF oracle check).
    * Quantization quality is below k-means ([[train]]); the IVF structure —
    * inverted lists, nprobe search — is identical.
    */
  def fixedModel(df: DataFrame, idCol: String, vecCol: String,
                 ids: Seq[Long]): Model = {
    val byId = df.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long"), Similarity.toDouble(col(vecCol)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    require(ids.forall(byId.contains), s"missing centroid ids: ${ids.filterNot(byId.contains)}")
    Model(ids.toIndexedSeq.map(byId(_)))
  }

  /** Persist a model as a tiny (cid, centroid) parquet table — the
    * operational form: search/assignment sessions LOAD the model instead
    * of re-training or re-deriving it, and the table is auditable and
    * diffable like any other store artifact (the CorpusStore posture
    * applied to the quantizer).
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]] table; centroid order restored by cid. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    val rows = spark.read.parquet(path).select("cid", "centroid").collect()
    require(rows.nonEmpty, s"empty model at $path")
    Model(rows.sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray).toIndexedSeq)
  }

  /** Tag every row with its coarse cluster (map-side; persist/write the
    * result partitioned by `ivf_cluster` to make probes partition-pruned).
    *
    * STORE CONTRACT: rows with a null vector carry cluster `-1`, not null
    * (see [[assignExpr]] — the sentinel keeps the expression non-nullable).
    * Stores written before round 7 hold null for those rows instead;
    * readers of mixed-vintage tables should treat `ivf_cluster IS NULL OR
    * ivf_cluster = -1` as "unassigned". Probe ids are real centroids
    * (>= 0), so both encodings are equally unreachable by probes.
    */
  def assign(df: DataFrame, vecCol: String, model: Model,
             clusterCol: String = "ivf_cluster"): DataFrame =
    df.withColumn(clusterCol, assignExpr(col(vecCol), model))

  /** The nprobe nearest centroids of a vector, as an exploded (vector, probe)
    * expression input.
    */
  private[ops] def probesExpr(vec: Column, model: Model, nprobe: Int): Column =
    // sort descending by score (array_sort ascending on (s, i) then reverse)
    slice(reverse(array_sort(scoredCentroids(vec, model))), 1, nprobe)

  /** IVF ANN top-k: candidates scan only the `nprobe` clusters nearest to
    * each query. Work per query is bounded by probed-cluster volume, not n.
    */
  def annTopK(queries: DataFrame, candidates: DataFrame,
              idCol: String, vecCol: String, model: Model,
              k: Int, nprobe: Int = 4, scoreDecimals: Int = 6): DataFrame = {
    val cand = assign(candidates.select(col(idCol).as("cand_id"), col(vecCol).as("__cv")),
      "__cv", model, clusterCol = "__cluster")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__probe", explode(probesExpr(col("__qv"), model, nprobe)))
      .withColumn("__cluster", col("__probe").getField("i"))
      .drop("__probe")
    val scored = cand.join(broadcast(q), Seq("__cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(vec_cosine(col("__qv"), col("__cv")), scoreDecimals))
    Similarity.rankTopK(scored, k)
  }
}
