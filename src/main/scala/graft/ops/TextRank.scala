package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank
  * over the word co-occurrence graph — the unsupervised keyword/keyphrase
  * baseline, here as a pure composition of engine operators.
  *
  * Graph: distinct adjacent-token pairs, symmetrized (TextRank's graph is
  * undirected; a directed power iteration over both edge directions is
  * the standard equivalent). Rank mass concentrates on tokens that
  * co-occur with MANY DISTINCT other tokens — connectivity, not raw
  * frequency (a token repeated in one boilerplate pair stays low).
  *
  * Scale shape (round 15): ONE corpus pass — the sentinel-extended bigram
  * stream ([[NgramLm.docBigramsWithEnd]]) partial-aggregates into
  * (w1, w2, cnt), from which BOTH the vocabulary (tf = sum of counts per
  * w1 — exact, every token occurrence is a w1 exactly once) and the
  * adjacency set (w2 non-null rows) derive. The round-14 shape paid two
  * corpus tokenize passes (vocabulary agg + bigram stream) plus
  * zipWithIndex's extra jobs; this derives everything downstream from
  * the one vocab²-bounded pair table. Below the measured-size threshold
  * ([[PageRank.LocalEdgesMax]] rows, the same bounded count-then-collect
  * gate as the graph tier) the id assignment, edge build, iteration
  * ([[PageRank.localIterate]] — the bit-identical integer twin), and
  * output join all run in-JVM and return a LocalRelation; above it the
  * identical construction runs distributed (small-table shuffles over
  * the pair table, ranks by the O(|V|+|E|) iteration). Both regimes are
  * integer-exact and oracle-checkable end-to-end;
  * TextRankLocalPathSpec locks their bit-identity both ways.
  */
object TextRank {

  /** `a < b` in unsigned UTF-8 byte order — exactly Spark's UTF8String
    * binary comparison (and code-point order for valid strings), so the
    * driver-local regime tie-breaks identically to the distributed one
    * even for supplementary-plane tokens, where Java String '<' (UTF-16
    * code-unit order) diverges from UTF-8 order.
    */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Top-`topN` corpus keywords: (token, rank_scaled), rank desc, token
    * tie-break. Pins the pair/vocab frames for the session in the
    * distributed regime (job-per-query shape); long-lived sessions should
    * use [[keywordsManaged]]. The measured-small regime pins nothing.
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               iterations: Int = 5, topN: Int = 50): DataFrame =
    keywordsManaged(docs, idCol, textCol, iterations, topN).df

  /** [[keywords]] with an explicit cache-release handle covering the
    * pair-table and vocab-id pins plus everything the inner [[PageRank]]
    * run pinned or checkpointed (empty in the measured-small regime —
    * a LocalRelation result needs no pins at all).
    */
  def keywordsManaged(docs: DataFrame, idCol: String, textCol: String,
                      iterations: Int = 5, topN: Int = 50): Managed = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = docs.sparkSession
    // the ONE corpus pass: sentinel-extended adjacent-pair counts
    val pairCounts = Managed.ensurePersisted(
      NgramLm.docBigramsWithEnd(docs, idCol, textCol)
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt")),
      lvl)
    // measured-size gate, same discipline as PageRank.collectSmallEdges:
    // bounded count probe first (no row transfer above the threshold),
    // collect only when it qualifies
    val localMax = PageRank.LocalEdgesMax
    val localRows: Option[Array[org.apache.spark.sql.Row]] =
      if (localMax <= 0 || localMax >= Int.MaxValue) None
      else {
        val probe = pairCounts.limit(localMax.toInt + 1)
        if (probe.count() > localMax) None else Some(probe.collect())
      }
    localRows match {
      case Some(rows) =>
        pairCounts.unpersist(false)
        // driver twin: identical arithmetic, zero pins. Null w1 cannot
        // occur (tokens() never yields null; empty filtered upstream).
        val tf = scala.collection.mutable.HashMap.empty[String, Long]
        rows.foreach { r =>
          val w1 = r.getString(0)
          tf(w1) = tf.getOrElse(w1, 0L) + r.getLong(2)
        }
        // vocab ids by (tf desc, token asc) — the vocabIds order.
        // Tie-break in UTF-8 BYTE order (= code-point order), not Java
        // String '<' (UTF-16 code-unit order): the two diverge for
        // supplementary-plane tokens vs U+E000..U+FFFF, and the
        // distributed twin sorts by Spark's UTF8String binary order
        val tokens = tf.keysIterator.toArray
          .sortWith((x, y) => tf(x) > tf(y) || (tf(x) == tf(y) && utf8Lt(x, y)))
        val idOf = new java.util.HashMap[String, Int](tokens.length * 2)
        tokens.zipWithIndex.foreach { case (t, j) => idOf.put(t, j) }
        // distinct unordered id pairs, then both directions (a≠b)
        val und = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val x = idOf.get(r.getString(0)).toLong
            val y = idOf.get(r.getString(1)).toLong
            und += ((math.min(x, y), math.max(x, y)))
          }
        }
        val edges = und.iterator.flatMap { case (a, b) =>
          if (a == b) Iterator((a, b)) else Iterator((a, b), (b, a))
        }.toArray
        val ranked = PageRank.localIterate(edges, seedSet = None,
          iterations, dampingPct = 85)
        val top = ranked
          .map { case (node, rank) => (tokens(node.toInt), rank) }
          .sortWith { case ((t1, r1), (t2, r2)) =>
            r1 > r2 || (r1 == r2 && utf8Lt(t1, t2)) // UTF-8 order, as above
          }
          .take(topN)
        import spark.implicits._
        new Managed(top.toDF("token", "rank_scaled"), Nil, Nil)
      case None =>
        // distributed regime: the same construction as small-table plans
        // over the pair table — no second corpus pass
        val ids = TextStats.vocabIds(
          pairCounts.groupBy(col("w1").as("token"))
            .agg(sum("cnt").cast("long").as("tf"))).persist(lvl)
        val und = pairCounts.filter(col("w2").isNotNull)
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
        new Managed(out, Seq(pairCounts, ids, edges) ++ pr.caches, pr.rdds)
    }
  }
}
