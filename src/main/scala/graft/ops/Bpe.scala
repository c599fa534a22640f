package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction (Sennrich, Haddow & Birch, ACL
  * 2016 — the subword tokenizer trainer behind modern LLM vocabularies,
  * operating on characters as in the paper).
  *
  * Scale shape: BPE iterations never touch the corpus. The corpus
  * collapses ONCE to the (word, count) frequency table (thousands to
  * millions of rows, versus billions of documents), and every merge
  * iteration runs over that compact table: explode adjacent symbol
  * pairs weighted by word count, take the global best (a k-bounded
  * driver scalar per iteration — the trainer is a driver loop in every
  * implementation), apply the merge with one literal string replace.
  * 100 TB of text costs one vocabulary aggregation plus `numMerges`
  * small jobs.
  *
  * Representation: a word's symbol state is "SEP sym (SEP SEP sym)* SEP"
  * (U+0001 separators: DOUBLE between symbols, single at the word
  * boundaries). A pair (a, b) then occurs exactly as the substring
  * "SEP a SEP SEP b SEP", and because each occurrence's trailing
  * boundary char is disjoint from the next occurrence's leading one,
  * the literal leftmost-non-overlapping `replace` with "SEP ab SEP"
  * merges ALL non-overlapping occurrences in one pass: classic BPE's
  * greedy simultaneous merge ("a a a a" -> [aa][aa], "a a a" ->
  * [aa][a]; replacement output is not rescanned, so newly created
  * adjacencies wait for later iterations, as in the reference
  * implementation). A single-separator form breaks here: consecutive
  * occurrences share the middle separator and alternate merges get
  * skipped.
  *
  * Determinism: best-pair ties break lexicographically (count desc,
  * pair asc) — a total order, so the learned merge sequence is a pure
  * function of the corpus. Every step is portable string/arithmetic
  * work: the merge table is oracle-checked in SQL via a generated CTE
  * chain, one level per iteration.
  */
object Bpe {

  /** Symbol separator (U+0001 — never occurs in normalized text). */
  val Sep = ""

  /** (word, count) table from a document frame — the ONE corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** "low" -> Sep + "l" + Sep*2 + "o" + Sep*2 + "w" + Sep (single
    * boundary separators, double interior ones).
    */
  def charSplit(word: Column): Column =
    concat(lit(Sep),
      array_join(filter(split(word, ""), s => s =!= ""), Sep + Sep),
      lit(Sep))

  /** Symbols of a working-form string, sentinel dropped. */
  def symbols(sym: Column): Column =
    filter(split(sym, Sep), s => s =!= "")

  /** Adjacent symbol pairs of a working-form string as structs (a, b). */
  private def adjacentPairs(sym: Column): Column = {
    val ss = symbols(sym)
    zip_with(
      slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
      slice(ss, lit(2), greatest(size(ss) - 1, lit(0))),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** One merge applied to a working-form string: boundaries are built
    * into the representation, so this is a single literal replace.
    */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    replace(sym, lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))

  /** Learn `numMerges` merges over the corpus. Returns the merge table
    * (merge_rank, pair_a, pair_b, pair_count) in learned order; stops
    * early if no pair remains (every word fused to one symbol).
    *
    * Two-tier: the corpus ALWAYS collapses distributed to the
    * (word, count) table; the merge loop then runs driver-local when that
    * table fits under `driverVocabMax` rows (the IVF-centroid k-bounded
    * pull, at vocab scale — every practical BPE trainer is a driver loop
    * over the aggregated vocabulary, and 2·numMerges cluster jobs over a
    * 31-row table cost ~0.25 s EACH in scheduling alone), falling back to
    * the distributed iteration beyond the cap. Both paths compute the
    * identical merge sequence (spec-locked): the local loop's
    * leftmost-non-overlapping array merge is the same greedy
    * simultaneous-merge rule as the literal `replace`.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  driverVocabMax: Long = 200000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(driverVocabMax < Int.MaxValue,
      s"driverVocabMax must fit an Int, got $driverVocabMax")
    val spark = docs.sparkSession
    // ONE bounded gate job (round 15 — was count-then-collect, two jobs
    // over a pinned table): pull at most max+1 grouped rows; the transfer
    // is bounded by the cap either way, and at vocab scale the row data
    // is a few MB. Qualifying vocabularies go straight to the driver
    // loop with nothing pinned; larger ones fall through (the distributed
    // iteration re-derives its working table — one extra corpus pass on
    // the path that is about to run numMerges cluster jobs anyway).
    if (driverVocabMax > 0) {
      val rows = wordCounts(docs, textCol)
        .limit(driverVocabMax.toInt + 1).collect()
      if (rows.length <= driverVocabMax) {
        val local = rows.map(r => (r.getString(0), r.getLong(1)))
        import spark.implicits._
        return learnMergesLocal(local, numMerges)
          .toDF("merge_rank", "pair_a", "pair_b", "pair_count")
      }
    }
    learnMergesDistributed(docs, textCol, numMerges)
  }

  /** Driver-local merge loop over a collected (word, count) vocabulary —
    * exact [[learnMergesDistributed]] semantics in memory.
    */
  private[graft] def learnMergesLocal(vocab: Array[(String, Long)],
                                    numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ss, c) =>
        var j = 0
        while (j < ss.length - 1) {
          val k = (ss(j), ss(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // count desc, pair asc — the same total order as the orderBy
        val ((pa, pb), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((i + 1, pa, pb, n))
        words = words.map { case (ss, c) =>
          // greedy leftmost non-overlapping, matching the literal replace
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < ss.length) {
            if (j < ss.length - 1 && ss(j) == pa && ss(j + 1) == pb) {
              out += pa + pb; j += 2
            } else { out += ss(j); j += 1 }
          }
          (out.toArray, c)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** The distributed merge loop — one best-pair job per iteration over
    * the cached working table. The scale path when the vocabulary
    * outgrows the driver cap.
    */
  private[ops] def learnMergesDistributed(docs: DataFrame, textCol: String,
                                          numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var words = wordCounts(docs, textCol)
      .select(charSplit(col("word")).as("sym"), col("cnt"))
      // (measured: coalescing the vocab table to few partitions SLOWS the
      // iteration loop ~15% at sf0.1 — the pair explode wants the
      // parallelism more than it minds the task count; keep the agg's
      // native partitioning)
      // the working table is read twice per iteration (best pair, then
      // rewrite); pin it — |distinct words| narrow rows — and swap the
      // pin as merges apply
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // generation-deferred release: best-pair(i) is the ONLY job of
    // iteration i — it materializes words(i)'s pin (reading words(i-1)'s
    // still-live cache), after which the grandparent can go. An explicit
    // materialize-then-unpersist per iteration would double the job
    // count, and job launch dominates: the working table is vocab-sized.
    var prev: Option[DataFrame] = None
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val best = words
        .select(explode(adjacentPairs(col("sym"))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pa").asc, col("pb").asc)
        .limit(1).collect()
      prev.foreach(_.unpersist(false)) // words is materialized now
      prev = None
      if (best.isEmpty) exhausted = true
      else {
        val (pa, pb, n) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((i + 1, pa, pb, n))
        val merged = words
          .select(applyMerge(col("sym"), pa, pb).as("sym"), col("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(words)
        words = merged
        i += 1
      }
    }
    prev.foreach(_.unpersist(false))
    words.unpersist(false)
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "pair_a", "pair_b", "pair_count")
  }

  /** ENCODE side: segment `wordCol` under a learned merge list (applied
    * in rank order — the same greedy replace as training, so training
    * words segment to their trained state). Adds `segments`
    * (array<string>) and `n_segments`.
    */
  def segment(words: DataFrame, wordCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val sym = merges.foldLeft(charSplit(col(wordCol))) {
      case (acc, (a, b)) => applyMerge(acc, a, b)
    }
    words.withColumn("segments", symbols(sym))
      .withColumn("n_segments", size(col("segments")))
  }
}
