package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an N× dataset under /tmp for scale validation (NEXT round-2
  * item 2): each copy k shifts ids by k·stride and, for documents,
  * suffixes every content token with `_k` — within-copy near-dup structure
  * is preserved exactly (the suffixing is a shingle bijection, Jaccard is
  * bijection-invariant), while cross-copy texts share no content tokens,
  * so the dup-pair count scales linearly like a real corpus, not
  * quadratically like naive duplication. (Round 2 used a rotated alphabet
  * instead — only 26 distinct rotations, so copies ≥ 26 silently produced
  * identical cross-copy texts and a quadratic pair blow-up at 100×; the
  * token suffix is injective for any copy count.)
  *
  * STOPWORDS are left untouched (round-17 verdict item 2): suffixing them
  * too (`the → the_7`) erased all stopword evidence, so the Gopher-style
  * quality rule (`minStopwordRatio`) rejected every scaled doc and the
  * corpus-prep admission stages never ran at 100×. Content words still
  * carry the copy index, so cross-copy texts stay near-dup-disjoint (only
  * all-stopword shingles can collide across copies — Jaccard ≪ any
  * threshold); within-copy bijectivity is unaffected (the map is identity
  * on stopwords, injective suffixing elsewhere).
  *
  * Usage: `sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1ish [copies]"`.
  */
object ScaleGen {

  /** Token-suffix pattern: a whole token (not preceded by non-space) that
    * is not a default stopword. `(?<!\S)` anchors the match to a token
    * start — a bare negative lookahead would let `\S+` re-match the tail
    * of a rejected stopword (`the` → `t` + `he_k`). The stopword
    * alternation is case-INSENSITIVE (`(?i:...)`) because
    * [[graft.ops.TextStats.stopwordCount]] lowercases before matching: a
    * sentence-capitalized `The` suffixed to `The_k` would stop matching
    * `\bthe\b` (underscore is a word character), silently erasing
    * capitalized-stopword evidence from scaled copies. Each stopword is
    * regex-quoted so a future list entry carrying a metacharacter can't
    * corrupt the pattern.
    */
  private[tools] val contentTokenRe: String =
    "(?<!\\S)(?!(?i:" + graft.ops.TextStats.defaultStopwords
      .map(java.util.regex.Pattern.quote).mkString("|") +
      ")(?!\\S))(\\S+)"

  def copies(spark: SparkSession, src: DataFrame, n: Int,
             idCols: Seq[String], stride: Long,
             textCols: Seq[String] = Nil): DataFrame =
    (0 until n).map { k =>
      val shifted = idCols.foldLeft(src)((df, c) =>
        df.withColumn(c, col(c) + lit(k * stride)))
      textCols.foldLeft(shifted)((df, c) =>
        df.withColumn(c, regexp_replace(col(c), contentTokenRe, "$1_" + k)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_sf1ish")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")

    Seq(
      ("documents", copies(spark, t("documents"), n, Seq("doc_id"), 1000000L, Seq("text"))),
      ("embeddings", copies(spark, t("embeddings"), n, Seq("vec_id"), 1000000L)),
      ("events", copies(spark, t("events"), n, Seq("event_id", "user_id"), 10000000L)),
      ("lineitem", copies(spark, t("lineitem"), n, Seq("l_orderkey"), 100000000L)),
      ("orders", copies(spark, t("orders"), n, Seq("o_orderkey", "o_custkey"), 100000000L)),
      ("part", t("part")), ("customer", t("customer")),
      ("supplier", t("supplier")), ("nation", t("nation")),
      ("region", t("region"))
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name -> $out (${spark.read.parquet(s"$out/$name.parquet").count()} rows)")
    }
    spark.stop()
  }
}
