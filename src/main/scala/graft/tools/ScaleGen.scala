package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-like dataset (10× sf0.1) under /tmp for scale validation
  * (NEXT round-2 item 2): each copy k shifts ids by k·stride and, for
  * documents, rewrites letters with a k-rotated alphabet — within-copy
  * near-dup structure is preserved exactly (the same bijection applies to
  * both members of a pair, Jaccard is permutation-invariant), while
  * cross-copy texts share no tokens, so the dup-pair count scales linearly
  * like a real corpus, not quadratically like naive duplication.
  *
  * Usage: `sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1ish [copies]"`.
  */
object ScaleGen {

  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  private def rotated(k: Int): String = {
    val r = k % 26
    alphabet.drop(r) + alphabet.take(r)
  }

  def copies(spark: SparkSession, src: DataFrame, n: Int,
             idCols: Seq[String], stride: Long,
             textCols: Seq[String] = Nil): DataFrame =
    (0 until n).map { k =>
      val shifted = idCols.foldLeft(src)((df, c) =>
        df.withColumn(c, col(c) + lit(k * stride)))
      textCols.foldLeft(shifted)((df, c) =>
        df.withColumn(c, translate(col(c),
          alphabet + alphabet.toUpperCase, rotated(k) + rotated(k).toUpperCase)))
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
