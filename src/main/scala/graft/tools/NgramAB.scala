package graft.tools

import org.apache.spark.sql.functions._

/** One-session A/B of ngramJaccardPairs collapseExact on the oracle query's
  * own input shape (dev probe for the round-8 floor question). */
object NgramAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 500)
    def run(collapse: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.TextDedup.ngramJaccardPairsManaged(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5, collapseExact = collapse)
        .use(_.count())
      (System.nanoTime() - t0) / 1e9
    }
    run(true); run(false) // warm
    val on = (1 to reps).map(_ => run(true))
    val off = (1 to reps).map(_ => run(false))
    println(f"[ngramab] collapse=on  min=${on.min}%.3f all=${on.map(t => f"$t%.2f").mkString(",")}")
    println(f"[ngramab] collapse=off min=${off.min}%.3f all=${off.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
