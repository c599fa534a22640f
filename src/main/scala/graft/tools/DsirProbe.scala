package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR at 100×: exact-ngram vs hashed fixed-width form on the ScaleGen
  * documents fixture (~500k docs, copy-disjoint vocabularies — the
  * worst case for the exact form's feature-table growth, since the
  * feature space scales with copies). Target = the lang='en' subset,
  * the q_ext_dsir_weights shape.
  *
  * Usage: `sbt "runMain graft.tools.DsirProbe [dir100x] [buckets]"`.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_100x")
    val buckets = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val target = docs.filter(col("lang") === "en")
    println(s"[dsir] corpus=${docs.count()} target=${target.count()}")
    val featSpace = Dsir.docFeatures(docs, "doc_id", "text")
      .select("f").distinct().count()
    println(s"[dsir] exact feature space = $featSpace")

    Seq("exact" -> None, s"hashed($buckets)" -> Some(buckets)).foreach {
      case (label, b) =>
        (1 to 2).foreach { rep =>
          val t0 = System.nanoTime()
          val n = Dsir.importanceWeights(docs, target, "doc_id", "text", b)
            .count()
          println(f"[dsir] $label%-14s rep=$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
        }
    }
    spark.stop()
  }
}
