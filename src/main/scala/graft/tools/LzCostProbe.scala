package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** Constant-factor cost of the normative portable LZ vs zlib deflate —
  * both map-side scan-bound; only the constant differs. A `sum()` over
  * the computed column FORCES evaluation (a bare count() lets Catalyst
  * prune the projection entirely — which is also why the bench's
  * count()-terminated timing of q_ext_compress_ratio measures the scan,
  * not the codecs; this probe is the honest codec number).
  *
  *   sbt "runMain graft.tools.LzCostProbe [dir] [reps]"
  */
object LzCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        docs.agg(sum(c)).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lzcost] $label%-16s floor=${ts.min}%6.2fs " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("scan_only", length(col("text")).cast("double"))
    time("deflate", TextStats.compressionRatio(col("text")))
    time("lz_ratio", TextStats.lzRatio(col("text")))
    spark.stop()
  }
}
