package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Scratch: measure lambda-invariant recompute in vector expressions. */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(512)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = LocalSession(cores = 32, logLevel = "ERROR")
    import spark.implicits._

    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => (i + col("id")).cast("double") / lit(dim)).as("v"))
      .persist()
    vecs.count()

    def quantHoisted(v: Column): Column = {
      val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
      when(maxAbs === 0, transform(v, _ => lit(0)))
        .otherwise(zip_with(v, array_repeat(maxAbs, size(v)),
          (x, m) => round(x.cast("double") * 127.0 / m).cast("int")))
    }

    def time(label: String)(c: Column): Unit = {
      val t0 = System.nanoTime()
      val r = vecs.select(sum(element_at(c, 1))).collect()(0).getDouble(0)
      println(f"[vec] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs check=$r%.3f")
    }
    // warm-up
    time("warmup current")(Similarity.quantizeInt8(col("v")).cast("array<double>"))
    time("quantize current")(Similarity.quantizeInt8(col("v")).cast("array<double>"))
    time("quantize hoisted")(quantHoisted(col("v")).cast("array<double>"))
    time("l2norm current")(Similarity.l2normalize(col("v")))

    // parity
    val diff = vecs.select(
      sum(when(Similarity.quantizeInt8(col("v")) =!= quantHoisted(col("v")), 1)
        .otherwise(0))).collect()(0)
    println(s"[vec] mismatch rows = $diff")
    spark.stop()
  }
}
