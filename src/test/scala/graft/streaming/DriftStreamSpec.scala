package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.ops.Profiler

/** [[DriftStream]]: windowed intake profiles close on the watermark and
  * compare against a static reference — healthy windows pass, a window
  * with a null spike or out-of-bounds extrema flags, and the numeric
  * bounds compare numerically (not lexicographically).
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  case class Doc(ts: Timestamp, score: java.lang.Long, lang: String)

  "windowProfile + drift" should "pass healthy windows and flag a drifting one" in {
    implicit val sqlCtx = spark.sqlContext
    // blessed snapshot: scores 10..50, langs en/fr, no nulls
    val blessed = Seq((10L, "en"), (50L, "fr"), (30L, "en"))
      .toDF("score", "lang")
    val reference = Profiler.profile(blessed, exactDistinct = true)

    val input = MemoryStream[Doc]
    val windowed = DriftStream.windowProfile(
      input.toDF(), "ts", watermark = "0 minutes", windowLen = "10 minutes",
      cols = Seq("score", "lang"))
    val query = DriftStream.drift(windowed, reference)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    try {
      // window [0,10): healthy — inside blessed bounds, no nulls
      input.addData(Doc(ts(1), 15L, "en"), Doc(ts(2), 42L, "fr"))
      query.processAllAvailable()
      // window [10,20): drifting — a null score, score 9 < ref_min 10
      // (lexicographically "9" > "10": the numeric compare must catch
      // it), and a THIRD language vs the blessed two (distinct escape)
      input.addData(Doc(ts(11), 9L, "en"), Doc(ts(12), null, "fr"),
        Doc(ts(13), 20L, "zz"))
      query.processAllAvailable()
      // window [20,30) only exists to close [10,20) past the watermark
      input.addData(Doc(ts(21), 20L, "en"))
      query.processAllAvailable()

      val out = spark.table("drift_stream").collect()
        .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000L,
          r.getAs[String]("column")) -> r).toMap
      out((0L, "score")).getAs[Boolean]("drift") shouldBe false
      out((0L, "lang")).getAs[Boolean]("drift") shouldBe false
      val bad = out((10L, "score"))
      bad.getAs[Boolean]("drift") shouldBe true
      bad.getAs[Double]("null_frac") shouldBe (1.0 / 3.0)
      bad.getAs[String]("min") shouldBe "9"
      // lang flags on the distinct escape alone: no nulls, "en".."zz"
      // inside no bound check (strings compare, en >= en, zz... exceeds
      // ref_max "fr") — both the extrema escape AND 3 > 2·1.05 fire
      val langBad = out((10L, "lang"))
      langBad.getAs[Boolean]("drift") shouldBe true
      langBad.getAs[Long]("n_distinct") shouldBe 3L
      langBad.getAs[Long]("ref_distinct") shouldBe 2L
    } finally query.stop()
  }

  it should "flag columns absent from the reference" in {
    implicit val sqlCtx = spark.sqlContext
    val reference = Profiler.profile(
      Seq(Tuple1(1L)).toDF("other"), exactDistinct = true)
    val input = MemoryStream[Doc]
    val windowed = DriftStream.windowProfile(
      input.toDF(), "ts", "0 minutes", "10 minutes", Seq("score"))
    val query = DriftStream.drift(windowed, reference)
      .writeStream.format("memory").queryName("drift_unknown")
      .outputMode("append").start()
    try {
      input.addData(Doc(ts(1), 5L, "en"))
      query.processAllAvailable()
      input.addData(Doc(ts(11), 5L, "en")) // closes [0,10)
      query.processAllAvailable()
      val rows: Array[Row] = spark.table("drift_unknown").collect()
      rows.length shouldBe 1
      rows.head.getAs[Boolean]("drift") shouldBe true
    } finally query.stop()
  }

  "DriftSink.quarantine" should "persist exactly the flagged rows, partitioned by batch id" in {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("qsink")
    val out = s"$tmp/quarantine"
    val blessed = Seq((10L, "en"), (50L, "fr"), (30L, "en"))
      .toDF("score", "lang")
    val reference = Profiler.profile(blessed, exactDistinct = true)
    val input = MemoryStream[Doc]
    val flagged = DriftStream.drift(
      DriftStream.windowProfile(input.toDF(), "ts", "0 minutes",
        "10 minutes", Seq("score")), reference)
    val query = DriftSink.quarantine(flagged, out)
      .option("checkpointLocation", s"$tmp/chk")
      .start()
    try {
      input.addData(Doc(ts(1), 15L, "en")) // healthy window [0,10)
      query.processAllAvailable()
      input.addData(Doc(ts(11), 999L, "en")) // closes [0,10); [10,20) drifts
      query.processAllAvailable()
      input.addData(Doc(ts(21), 20L, "en")) // closes [10,20)
      query.processAllAvailable()
    } finally query.stop()
    val persisted = spark.read.parquet(out)
    persisted.columns should contain("batch_id") // partition column survives
    val rows = persisted.select("column", "min", "drift").collect()
    rows.foreach(_.getAs[Boolean]("drift") shouldBe true) // ONLY flagged rows
    rows.map(_.getAs[String]("min")).toSeq shouldBe Seq("999") // the bad window
  }

  "windowQuantiles + quantileDrift" should "pass in-band medians and flag shifts and all-null windows" in {
    implicit val sqlCtx = spark.sqlContext
    // blessed: 10,20,30,40,50 → p25=20 p50=30 p75=40; bandTol 0.25 × IQR 20
    // widens the acceptance band to [15, 45]
    val blessed = Seq(10L, 20L, 30L, 40L, 50L).toDF("score")
    val reference = Profiler.quantiles(blessed, Seq("score"))

    val input = MemoryStream[Doc]
    val windowed = DriftStream.windowQuantiles(
      input.toDF(), "ts", watermark = "0 minutes", windowLen = "10 minutes",
      cols = Seq("score"))
    val query = DriftStream.quantileDrift(windowed, reference)
      .writeStream.format("memory").queryName("qdrift_stream")
      .outputMode("append").start()
    try {
      // [0,10): healthy — median 30, inside [15, 45]
      input.addData(Doc(ts(1), 25L, "en"), Doc(ts(2), 30L, "en"),
        Doc(ts(3), 35L, "en"))
      query.processAllAvailable()
      // [10,20): shifted — median 90 > 45, even though each value alone
      // would pass a min/max-style bound check against a wider blessed set
      input.addData(Doc(ts(11), 80L, "en"), Doc(ts(12), 90L, "en"),
        Doc(ts(13), 100L, "en"))
      query.processAllAvailable()
      // [20,30): all-null scores — unadjudicable, must flag
      input.addData(Doc(ts(21), null, "en"), Doc(ts(22), null, "en"))
      query.processAllAvailable()
      input.addData(Doc(ts(31), 30L, "en")) // closes [20,30)
      query.processAllAvailable()

      val out = spark.table("qdrift_stream").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 60000L -> r)
        .toMap
      out(0L).getAs[Boolean]("drift") shouldBe false
      out(0L).getAs[Double]("window_mid") shouldBe 30.0
      out(0L).getAs[Double]("ref_lo") shouldBe 20.0
      out(0L).getAs[Double]("ref_hi") shouldBe 40.0
      out(10L).getAs[Boolean]("drift") shouldBe true
      out(10L).getAs[Double]("window_mid") shouldBe 90.0
      val allNull = out(20L)
      allNull.getAs[Boolean]("drift") shouldBe true
      allNull.isNullAt(allNull.fieldIndex("window_mid")) shouldBe true
    } finally query.stop()
  }

  "windowCategories + categoryDrift" should "pass a matching mix and flag a flipped one" in {
    implicit val sqlCtx = spark.sqlContext
    // blessed mix: en 2/3, fr 1/3 (values stay inside {en, fr} throughout —
    // no extremum, null, or distinct rule can see a mix flip)
    val reference = Profiler.categories(
      Seq("en", "en", "fr").toDF("lang"), Seq("lang"))

    val input = MemoryStream[Doc]
    val closed = DriftStream.windowCategories(
      input.toDF(), "ts", watermark = "0 minutes", windowLen = "10 minutes",
      cols = Seq("lang"))
    // the TV sum is an aggregation, so on a live stream it runs per
    // closed-window batch in foreachBatch (the CorpusPrepStream wiring)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Boolean)]
    val query = closed.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = DriftStream.categoryDrift(batch, reference).collect()
        out.synchronized {
          out ++= rows.map(r => (
            r.getAs[Timestamp]("window_start").getTime / 60000L,
            r.getAs[Double]("tv"), r.getAs[Boolean]("drift")))
        }
        ()
      }.start()
    try {
      // [0,10): the blessed mix exactly — TV 0
      input.addData(Doc(ts(1), 1L, "en"), Doc(ts(2), 2L, "en"),
        Doc(ts(3), 3L, "fr"))
      query.processAllAvailable()
      // [10,20): flipped — en 1/3, fr 2/3; TV = ½(1/3 + 1/3) = 1/3 > 0.1
      input.addData(Doc(ts(11), 1L, "en"), Doc(ts(12), 2L, "fr"),
        Doc(ts(13), 3L, "fr"))
      query.processAllAvailable()
      input.addData(Doc(ts(21), 1L, "en")) // closes [10,20)
      query.processAllAvailable()
    } finally query.stop()
    val byWin = out.toSeq.map { case (w, tv, d) => w -> ((tv, d)) }.toMap
    byWin(0L) shouldBe ((0.0, false))
    byWin(10L) shouldBe ((0.333333, true))
  }

  it should "flag a column absent from the reference at TV = 1" in {
    val reference = Profiler.categories(
      Seq("en").toDF("lang"), Seq("lang"))
    // whole-batch form: null window bounds group as one window
    val cats = Seq(("source", "a", 3L), ("source", "b", 1L)).toDF(
        "column", "value", "n")
      .select(org.apache.spark.sql.functions.lit(null).cast("timestamp")
          .as("window_start"),
        org.apache.spark.sql.functions.lit(null).cast("timestamp")
          .as("window_end"),
        org.apache.spark.sql.functions.col("column"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("n"))
    val rows = DriftStream.categoryDrift(cats, reference).collect()
    rows.length shouldBe 1
    rows.head.getAs[Double]("tv") shouldBe 1.0
    rows.head.getAs[Boolean]("drift") shouldBe true
    rows.head.getAs[Long]("n_rows") shouldBe 4L
    rows.head.getAs[Long]("n_values") shouldBe 2L
  }

  it should "charge unseen reference mass: a window missing a blessed value drifts by its share" in {
    val reference = Profiler.categories(
      Seq("a", "a", "b", "b").toDF("source"), Seq("source"))
    // window carries ONLY a: p = {a: 1}; q = {a: ½, b: ½}
    // TV = ½(|1 − ½| + ½) = ½ — the vanished value's full blessed share
    val cats = Profiler.categories(Seq("a", "a").toDF("source"), Seq("source"))
      .select(org.apache.spark.sql.functions.lit(null).cast("timestamp")
          .as("window_start"),
        org.apache.spark.sql.functions.lit(null).cast("timestamp")
          .as("window_end"),
        org.apache.spark.sql.functions.col("column"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("n"))
    val rows = DriftStream.categoryDrift(cats, reference).collect()
    rows.length shouldBe 1
    rows.head.getAs[Double]("tv") shouldBe 0.5
    rows.head.getAs[Boolean]("drift") shouldBe true
  }
}
