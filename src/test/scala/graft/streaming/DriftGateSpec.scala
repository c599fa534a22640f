package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Profiler
import graft.pipelines.CorpusPrepStream

/** The fused single-pass gate ([[DriftGate]]) must agree verdict-for-verdict
  * with the per-rule DataFrame functions it replaces on the healthy path —
  * including every unadjudicable-column convention (batch-missing,
  * reference-missing, all-null) and the numeric-vs-string extrema
  * comparison. Parity is asserted by running BOTH paths on the same
  * batches, so a semantics change in either side fails here before it
  * silently changes quarantine decisions.
  */
class DriftGateSpec extends SparkSpec {
  import spark.implicits._

  private def refsFor(profile: Option[DataFrame] = None,
                      profileCols: Seq[String] = Nil,
                      quantile: Option[DataFrame] = None,
                      quantileCols: Seq[String] = Nil,
                      category: Option[DataFrame] = None,
                      categoryCols: Seq[String] = Nil,
                      nullFracTol: Double = 0.01, distinctTol: Double = 1.05,
                      bandTol: Double = 0.25, tvTol: Double = 0.1) =
    DriftGate.collect(profile, profileCols, nullFracTol, distinctTol,
      quantile, quantileCols, bandTol, category, categoryCols, tvTol)

  /** (rule, column) -> drift from the three per-rule DataFrame functions. */
  private def unfused(batch: DataFrame, refs: DriftGate.Refs,
                      profile: Option[DataFrame],
                      quantile: Option[DataFrame],
                      category: Option[DataFrame]): Map[(String, String), Boolean] = {
    def vs(rule: String, df: DataFrame) = df
      .select(col("column"), coalesce(col("drift"), lit(false)).as("drift"))
      .as[(String, Boolean)].collect()
      .map { case (c, d) => (rule, c) -> d }
    (profile.toSeq.flatMap(ref => vs("profile",
      CorpusPrepStream.batchDrift(batch, ref,
        refs.profile.get.cols, refs.profile.get.nullFracTol,
        refs.profile.get.distinctTol))) ++
      quantile.toSeq.flatMap(ref => vs("quantile",
        CorpusPrepStream.batchQuantileDrift(batch, ref,
          refs.quantile.get.cols, refs.quantile.get.bandTol))) ++
      category.toSeq.flatMap(ref => vs("category",
        CorpusPrepStream.batchCategoryDrift(batch, ref,
          refs.category.get.cols, refs.category.get.tvTol)))).toMap
  }

  private def assertParity(batch: DataFrame, refs: DriftGate.Refs,
                           profile: Option[DataFrame] = None,
                           quantile: Option[DataFrame] = None,
                           category: Option[DataFrame] = None): Unit = {
    val fused = DriftGate.check(batch, refs).verdicts
      .map(v => (v.rule, v.column) -> v.drift).toMap
    fused shouldBe unfused(batch, refs, profile, quantile, category)
  }

  behavior of "DriftGate"

  it should "agree with the per-rule functions on a healthy batch (all three rules)" in {
    val blessed = Seq((1L, "a", 10.0), (2L, "a", 12.0), (3L, "b", 14.0))
      .toDF("id", "source", "len")
    val pRef = Profiler.profile(blessed.select("source"))
    val qRef = Profiler.quantiles(blessed, Seq("len"))
    val cRef = Profiler.categories(blessed, Seq("source"))
    val refs = refsFor(profile = Some(pRef), quantileCols = Seq("len"),
      quantile = Some(qRef), category = Some(cRef))
    val healthy = Seq((4L, "a", 11.0), (5L, "a", 12.0), (6L, "b", 13.0))
      .toDF("id", "source", "len")
    val res = DriftGate.check(healthy, refs)
    res.poisoned shouldBe false
    res.nRows shouldBe 3L
    assertParity(healthy, refs, Some(pRef), Some(qRef), Some(cRef))
  }

  it should "agree on poisoned batches: null injection, median collapse, mix flip" in {
    val blessed = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "b" else "a", 10.0 + (i % 5)))
      .toDF("id", "source", "len")
    val pRef = Profiler.profile(blessed.select("source"))
    val qRef = Profiler.quantiles(blessed, Seq("len"))
    val cRef = Profiler.categories(blessed, Seq("source"))
    val refs = refsFor(profile = Some(pRef), quantile = Some(qRef),
      quantileCols = Seq("len"), category = Some(cRef), tvTol = 0.2)
    val cases = Seq(
      // null_frac escape (profile rule)
      Seq((31L, null.asInstanceOf[String], 12.0), (32L, "a", 13.0)),
      // median collapse inside the blessed [min,max] (quantile rule)
      Seq((31L, "a", 10.0), (32L, "a", 10.0), (33L, "b", 10.0)),
      // value-mix flip inside fixed bounds (category rule)
      Seq((31L, "b", 12.0), (32L, "b", 13.0), (33L, "a", 11.0)))
    cases.foreach { rows =>
      val batch = rows.toDF("id", "source", "len")
      DriftGate.check(batch, refs).poisoned shouldBe true
      assertParity(batch, refs, Some(pRef), Some(qRef), Some(cRef))
    }
  }

  it should "flag batch-missing, reference-missing, and all-null columns like the unfused path" in {
    val blessed = Seq((1L, "a", 5.0)).toDF("id", "source", "len")
    val pRef = Profiler.profile(blessed.select("source"))
    val qRef = Profiler.quantiles(blessed, Seq("len"))
    val cRef = Profiler.categories(blessed, Seq("source"))
    // monitored columns the references don't know: extra -> ref-missing
    val refs = refsFor(profile = Some(pRef),
      profileCols = Seq("source", "extra"),
      quantile = Some(qRef), quantileCols = Seq("len", "extra"),
      category = Some(cRef), categoryCols = Seq("source", "extra"))
    // batch lacks `extra` entirely AND carries all-null source
    val batch = Seq((1L, null.asInstanceOf[String], 6.0))
      .toDF("id", "source", "len")
    val res = DriftGate.check(batch, refs)
    res.flagged.map(v => (v.rule, v.column)).toSet should contain allOf (
      ("profile", "extra"), ("quantile", "extra"), ("category", "extra"),
      ("category", "source"))
    assertParity(batch, refs, Some(pRef), Some(qRef), Some(cRef))
    // batch that CARRIES extra: ref-missing still flags, on both paths
    val batch2 = Seq((1L, "a", 5.0, 1.0)).toDF("id", "source", "len", "extra")
    DriftGate.check(batch2, refs).flagged
      .map(v => (v.rule, v.column)).toSet should contain allOf (
      ("profile", "extra"), ("quantile", "extra"), ("category", "extra"))
    assertParity(batch2, refs, Some(pRef), Some(qRef), Some(cRef))
  }

  it should "compare numeric extrema numerically and string extrema lexically (profile rule)" in {
    // numeric: "9" < "10" lexically but NOT numerically — a batch max of 9
    // against a blessed max of 10 must not flag
    val numBlessed = Seq((1L, 2L), (2L, 10L)).toDF("id", "v")
    val pRefNum = Profiler.profile(numBlessed.select("v"))
    val refsNum = refsFor(profile = Some(pRefNum))
    val inBounds = Seq((3L, 9L), (4L, 2L)).toDF("id", "v")
    DriftGate.check(inBounds, refsNum).poisoned shouldBe false
    assertParity(inBounds, refsNum, Some(pRefNum))
    val outOfBounds = Seq((3L, 11L), (4L, 2L)).toDF("id", "v")
    DriftGate.check(outOfBounds, refsNum).poisoned shouldBe true
    assertParity(outOfBounds, refsNum, Some(pRefNum))
    // string: lexical order governs non-numeric extrema
    val strBlessed = Seq((1L, "b"), (2L, "m")).toDF("id", "v")
    val pRefStr = Profiler.profile(strBlessed.select("v"))
    val refsStr = refsFor(profile = Some(pRefStr))
    val strOut = Seq((3L, "z")).toDF("id", "v")
    DriftGate.check(strOut, refsStr).poisoned shouldBe true
    assertParity(strOut, refsStr, Some(pRefStr))
  }

  it should "agree on empty batches and compute exact TV from per-value counts" in {
    val blessed = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "source", "len")
    val pRef = Profiler.profile(blessed.select("source"))
    val qRef = Profiler.quantiles(blessed, Seq("len"))
    val cRef = Profiler.categories(blessed, Seq("source"))
    val refs = refsFor(profile = Some(pRef), quantile = Some(qRef),
      quantileCols = Seq("len"), category = Some(cRef), tvTol = 0.6)
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "source", "len")
    assertParity(empty, refs, Some(pRef), Some(qRef), Some(cRef))
    // a batch carrying a value OUTSIDE the reference set: the window-only
    // mass must enter the TV sum exactly (here TV = 0.5 <= 0.6 -> healthy
    // on the category rule, matching the unfused union-of-values algebra)
    val novelValue = Seq((3L, "a", 1.0), (4L, "c", 2.0))
      .toDF("id", "source", "len")
    assertParity(novelValue, refs, Some(pRef), Some(qRef), Some(cRef))
  }
}
