package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Verifies the config-driven extension path: a session built with
  * spark.sql.extensions=graft.GraftExtensions resolves vec_* in plain SQL.
  */
class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  "GraftExtensions" should "inject vec_dot/vec_cosine via spark.sql.extensions" in {
    // getOrCreate() reuses any active session (ignoring new extensions);
    // clear them so this builder instantiates a fresh session over the
    // shared context with the extensions applied.
    val previous = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions is the programmatic equivalent of
    // spark.sql.extensions=graft.GraftExtensions (the static conf can't be
    // applied when the test JVM's SparkContext already exists)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
        "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
          "vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").collect().head
      row.getDouble(0) shouldBe 11.0 +- 1e-9
      row.getDouble(1) shouldBe 1.0 +- 1e-12
      val sig = spark.sql(
        "SELECT minhash_signature(array('a b c'), 8) AS s").collect().head
      sig.getSeq[Long](0).length shouldBe 8
      an[Exception] should be thrownBy
        spark.sql("SELECT minhash_signature(array('x'))").collect()
      val sh = spark.sql(
        "SELECT shingle_windows(array('a','b','c','d'), 3) AS s").collect().head
      sh.getSeq[String](0) shouldBe Seq("a b c", "b c d")
      an[Exception] should be thrownBy
        spark.sql("SELECT shingle_windows(array('x'))").collect()
      val sw = spark.sql(
        "SELECT strided_windows(array('a','b','c','d','e'), 3, 2) AS s")
        .collect().head
      sw.getSeq[String](0) shouldBe Seq("a b c", "c d e")
      an[Exception] should be thrownBy
        spark.sql("SELECT strided_windows(array('x'), 3)").collect()
      val qf = spark.sql(
        "SELECT quality_fail('the cat sat on a mat') AS keepable, " +
          "quality_fail('aa bb') AS short").collect().head
      qf.isNullAt(0) shouldBe true
      qf.getString(1) shouldBe "too_few_tokens"
      an[Exception] should be thrownBy
        spark.sql("SELECT quality_fail('x', 'y')").collect()
      // lz_ratio: the normative portable-LZ quality signal (round 11)
      val lz = spark.sql("SELECT lz_ratio('z') AS one, " +
        "lz_ratio(repeat('abcd', 100)) AS rep").collect().head
      lz.getDouble(0) shouldBe (9.0 / 8.0) +- 1e-12 // single literal
      lz.getDouble(1) should be < 0.2 // periodic text compresses hard
      an[Exception] should be thrownBy
        spark.sql("SELECT lz_ratio(1)").collect()
      val mg = spark.sql(
        "SELECT misra_gries(t, 8) AS hh FROM VALUES ('a'),('b'),('a') AS v(t)")
        .collect().head
      mg.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1))) shouldBe Seq("a" -> 2L, "b" -> 1L)
      an[Exception] should be thrownBy
        spark.sql("SELECT misra_gries('x')").collect()
      val tk = spark.sql(
        "SELECT top_k_by(v, id, 2) AS t FROM VALUES (1L, 10L), (3L, 11L), " +
          "(2L, 12L) AS x(v, id)").collect().head
      tk.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq(3L -> 11L, 2L -> 12L)
      an[Exception] should be thrownBy
        spark.sql("SELECT top_k_by(1L, 2L)").collect()
      val mq = spark.sql(
        "SELECT mrl_quantiles(v, 64, array(0.5D, 1.0D)) AS q FROM VALUES " +
          "(1.0D), (2.0D), (3.0D) AS x(v)").collect().head
      mq.getSeq[Double](0) shouldBe Seq(2.0, 3.0)
      // bare numeric literals type as array<decimal> — must convert, not
      // ClassCastException (round-11 fix)
      val mqDec = spark.sql(
        "SELECT mrl_quantiles(v, 64, array(0.5, 1.0)) AS q FROM VALUES " +
          "(1.0D), (2.0D), (3.0D) AS x(v)").collect().head
      mqDec.getSeq[Double](0) shouldBe Seq(2.0, 3.0)
      an[Exception] should be thrownBy
        spark.sql("SELECT mrl_quantiles(1.0D, 64)").collect()
    } finally {
      // don't stop() (shared SparkContext); restore the prior session for
      // the other suites
      previous.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
