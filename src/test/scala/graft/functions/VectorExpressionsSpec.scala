package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")

  "vec_dot" should "compute the dot product over float arrays" in {
    val out = pairs.select(VectorExpressions.vec_dot($"a", $"b")).as[Double].collect()
    out(0) shouldBe 32.0 +- 1e-9
    out(1) shouldBe 0.0 +- 1e-9
  }

  it should "accept mixed float/double arrays (hyperplane literals)" in {
    val out = pairs.select(VectorExpressions.vec_dot($"a",
      array(lit(1.0), lit(1.0), lit(1.0)))).as[Double].collect()
    out(0) shouldBe 6.0 +- 1e-9
  }

  it should "match the interpreted eval path (codegen parity)" in {
    // force interpreted evaluation through a deterministic fallback: collect
    // via an RDD map over the expression-free plan and compare
    val codegen = pairs.select(VectorExpressions.vec_dot($"a", $"b")).as[Double].collect()
    val rows = pairs.as[(Seq[Float], Seq[Float])].collect()
    val manual = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    }
    codegen.zip(manual).foreach { case (c, m) => c shouldBe m +- 1e-12 }
  }

  "vec_cosine" should "compute cosine with zero-norm guard" in {
    val out = pairs.select(VectorExpressions.vec_cosine($"a", $"b")).as[Double].collect()
    out(0) shouldBe 32.0 / (math.sqrt(14.0) * math.sqrt(77.0)) +- 1e-12
    out(1) shouldBe 0.0 +- 1e-12
    out(2) shouldBe 0.0 +- 1e-12 // zero norm → 0, not NaN
  }

  it should "yield null for a null array" in {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    df.select(VectorExpressions.vec_cosine($"a", $"b")).collect().head.isNullAt(0) shouldBe true
  }

  "register" should "expose vec_dot/vec_cosine to SQL" in {
    VectorExpressions.register(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM vecs").collect().head
    out.getDouble(0) shouldBe 11.0 +- 1e-9
    out.getDouble(1) shouldBe 1.0 +- 1e-12
  }

  it should "agree with the HOF aggregate formulation" in {
    val hof = pairs.select(
      aggregate(zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val native = pairs.select(VectorExpressions.vec_dot($"a", $"b")).as[Double].collect()
    hof.zip(native).foreach { case (h, n) => h shouldBe n +- 1e-12 }
  }

  // ---------------------------------------------------------- vec_rotate

  /** Independent formulation: explicit Hadamard matrix (Kronecker power,
    * the natural ordering the iterative butterfly produces) times the
    * sign-flipped input, scaled by 1/√n — NOT the expression's in-place
    * algorithm, so agreement checks the implementation, not itself.
    */
  private def rotateByMatrix(x: Array[Double]): Array[Double] = {
    val n = x.length
    var hMat = Array(Array(1.0))
    while (hMat.length < n)
      hMat = (hMat.map(r => r ++ r) ++ hMat.map(r => r ++ r.map(-_)))
    val d = Array.tabulate(n)(i =>
      if ((i.toLong * 2654435761L >> 7 & 1L) == 1L) x(i) else -x(i))
    Array.tabulate(n)(r => hMat(r).zip(d).map { case (h, v) => h * v }.sum / math.sqrt(n.toDouble))
  }

  "vec_rotate" should "match the explicit Hadamard-matrix formulation" in {
    val xs = Seq(
      Array.tabulate(64)(i => math.sin(i * 0.7) * (i % 5 + 1)),
      Array.tabulate(64)(i => if (i < 2) i * 3.0 - 1 else 0.02 * i))
    val df = xs.map(_.toSeq.map(_.toFloat)).toDF("v")
    val out = df.select(VectorExpressions.vec_rotate($"v")).as[Seq[Double]].collect()
    xs.zip(out).foreach { case (x, got) =>
      val exp = rotateByMatrix(x.map(_.toFloat.toDouble))
      got.zip(exp).foreach { case (g, e) => g shouldBe e +- 1e-9 }
    }
  }

  it should "preserve dot products and norms (orthogonality)" in {
    val a = Array.tabulate(64)(i => math.cos(i * 1.3) + 0.1 * i)
    val b = Array.tabulate(64)(i => math.sin(i * 0.31) - 0.05 * i)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val row = df.select(
      VectorExpressions.vec_dot(
        VectorExpressions.vec_rotate($"a"), VectorExpressions.vec_rotate($"b")),
      VectorExpressions.vec_dot($"a", $"b"),
      VectorExpressions.vec_dot(
        VectorExpressions.vec_rotate($"a"), VectorExpressions.vec_rotate($"a")),
      VectorExpressions.vec_dot($"a", $"a")).collect().head
    row.getDouble(0) shouldBe row.getDouble(1) +- 1e-9
    row.getDouble(2) shouldBe row.getDouble(3) +- 1e-9
  }

  it should "yield null for a null vector and treat null elements as 0" in {
    val withNull = Seq(Option.empty[Seq[Float]]).toDF("v")
    withNull.select(VectorExpressions.vec_rotate($"v"))
      .collect().head.isNullAt(0) shouldBe true
    // a null ELEMENT contributes 0, like vec_dot's null-skip
    val elemNull = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 2.0D, 3.0D) AS v")
    val got = elemNull.select(VectorExpressions.vec_rotate($"v"))
      .as[Seq[Double]].collect().head
    val exp = rotateByMatrix(Array(1.0, 0.0, 2.0, 3.0))
    got.zip(exp).foreach { case (g, e) => g shouldBe e +- 1e-12 }
  }

  it should "reject non-power-of-two lengths loudly" in {
    val df = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    val ex = intercept[Exception] {
      df.select(VectorExpressions.vec_rotate($"v")).collect()
    }
    ex.getMessage should include("power-of-two")
  }
}
