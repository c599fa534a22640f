package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions

/** SparkSessionExtensions entry point: enables the engine's custom SQL
  * functions cluster-wide via configuration —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — so `SELECT vec_cosine(a.embedding, b.embedding)` works in plain SQL on
  * any session of the cluster, with no per-session registration call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExpressions.VectorDot].getName, "vec_dot"),
      VectorExpressions.binaryBuilder("vec_dot", VectorExpressions.VectorDot)))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.VectorCosine].getName, "vec_cosine"),
      VectorExpressions.binaryBuilder("vec_cosine", VectorExpressions.VectorCosine)))
    // minhash_signature(shingles, k): k must be a foldable integer literal
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(
        classOf[graft.functions.MinhashExpressions.MinhashSignature].getName,
        "minhash_signature"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          s"minhash_signature requires exactly 2 arguments, got ${children.size}")
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"minhash_signature numHashes must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_signature numHashes must be a literal")
        }
        graft.functions.MinhashExpressions.MinhashSignature(children(0), k)
      }))
    // shingle_windows(tokens, n): n must be a foldable integer literal
    ext.injectFunction((FunctionIdentifier("shingle_windows"),
      new ExpressionInfo(
        classOf[graft.functions.ShingleExpressions.ShingleWindows].getName,
        "shingle_windows"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          s"shingle_windows requires exactly 2 arguments, got ${children.size}")
        val n = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"shingle_windows width must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "shingle_windows width must be a literal")
        }
        graft.functions.ShingleExpressions.ShingleWindows(children(0), n)
      }))
    // strided_windows(tokens, width, stride): both foldable integer literals
    ext.injectFunction((FunctionIdentifier("strided_windows"),
      new ExpressionInfo(
        classOf[graft.functions.ShingleExpressions.StridedWindows].getName,
        "strided_windows"),
      { children: Seq[Expression] =>
        require(children.size == 3,
          s"strided_windows requires exactly 3 arguments, got ${children.size}")
        def intLit(e: Expression, what: String): Int = e match {
          case x if x.foldable => x.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"strided_windows $what must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"strided_windows $what must be a literal")
        }
        graft.functions.ShingleExpressions.StridedWindows(
          children(0), intLit(children(1), "width"), intLit(children(2), "stride"))
      }))
    // quality_fail(text): the default Gopher-style rule bundle (the Scala
    // API takes custom rules; SQL exposes the standard filter so
    // `WHERE quality_fail(text) IS NULL` is the keep predicate)
    ext.injectFunction((FunctionIdentifier("quality_fail"),
      new ExpressionInfo(
        classOf[graft.functions.QualityExpressions.QualityFail].getName,
        "quality_fail"),
      { children: Seq[Expression] =>
        require(children.size == 1,
          s"quality_fail requires exactly 1 argument, got ${children.size}")
        val r = graft.ops.TextStats.QualityRules()
        graft.functions.QualityExpressions.QualityFail(children(0),
          r.minTokens, r.maxTokens, r.minMeanTokenLen, r.maxMeanTokenLen,
          r.maxPunctRatio, r.minStopwordRatio,
          "\\b(" + graft.ops.TextStats.defaultStopwords.mkString("|") + ")\\b")
      }))
    // nfc_normalize(text): Unicode canonical composition (pre-dedup
    // canonicalization; name matches DuckDB's)
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.UnicodeExpressions.NfcNormalize].getName,
        "nfc_normalize"),
      { children: Seq[Expression] =>
        require(children.size == 1,
          s"nfc_normalize requires exactly 1 argument, got ${children.size}")
        graft.functions.UnicodeExpressions.NfcNormalize(children(0))
      }))
    // compress_ratio(text): deflate-based repetition/noise quality signal
    ext.injectFunction((FunctionIdentifier("compress_ratio"),
      new ExpressionInfo(
        classOf[graft.functions.CompressExpression.CompressRatio].getName,
        "compress_ratio"),
      { children: Seq[Expression] =>
        require(children.size == 1,
          s"compress_ratio requires exactly 1 argument, got ${children.size}")
        graft.functions.CompressExpression.CompressRatio(children(0))
      }))
    // lz_ratio(text): the NORMATIVE portable-LZ companion signal
    // (round 11) — same shape, library-version-independent definition
    ext.injectFunction((FunctionIdentifier("lz_ratio"),
      new ExpressionInfo(
        classOf[graft.functions.LzExpressions.LzRatio].getName,
        "lz_ratio"),
      { children: Seq[Expression] =>
        require(children.size == 1,
          s"lz_ratio requires exactly 1 argument, got ${children.size}")
        graft.functions.LzExpressions.LzRatio(children(0))
      }))
    // misra_gries(col, capacity): bounded-state heavy-hitters aggregate;
    // capacity must be a foldable integer literal
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      new ExpressionInfo(
        classOf[graft.functions.SketchExpressions.MisraGries].getName,
        "misra_gries"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          s"misra_gries requires exactly 2 arguments, got ${children.size}")
        val cap = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"misra_gries capacity must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "misra_gries capacity must be a literal")
        }
        graft.functions.SketchExpressions.MisraGries(children(0), cap)
          .toAggregateExpression()
      }))
    // top_k_by(ord, payload, k): bounded-heap per-group top-k aggregate;
    // k must be a foldable integer literal
    ext.injectFunction((FunctionIdentifier("top_k_by"),
      new ExpressionInfo(
        classOf[graft.functions.TopKExpressions.TopKBy].getName, "top_k_by"),
      { children: Seq[Expression] =>
        require(children.size == 3,
          s"top_k_by requires exactly 3 arguments, got ${children.size}")
        val k = children(2) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"top_k_by k must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "top_k_by k must be a literal")
        }
        graft.functions.TopKExpressions.TopKBy(children(0), children(1), k)
          .toAggregateExpression()
      }))
    // mrl_quantiles(col, capacity, array(probs...)): deterministic
    // compactor quantile sketch; capacity and probs must be foldable
    ext.injectFunction((FunctionIdentifier("mrl_quantiles"),
      new ExpressionInfo(
        classOf[graft.functions.QuantileSketchExpression.MrlQuantiles].getName,
        "mrl_quantiles"),
      { children: Seq[Expression] =>
        require(children.size == 3,
          s"mrl_quantiles requires exactly 3 arguments, got ${children.size}")
        val cap = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"mrl_quantiles capacity must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "mrl_quantiles capacity must be a literal")
        }
        val probs = children(2) match {
          case e if e.foldable => e.eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              // A bare SQL literal like array(0.25, 0.5) types as
              // array<decimal>, so convert per-element instead of
              // assuming the physical layout is already doubles.
              val elemType = e.dataType match {
                case org.apache.spark.sql.types.ArrayType(et, _) => et
                case other => throw new IllegalArgumentException(
                  s"mrl_quantiles probs must be an array literal, got $other")
              }
              (0 until a.numElements()).map { i =>
                a.get(i, elemType) match {
                  case null => throw new IllegalArgumentException(
                    "mrl_quantiles probs must not contain nulls")
                  case d: java.lang.Double => d.doubleValue()
                  case f: java.lang.Float => f.doubleValue()
                  case dec: org.apache.spark.sql.types.Decimal =>
                    dec.toDouble
                  case i0: java.lang.Integer => i0.doubleValue()
                  case l: java.lang.Long => l.doubleValue()
                  case other => throw new IllegalArgumentException(
                    s"mrl_quantiles probs must be numeric, got $other")
                }
              }
            case other => throw new IllegalArgumentException(
              s"mrl_quantiles probs must be a double-array literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "mrl_quantiles probs must be a literal array")
        }
        graft.functions.QuantileSketchExpression.MrlQuantiles(
          children(0), cap, probs).toAggregateExpression()
      }))
  }
}
