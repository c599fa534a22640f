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
  }
}
