package graft

import graft.functions.{CosineSimilarityExpr, QuantizedDotExpr, RollingHashExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production packaging of the engine's native Catalyst expressions as a
  * `SparkSessionExtensions` entry point:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes `rolling_hash`, `cosine_sim`, `quantized_dot` and `weighted_dot`
  * available to PLAIN SQL in every session of the application — including
  * thrift/SQL-only clients that never touch the Scala API — the standard
  * extension-library pattern (Delta/Iceberg register their functions and
  * rules the same way). The expressions themselves are the codegen'd
  * implementations; injection adds resolution only, no new evaluation
  * path. (The per-session `QuantizedDot.register` temp-function helper
  * remains for sessions built without the config.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", classOf[RollingHashExpr]),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSimilarityExpr]),
      (exprs: Seq[Expression]) => CosineSimilarityExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("quantized_dot"),
      info("quantized_dot", classOf[QuantizedDotExpr]),
      (exprs: Seq[Expression]) =>
        QuantizedDotExpr(exprs(0), exprs(1), 1000, 1000)))
    ext.injectFunction((FunctionIdentifier("weighted_dot"),
      info("weighted_dot", classOf[QuantizedDotExpr]),
      (exprs: Seq[Expression]) =>
        QuantizedDotExpr(exprs(0), exprs(1), 1000, 1)))
  }
}
