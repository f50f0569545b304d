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

  /** Arity gate: a SQL client calling with the wrong argument count must
    * get a clean "expects N arguments" failure during resolution, not a
    * raw IndexOutOfBoundsException from the builder. */
  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Unit =
    require(exprs.length == n,
      s"$name expects exactly $n argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", classOf[RollingHashExpr]),
      (exprs: Seq[Expression]) => {
        arity("rolling_hash", 1)(exprs); RollingHashExpr(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSimilarityExpr]),
      (exprs: Seq[Expression]) => {
        arity("cosine_sim", 2)(exprs); CosineSimilarityExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((FunctionIdentifier("quantized_dot"),
      info("quantized_dot", classOf[QuantizedDotExpr]),
      (exprs: Seq[Expression]) => {
        arity("quantized_dot", 2)(exprs)
        QuantizedDotExpr(exprs(0), exprs(1), 1000, 1000)
      }))
    ext.injectFunction((FunctionIdentifier("weighted_dot"),
      info("weighted_dot", classOf[QuantizedDotExpr]),
      (exprs: Seq[Expression]) => {
        arity("weighted_dot", 2)(exprs)
        QuantizedDotExpr(exprs(0), exprs(1), 1000, 1)
      }))
  }
}
