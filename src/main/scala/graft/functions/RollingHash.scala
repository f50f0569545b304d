package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * expression WITH codegen — the preferred extension tier (custom
  * `Expression` with `doGenCode` beats a Scala UDF: it stays inside
  * whole-stage codegen, no boxing, no closure serialization).
  *
  * hash(s) = Σ s[i] · B^(n-1-i)  mod 2^64 (wrapping), B = 1000003.
  * Deterministic, locale-free, byte-oriented (UTF-8), streaming-friendly —
  * the classic Rabin-Karp fingerprint used for document identity and
  * shift-composable shingle fingerprints in dedup pipelines.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHashExpr {
  final val B: Long = 1000003L

  /** Called from both interpreted eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

object RollingHash {
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(RollingHashExpr(GraftSqlBridge.expression(c)))

  /** SQL registration: `SELECT rolling_hash(text) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHashExpr(exprs.head), "scala_udf")
}
