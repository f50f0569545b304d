package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native quantized integer dot product with whole-stage codegen:
  *
  *   Σ_i floor(x_i·scaleL) · floor(y_i·scaleR)   as BIGINT
  *
  * — the bit-portable arithmetic behind the engine's oracle-verified
  * similarity family (simsearch_qdot/cosine/lsh, dedup_embedding_cosine).
  * The composable form — `aggregate(zip_with(quantize(a), quantize(b),
  * _*_), 0L, _+_)` — is correct but interpreted: Catalyst higher-order
  * functions evaluate their lambdas without codegen and allocate a zipped
  * intermediate array per row. This expression is one fused allocation-free
  * loop over the raw `ArrayData`, generated into the stage's Java.
  *
  * `scale = 1` passes a side through floor() only — used for integer-valued
  * literal weight arrays (hyperplane weights), which are exact in double,
  * so floor is the identity on them.
  */
case class QuantizedDotExpr(left: Expression, right: Expression,
                            scaleL: Int, scaleR: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects array<float|double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    QuantizedDotExpr.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), scaleL, scaleR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QuantizedDotExpr.compute(" +
        s"$a, $b, ${isFloat(left)}, ${isFloat(right)}, $scaleL, $scaleR);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_dot"
}

object QuantizedDotExpr {
  /** Shared by interpreted eval and generated code: one fused pass.
    * floor-then-widen per element, BIGINT accumulate — associative and
    * exact, so the result is independent of evaluation order and engine. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
              scaleL: Int, scaleR: Int): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"quantized_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += math.floor(x * scaleL).toLong * math.floor(y * scaleR).toLong
      i += 1
    }
    acc
  }
}

object QuantizedDot {
  /** ×1000-quantized dot of two embedding columns (the simsearch_qdot
    * convention). */
  def quantized_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(QuantizedDotExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), 1000, 1000))

  /** ×1000-quantized embedding against an integer-valued weight array
    * (scale 1 — floor is identity on exact integer doubles). */
  def weighted_dot(emb: Column, weights: Column): Column =
    GraftSqlBridge.column(QuantizedDotExpr(
      GraftSqlBridge.expression(emb), GraftSqlBridge.expression(weights), 1000, 1))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", exprs => QuantizedDotExpr(exprs(0), exprs(1), 1000, 1000),
      "scala_udf")
}
