package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two float/double array columns, with
  * whole-stage codegen.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_) /
  * (norm·norm)` — is correct but slow at scale: Catalyst's higher-order
  * functions evaluate their lambdas interpreted (no codegen), allocate an
  * intermediate zipped array per row, and traverse the vectors five times
  * (dot, a², b², plus two transforms). This expression is one fused loop
  * over the raw `ArrayData` with no allocation, generated into the stage's
  * Java when codegen is on and mirrored exactly by `eval` when it isn't.
  *
  * Null/shape semantics: null if either side is null; requires equal
  * lengths (analysis-checked types, runtime-checked lengths); returns 0.0
  * when either vector has zero norm.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    CosineSimilarityExpr.compute(a, b, isFloat(left), isFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarityExpr.compute(" +
        s"$a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarityExpr {
  /** Shared by interpreted eval and generated code: one fused pass. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

object CosineSimilarity {
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarityExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarityExpr(exprs(0), exprs(1)), "scala_udf")
}
