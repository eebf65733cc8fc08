package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels shared by the interpreted and generated paths.
  *
  * Accumulation order is the exact left-to-right IEEE fold of the
  * higher-order-function formulation these expressions replace
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`), so swapping them in is
  * bit-for-bit result-neutral — only the per-element lambda/virtual-call
  * overhead goes away (the hot path of O(n²) similarity joins).
  *
  * Null semantics also match the HOF forms: any null element, or a length
  * mismatch (zip_with pads with null), yields NULL.
  */
object VectorKernel {
  def dot(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def sumSq(a: ArrayData, aDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

private[plans] object VectorExprs {
  def elemCheck(name: String, t: DataType): TypeCheckResult = t match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double>, got ${other.catalogString}")
  }
  def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** Dot product of two numeric arrays as a native codegen'd expression. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(VectorExprs.elemCheck("dot_product", left.dataType),
        VectorExprs.elemCheck("dot_product", right.dataType))
      .find(_.isFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  private lazy val aD = VectorExprs.isDouble(left.dataType)
  private lazy val bD = VectorExprs.isDouble(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aD, bD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.plans.VectorKernel$$.MODULE$$.dot($a, $b, $aD, $bD);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Sum of squares of a numeric array (codegen'd); l2 norm = sqrt of this. */
case class SumOfSquares(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elemCheck("sum_of_squares", child.dataType)

  private lazy val aD = VectorExprs.isDouble(child.dataType)

  override def nullSafeEval(a: Any): Any =
    VectorKernel.sumSq(a.asInstanceOf[ArrayData], aD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.plans.VectorKernel$$.MODULE$$.sumSq($a, $aD);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumOfSquares =
    copy(child = newChild)
  override def prettyName: String = "sum_of_squares"
}
