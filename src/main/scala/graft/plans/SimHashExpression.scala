package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared SimHash kernel, called from both the interpreted and generated
  * paths. JVM-static so codegen can invoke it directly.
  */
object SimHashKernel {
  /** 64-bit SimHash of an array of UTF8 strings (nulls skipped). */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** 64-bit SimHash of an `array<string>` token column as a native Catalyst
  * expression: per token, xxhash64 (seed 42, matching the built-in
  * `xxhash64()` function); each hash bit votes +1/-1; the sign of each
  * vote total becomes the output bit.
  *
  * A per-row expression — no shuffle, no UDF serialization; the single
  * pass over the token array is O(tokens × 64) integer ops. Participates
  * in whole-stage codegen (the generated code calls the static kernel, so
  * the expression never forces a plan out of WholeStageCodegen the way a
  * CodegenFallback would). Near-duplicate detection is then
  * `bit_count(a ^ b) <= radius` on the outputs.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHashKernel$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
