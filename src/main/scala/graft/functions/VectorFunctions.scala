package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.{DotProduct, SumOfSquares}

/** Dense-vector math over `array<float|double>` embedding columns, backed
  * by native codegen'd Catalyst expressions (`graft.plans.DotProduct`,
  * `SumOfSquares`) — a tight primitive loop per row instead of
  * per-element higher-order-function lambdas, which is the difference
  * between interpreted-lambda and SIMD-friendly code on the O(n²) hot
  * path of similarity joins. Accumulation order (left-to-right IEEE fold,
  * arithmetic in double) and null semantics (null element or length
  * mismatch → NULL) are identical to the `aggregate`/`zip_with`
  * formulation this replaces, so results are bit-for-bit unchanged.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2Norm(a: Column): Column =
    sqrt(ColumnBridge.column(SumOfSquares(ColumnBridge.expression(a))))

  /** Cosine similarity; 0.0 for zero-norm inputs instead of NaN. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }
}
