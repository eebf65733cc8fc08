package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter probes over a broadcast bitmap.
  *
  * The previous probe shape was a Scala `udf(...)` closure over the
  * broadcast — correct, but per-row it boxes the key, crosses the
  * catalyst↔Scala boundary, and fences whole-stage codegen right at the
  * pre-shuffle scan where the Bloom is supposed to be cheapest. These
  * expressions keep the probe inside the generated code instead, same
  * class as the other native kernels in this package.
  *
  * Shipping: each expression holds the `Broadcast` HANDLE, not the
  * bitmap — the task binary stays small and the ~MB bitmap travels once
  * per executor via the broadcast machinery. Generated classes resolve
  * `.value()` once per instance (init-time mutable state), so the
  * per-row cost is one long hash-probe, nothing else.
  *
  * Null semantics are the plain expression default (null in → null out);
  * callers compose the "null never matches" / "null text has no hits"
  * behavior with `coalesce`/filter at the Column layer, where a null
  * predicate already drops the row.
  */
object BloomKernel {
  /** Array probe: the sub-array of `arr` the filter might contain.
    * Null elements never match (the filter was only ever fed non-nulls).
    */
  def hits(arr: ArrayData, bf: BloomFilter): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (bf.mightContainLong(v)) { out(m) = v; m += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private val bfClassName = classOf[BloomFilter].getName

  /** Shared codegen plumbing: a per-instance field holding the resolved
    * broadcast value, so generated code probes a local reference.
    */
  def bloomVar(ctx: CodegenContext, bcast: Broadcast[BloomFilter]): String = {
    val ref = ctx.addReferenceObj("bloomBcast", bcast,
      classOf[Broadcast[BloomFilter]].getName)
    ctx.addMutableState(bfClassName, "bloomFilter",
      v => s"$v = ($bfClassName) $ref.value();")
  }
}

/** `bloom.mightContainLong(key)` as a native boolean expression. */
case class BloomMightContainLong(child: Expression, bcast: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, got ${other.catalogString}")
  }

  @transient private lazy val bf: BloomFilter = bcast.value

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloom = BloomKernel.bloomVar(ctx, bcast)
    defineCodeGen(ctx, ev, c => s"$bloom.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** Probe every element of an `array<bigint>` against the filter,
  * keeping the hits.
  */
case class BloomFilterHits(child: Expression, bcast: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_hits requires array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val bf: BloomFilter = bcast.value

  override def nullSafeEval(input: Any): Any =
    BloomKernel.hits(input.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloom = BloomKernel.bloomVar(ctx, bcast)
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BloomKernel$$.MODULE$$.hits($c, $bloom)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomFilterHits =
    copy(child = newChild)
  override def prettyName: String = "bloom_hits"
}
