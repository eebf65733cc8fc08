package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared MinHash kernel (interpreted + generated paths). */
object MinHashKernel {
  // per-function seeds are loop-invariant (hashInt(i, 42) depends only on
  // i); cache them per numHashes rather than recomputing per element
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes,
      n => Array.tabulate(n)(i => XXH64.hashInt(i, 42L)))

  /** Per hash function i in [0, numHashes): min over non-null elements of
    * the hash chain seed42 → hashInt(i) → hashString(s) — exactly the
    * value the built-in `xxhash64(lit(i), s)` produces, so signatures are
    * bit-compatible with the composed-expression formulation FOR arrays of
    * non-null strings (the only shape `wordShingles` emits). Two edge
    * shapes deliberately diverge from the composed form: null elements are
    * SKIPPED here (builtin xxhash64 would fold a null child to the running
    * seed, i.e. treat it as a value), and an all-null/empty array yields a
    * NULL row (the composed form would emit an array of fold seeds). Both
    * choices make degenerate documents drop out of banding instead of
    * colliding on a seed-only signature.
    */
  def compute(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val sds = seeds(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        any = true
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < numHashes) {
          val h = XxHash64Function.hash(s, StringType, sds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

/** MinHash signature of an `array<string>` shingle column as ONE native
  * expression: a single traversal updates all `numHashes` minima in a
  * primitive array — no intermediate hashed-array materialization. The
  * composed `array(array_min(transform(sh, xxhash64(i, _))) ...)` form
  * allocates `numHashes` hashed copies of the shingle array per row,
  * which at millions of rows is pure GC churn (observed as multi-×
  * run-to-run bench variance); this expression allocates one Long[] per
  * row.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("numHashes must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value}_r =
         |  graft.plans.MinHashKernel$$.MODULE$$.compute($c, $numHashes);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}
