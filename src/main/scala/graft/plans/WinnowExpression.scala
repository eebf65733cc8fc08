package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared winnowing kernel (interpreted + generated paths). */
object WinnowKernel {
  final val Base = 131L
  final val Mod = 1000000007L

  /** Rabin-Karp poly-hash over the string's CODEPOINTS — bit-compatible
    * with the composed `aggregate(sequence(1, length(s)), ...)` fold
    * over `ascii(substr(s, i, 1))` (and with the DuckDB oracle's
    * `ascii(s[i])` fold), which both see codepoints, not UTF-8 bytes.
    */
  def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Distinct window-minima fingerprints of the shingle array: one pass
    * hashes every shingle, one pass takes the min of each sliding
    * `window`; first-occurrence order matches the composed
    * `array_distinct(transform(sequence(...), j -> array_min(slice(...))))`
    * form for arrays of non-null strings (the only shape `wordShingles`
    * emits — null elements would make the composed form emit null
    * fingerprints, this kernel skips them like `array_min` does).
    */
  def compute(arr: ArrayData, window: Int): GenericArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var j = 0
    while (j < n) {
      hs(j) =
        if (arr.isNullAt(j)) Long.MaxValue
        else polyHash(arr.getUTF8String(j).toString)
      j += 1
    }
    val m = math.max(n - window + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    j = 0
    while (j < m) {
      var min = Long.MaxValue
      var i = j
      val hi = math.min(j + window, n)
      while (i < hi) { if (hs(i) < min) min = hs(i); i += 1 }
      if (min != Long.MaxValue) seen.add(min)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowed rolling-hash fingerprints of an `array<string>` shingle
  * column as ONE native expression: the composed higher-order-function
  * form evaluates an interpreted per-character lambda fold per shingle
  * per window reference (q102 measured 5.5 s at sf0.1); this kernel is
  * two tight primitive loops per row inside whole-stage codegen.
  */
case class WinnowFingerprints(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if window > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("window must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  graft.plans.WinnowKernel$$.MODULE$$.compute($c, $window);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}
