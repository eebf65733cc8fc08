package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingling kernel.
  *
  * Semantics are EXACTLY the composed-builtin formulation it replaces
  * (`TextFunctions.wordShinglesComposed`, pinned equal in
  * TextFunctionsSpec): lowercase, tokenize on Java-regex `\s+` runs
  * (the six ASCII whitespace bytes — all multi-byte UTF-8 chars survive
  * intact since their bytes are non-ASCII), then emit each run of `n`
  * consecutive tokens joined by single spaces; texts with fewer than `n`
  * tokens emit ONE shingle = the whole space-normalized text (empty
  * text → [""]).
  *
  * The composed form builds `sequence` + `slice` + `concat_ws` trees per
  * shingle — one array allocation per token per shingle. Profiled at
  * sf0.1 it accounted for most of q23's runtime (shingling re-executes
  * in every branch of the candidate/verify DAG). This kernel makes one
  * byte scan per document and one byte-copy per shingle.
  */
object WordShingleKernel {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    // token spans [start, end) over the byte array
    var count = 0
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends(count) = i
        count += 1
      } else i += 1
    }
    def joined(from: Int, until: Int): UTF8String = {
      if (until <= from) return UTF8String.EMPTY_UTF8
      var len = until - from - 1 // single spaces between tokens
      var t = from
      while (t < until) { len += ends(t) - starts(t); t += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      t = from
      while (t < until) {
        if (t > from) { out(pos) = ' '; pos += 1 }
        val w = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), out, pos, w)
        pos += w
        t += 1
      }
      UTF8String.fromBytes(out)
    }
    if (count < n) new GenericArrayData(Array[Any](joined(0, count)))
    else {
      val shingles = new Array[Any](count - n + 1)
      var s = 0
      while (s <= count - n) { shingles(s) = joined(s, s + n); s += 1 }
      new GenericArrayData(shingles)
    }
  }
}

/** Word n-gram shingles of a text column as one native expression. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingleKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingleKernel$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Exact set-Jaccard of two string arrays (inputs treated as bags and
  * deduplicated internally): |A∩B| / |A∪B|, NULL if either side is NULL,
  * 1.0 when both sets are empty (unreachable via shingling, which emits
  * at least [""]).
  *
  * Replaces `size(array_intersect)/size(array_union)` on the similarity
  * hot path: one hash-set build of the smaller side + one probe pass of
  * the larger, no intermediate arrays — this runs once per CANDIDATE
  * pair (hundreds of thousands per corpus), not per output row.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_similarity requires two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaccardSimilarity$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_similarity"
}

object JaccardSimilarity {
  private def toSet(arr: ArrayData): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](Math.max(16, arr.numElements() * 2))
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (toSet(a), toSet(b)) else (toSet(b), toSet(a))
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = small.size + large.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
