package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object RepetitionKernel {
  /** round(x, 6) with Spark's `Round` semantics (HALF_UP on the decimal
    * representation) so kernel output is bit-equal to the composed
    * `round(…, 6)` column form.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One pass over a token array: (distinct words / words, mass of the
    * most frequent word bigram). Matches the composed
    * `distinctWordRatioComposed` / `topBigramFracComposed` forms exactly
    * (pinned in TextFunctionsSpec): empty array → (null, null); a single
    * token has no bigrams → (ratio, null). Null tokens can't occur
    * (tokens() never emits them) but are counted like the composed form
    * would (array_distinct keeps one null; a null-containing bigram
    * concats through).
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](null, null))
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i); i += 1 } // null stays null
    val seen = new java.util.HashSet[UTF8String](n * 2)
    i = 0
    while (i < n) { seen.add(words(i)); i += 1 }
    val dwr = round6(seen.size.toDouble / n)
    val tbf: Any = if (n < 2) null
    else {
      val counts = new java.util.HashMap[(UTF8String, UTF8String), Int](n * 2)
      var best = 0
      i = 0
      while (i < n - 1) {
        val k = (words(i), words(i + 1))
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      round6(best.toDouble / (n - 1))
    }
    new GenericInternalRow(Array[Any](dwr, tbf))
  }
}

/** Repetition signals of a token-array column as ONE native expression
  * returning `struct<distinct_word_ratio double, top_bigram_frac
  * double>`.
  *
  * The composed formulation nests `filter(bg, …)` inside a `transform`
  * over `array_distinct(bg)` — and once an optimizer rule inlines the
  * staged bigram column into that lambda (predicate pushdown through the
  * staging projection does exactly this), every per-element evaluation
  * re-executes the whole tokenize→bigram tree: observed as a 78 s
  * q48_quality_filter at sf0.1. This kernel is a single O(n) hash pass
  * per row; inlining it a handful of times costs nothing. Same
  * native-kernel-plus-composed-spec discipline as [[LangId]] and
  * [[WordShingles]].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("distinct_word_ratio", DoubleType, nullable = true),
    StructField("top_bigram_frac", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (InternalRow) graft.plans.RepetitionKernel$$.MODULE$$.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}
