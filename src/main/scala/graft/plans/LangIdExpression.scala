package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker table for [[LangId]]: per language, the list of padded literal
  * markers to count. Kept as a reference object (not inlined constants)
  * so the generated code is ONE static call regardless of marker count.
  */
case class LangIdData(
    langs: Array[UTF8String],
    markers: Array[Array[UTF8String]],
    und: UTF8String)

object LangIdKernel {
  private val SPACE = UTF8String.fromString(" ")

  /** Count non-overlapping occurrences of each language's markers in the
    * space-padded lowercase text; argmax with ties broken by language
    * order; all-zero → "und". Exactly the semantics of the composed
    * `replace`-count + `array_max(struct)` formulation (which the DuckDB
    * oracle replicates), in a single pass per marker over the text.
    */
  def compute(text: UTF8String, d: LangIdData): UTF8String = {
    val padded = UTF8String.concat(SPACE, text.toLowerCase, SPACE)
    var best = -1
    var bestScore = 0L
    var i = 0
    while (i < d.markers.length) {
      var s = 0L
      var m = 0
      while (m < d.markers(i).length) {
        val mk = d.markers(i)(m)
        if (mk.numBytes > 0) { // an empty marker would never advance
          var from = padded.indexOf(mk, 0)
          while (from >= 0) {
            s += 1
            from = padded.indexOf(mk, from + mk.numChars())
          }
        }
        m += 1
      }
      if (s > bestScore) { bestScore = s; best = i } // ties keep the earlier language
      i += 1
    }
    if (best < 0) d.und else d.langs(best)
  }
}

/** Language-ID heuristic as ONE native expression.
  *
  * The composed column formulation (20 `replace`-count trees feeding an
  * `array_max(struct)` argmax) generates several thousand lines of
  * projection code, and janino+JIT of that method cost 6-50 s ONCE PER
  * JVM — observed as a q22 first-run spike in the bench harness. This
  * expression generates a single static call instead; the kernel is the
  * same argmax over non-overlapping literal counts, verified equivalent
  * to the composed form (and to the DuckDB oracle's replicated SQL) in
  * TextFunctionsSpec.
  */
case class LangId(child: Expression, langMarkers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if langMarkers.nonEmpty && langMarkers.forall(_._2.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("langMarkers must be non-empty per language")
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${other.catalogString}")
  }

  @transient private lazy val data = LangIdData(
    langMarkers.map(l => UTF8String.fromString(l._1)).toArray,
    langMarkers.map(_._2.map(UTF8String.fromString).toArray).toArray,
    UTF8String.fromString("und"))

  override def nullSafeEval(input: Any): Any =
    LangIdKernel.compute(input.asInstanceOf[UTF8String], data)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langIdData", data, classOf[LangIdData].getName)
      s"${ev.value} = graft.plans.LangIdKernel$$.MODULE$$.compute($c, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}
