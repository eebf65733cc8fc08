package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-shingle GENERATOR — the table-function flavor of
  * [[WordShingles]] (custom `Generator`, the UDTF-shaped Catalyst
  * extension point; the engine's other custom nodes are scalar/agg
  * expressions, an Aggregator, a LogicalPlan+Strategy and a DSv2 source).
  *
  * `explode(word_shingles(text, n))` builds the full shingle ARRAY as a
  * column value, copies it through the projection, then explodes it.
  * This generator emits `(pos, shingle)` rows straight off the kernel's
  * token spans — no array column materializes in the row buffer between
  * the scan and the generate. Semantics match
  * `posexplode(wordShingles(text, n))` exactly (including the <n-token
  * whole-text shingle and null → no rows), pinned in
  * TextFunctionsSpec.
  *
  * Generators run in `GenerateExec` via `eval` (CodegenFallback is the
  * standard shape — Spark's own `Stack`/`JsonTuple` do the same); the
  * per-row kernel call is the identical single byte-scan the projected
  * form pays, minus the array/copy overhead.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_generate requires string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = WordShingleKernel.compute(t.asInstanceOf[UTF8String], n)
      val out = new Array[InternalRow](arr.numElements())
      var i = 0
      while (i < out.length) { out(i) = InternalRow(i, arr.getUTF8String(i)); i += 1 }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
  override def prettyName: String = "shingle_generate"
}
