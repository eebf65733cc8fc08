package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.crawl.Codecs

/** Zstandard codec kernels — same one-static-call codegen shape as
  * [[GzipKernel]], for the `.jsonl.zst` shard framing modern LLM
  * corpora ship in.
  */
object ZstdKernel {
  def compress(bytes: Array[Byte]): Array[Byte] = Codecs.zstd(bytes)
  // null on corrupt bytes or a decompression bomb (cap enforced
  // during inflation)
  def inflate(bytes: Array[Byte]): Array[Byte] =
    Codecs.unzstdAll(bytes).orNull
}

/** binary → binary: one zstd frame (concatenate for a multi-frame
  * stream).
  */
case class ZstdBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zstd_bytes requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdKernel.compress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ZstdKernel$$.MODULE$$.compress($c)")

  override protected def withNewChildInternal(newChild: Expression): ZstdBytes =
    copy(child = newChild)
  override def prettyName: String = "zstd_bytes"
}

/** binary → binary: inflate a chain of concatenated zstd frames.
  * NULL on corrupt bytes or decompression-bomb overflow — quarantine,
  * never a task kill.
  */
case class UnzstdAll(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unzstd_all requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdKernel.inflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.ZstdKernel$$.MODULE$$.inflate($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): UnzstdAll =
    copy(child = newChild)
  override def prettyName: String = "unzstd_all"
}
