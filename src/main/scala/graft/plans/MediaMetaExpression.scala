package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.MediaContainers

/** Container-header sniff+parse ([[MediaContainers]]) as ONE native
  * expression over a binary column: media → struct(format, width,
  * height, n_frames). A single generated static call per row — the
  * parse never leaves whole-stage codegen, and the payload bytes are
  * read once (no per-format re-probing at the Column layer).
  */
object MediaMetaKernel {
  def compute(bytes: Array[Byte]): InternalRow = {
    val m = MediaContainers.parse(bytes)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.format),
      m.width.map(Int.box).orNull,
      m.height.map(Int.box).orNull,
      m.nFrames.map(Long.box).orNull))
  }
}

case class MediaMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_meta requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaMetaKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MediaMetaKernel$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaMeta =
    copy(child = newChild)
  override def prettyName: String = "media_meta"
}
