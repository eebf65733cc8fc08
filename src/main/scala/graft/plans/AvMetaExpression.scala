package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.MediaContainers

/** The full audiovisual-container sniff ([[MediaContainers.parseAv]])
  * as ONE native expression: media → struct(format, width, height,
  * n_frames, sample_rate, channels, duration_ticks, timescale). The
  * superset of `media_meta` that carries the A/V stream parameters the
  * dominant crawl containers (MP4/MP3/FLAC/Ogg, plus WAV) expose in
  * their headers. Same codegen shape as [[MediaMeta]]: one generated
  * static call, the payload read once, never leaving whole-stage
  * codegen.
  */
object AvMetaKernel {
  def compute(bytes: Array[Byte]): InternalRow = {
    val m = MediaContainers.parseAv(bytes)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.format),
      m.width.map(Int.box).orNull,
      m.height.map(Int.box).orNull,
      m.nFrames.map(Long.box).orNull,
      m.sampleRate.map(Int.box).orNull,
      m.channels.map(Int.box).orNull,
      m.durationTicks.map(Long.box).orNull,
      m.timescale.map(Int.box).orNull))
  }
}

case class AvMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ticks", LongType, nullable = true),
    StructField("timescale", IntegerType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"av_meta requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AvMetaKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.AvMetaKernel$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AvMeta =
    copy(child = newChild)
  override def prettyName: String = "av_meta"
}
