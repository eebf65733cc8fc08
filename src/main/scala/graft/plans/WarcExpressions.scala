package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.crawl.Warc

/** Native kernels for the WARC crawl-container surface — the same
  * one-static-call codegen shape as [[AvMetaKernel]]: the payload is
  * read once inside whole-stage codegen, no UDF boundary.
  */
object WarcRecordsKernel {
  def compute(bytes: Array[Byte]): ArrayData = {
    val rows = Warc.records(bytes).map { r =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.version),
        UTF8String.fromString(r.warcType),
        UTF8String.fromString(r.recordId),
        r.targetUri.map(UTF8String.fromString).orNull,
        r.date.map(UTF8String.fromString).orNull,
        r.contentType.map(UTF8String.fromString).orNull,
        r.contentLength,
        r.content)): Any
    }.toArray
    new GenericArrayData(rows)
  }
}

object GzipKernel {
  def compress(bytes: Array[Byte]): Array[Byte] = Warc.gzip(bytes)
  // null (SQL NULL) on corrupt bytes or a decompression bomb — the
  // quarantine contract, enforced during inflation
  def inflate(bytes: Array[Byte]): Array[Byte] =
    Warc.gunzipAll(bytes).orNull
}

/** binary → array<struct> of WARC records ([[Warc.records]]): the walk
  * stops at the first malformed record, so a truncated archive yields
  * its parseable prefix — never an exception.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_records requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcRecordsKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WarcRecordsKernel$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
  override def prettyName: String = "warc_records"
}

/** binary → binary: one gzip member (the per-record framing
  * `.warc.gz` archives use — concatenating results gives a standard
  * multi-member archive).
  */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_bytes requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GzipKernel.compress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.GzipKernel$$.MODULE$$.compress($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
  override def prettyName: String = "gzip_bytes"
}

/** binary → binary: inflate a full chain of concatenated gzip members.
  * NULL on corrupt bytes or output past the decompression-bomb cap —
  * quarantine, never a task kill.
  */
case class GunzipAll(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gunzip_all requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GzipKernel.inflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.GzipKernel$$.MODULE$$.inflate($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): GunzipAll =
    copy(child = newChild)
  override def prettyName: String = "gunzip_all"
}
