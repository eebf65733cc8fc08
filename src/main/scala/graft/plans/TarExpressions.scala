package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.crawl.Tar

/** Native kernel for the TAR member walk — same one-static-call
  * codegen shape as [[WarcRecordsKernel]].
  */
object TarEntriesKernel {
  def compute(bytes: Array[Byte]): ArrayData = {
    val rows = Tar.entries(bytes).map { e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.name),
        e.size,
        e.mtime,
        UTF8String.fromString(e.typeFlag.toString),
        e.checksum,
        e.content)): Any
    }.toArray
    new GenericArrayData(rows)
  }
}

/** binary → array<struct> of TAR members ([[Tar.entries]]): the walk
  * stops at the zero-block trailer or the first malformed header —
  * a truncated shard yields its parseable prefix, never an exception.
  */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("type_flag", StringType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tar_entries requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TarEntriesKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TarEntriesKernel$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
  override def prettyName: String = "tar_entries"
}
