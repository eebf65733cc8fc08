package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.crawl.Http

/** Native kernels for the HTTP message layer inside WARC payloads —
  * same one-static-call codegen shape as [[WarcRecordsKernel]].
  */
object HttpPartsKernel {
  def compute(bytes: Array[Byte]): GenericInternalRow =
    Http.parseResponse(bytes) match {
      case None => null
      case Some(r) =>
        // duplicate header names: last occurrence wins in the map form
        // (the full ordered list is framing detail, not query surface).
        // The dedup must happen HERE — Spark map lookup returns the
        // FIRST match and duplicate-key MapData is undefined behavior,
        // so repeated Set-Cookie/Content-Type headers (common in real
        // crawls) must collapse before the map is built.
        val dedup = new java.util.LinkedHashMap[String, String]()
        r.headers.foreach { case (k, v) => dedup.put(k, v); () }
        val keys = new Array[Any](dedup.size)
        val vals = new Array[Any](dedup.size)
        var i = 0
        val it = dedup.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey)
          vals(i) = UTF8String.fromString(e.getValue)
          i += 1
        }
        // Content-Encoding is undone HERE (gzip/x-gzip/deflate/zstd;
        // body = stored bytes + quarantine reason when it can't be) —
        // a WARC capture stores response bytes AS SENT, and surfacing
        // compressed bytes as `body` would mojibake every downstream
        // charset decode. NOTE: decodeContentEncoding sees the raw
        // ordered header list, so repeated Content-Encoding lines
        // combine per RFC 9110 §5.2 even though the map form above
        // keeps only the last.
        val dec = Http.decodeContentEncoding(r.headers, r.body)
        new GenericInternalRow(Array[Any](
          r.statusCode,
          UTF8String.fromString(r.reason),
          ArrayBasedMapData(keys, vals),
          dec.body,
          dec.encoding.map(UTF8String.fromString).orNull,
          dec.quarantine.map(UTF8String.fromString).orNull))
    }
}

object DecodeCharsetKernel {
  def compute(body: Array[Byte], contentType: UTF8String): GenericInternalRow = {
    val d = Http.decodeCharset(body,
      if (contentType == null) null else contentType.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.text),
      UTF8String.fromString(d.charset),
      d.nReplaced))
  }
}

/** binary → struct(status, reason, headers map, body binary,
  * content_encoding, quarantine) | NULL: parse the HTTP response
  * message a WARC `response` payload actually is
  * ([[Http.parseResponse]] — RFC 9112 simple subset, chunked
  * de-chunking, Content-Length trim), then undo the body's
  * `Content-Encoding` chain ([[Http.decodeContentEncoding]] —
  * gzip/x-gzip/deflate/zstd; `quarantine` carries the reason when the
  * chain can't be undone and `body` stays the stored bytes). NULL on
  * malformed framing — quarantine, never a task kill.
  */
case class HttpParts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("reason", StringType, nullable = false),
    StructField("headers", MapType(StringType, StringType,
      valueContainsNull = false), nullable = false),
    StructField("body", BinaryType, nullable = false),
    StructField("content_encoding", StringType, nullable = true),
    StructField("quarantine", StringType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_parts requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpPartsKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.HttpPartsKernel$$.MODULE$$.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): HttpParts =
    copy(child = newChild)
  override def prettyName: String = "http_parts"
}

/** (binary, string) → struct(text, charset, n_replaced): decode body
  * bytes by the browser resolution order — BOM > Content-Type charset
  * parameter (2nd argument, nullable) > meta-tag sniff > UTF-8 —
  * with U+FFFD replacement COUNTED, so a lying label degrades
  * measurably instead of silently mojibaking ([[Http.decodeCharset]]).
  */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("charset", StringType, nullable = false),
    StructField("n_replaced", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decode_charset requires (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  // the CONTENT-TYPE side is legitimately null (header absent) — only
  // a null body nulls the result, so eval is hand-rolled
  override def nullable: Boolean = left.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = left.eval(input)
    if (b == null) null
    else DecodeCharsetKernel.compute(b.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${rightGen.code}
          ${ev.value} = graft.plans.DecodeCharsetKernel$$.MODULE$$.compute(
            ${leftGen.value},
            ${rightGen.isNull} ? null : ${rightGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeCharset =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "decode_charset"
}
