package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the pass every crawl-extraction
  * chain needs between tag stripping and tokenization: extracted page
  * text is full of `&amp;`, `&#39;`, `&nbsp;`, and leaving them in
  * pollutes token counts, n-gram dedup shingles, and the training
  * corpus itself.
  *
  * Semantics: a SINGLE left-to-right pass — the output of a decode is
  * never rescanned, so double-escaped text stays escaped by exactly
  * one level (`&amp;lt;` → `&lt;`, never `<`). Decoded forms:
  *   - the named core set (`amp lt gt quot apos nbsp`) plus the common
  *     typographic names (dashes, ellipsis, curly quotes, ©®™°·«»•§×);
  *   - numeric decimal `&#NNN;` and hex `&#xHH;` for any valid scalar
  *     value (1..0x10FFFF, surrogates excluded).
  * Anything else — unknown names, missing semicolons, out-of-range or
  * overlong numerics — is NOT a character reference and passes through
  * verbatim, the behavior that keeps real-world pages lossless.
  *
  * Decoding runs AFTER tag stripping on purpose: `&lt;script&gt;` in
  * page text must stay text, never become markup for an earlier stage.
  */
object HtmlUnescapeKernel {

  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](64)
    def p(k: String, cp: Int): Unit = { m.put(k, new String(Character.toChars(cp))); () }
    p("amp", '&'); p("lt", '<'); p("gt", '>'); p("quot", '"')
    p("apos", 0x27); p("nbsp", 0xA0)
    p("mdash", 0x2014); p("ndash", 0x2013); p("hellip", 0x2026)
    p("lsquo", 0x2018); p("rsquo", 0x2019)
    p("ldquo", 0x201C); p("rdquo", 0x201D)
    p("copy", 0xA9); p("reg", 0xAE); p("trade", 0x2122)
    p("deg", 0xB0); p("middot", 0xB7)
    p("laquo", 0xAB); p("raquo", 0xBB)
    p("bull", 0x2022); p("sect", 0xA7); p("times", 0xD7)
    m
  }

  def unescape(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('&') < 0) return u
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val consumed = decodeAt(s, i, sb)
        if (consumed > 0) i += consumed
        else { sb.append('&'); i += 1 } // not a reference: verbatim
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Try to decode the reference starting at `i` (`s(i) == '&'`);
    * appends the decoded text and returns chars consumed, or 0.
    */
  private def decodeAt(s: String, i: Int, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    if (i + 1 >= n) return 0
    if (s.charAt(i + 1) == '#') { // numeric
      var j = i + 2
      val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
      if (hex) j += 1
      val digitsFrom = j
      var code = 0
      while (j < n && j - digitsFrom <= 7 && {
        val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
        if (d >= 0) { code = code * (if (hex) 16 else 10) + d; true }
        else false
      }) j += 1
      if (j == digitsFrom || j - digitsFrom > 7) return 0 // none/overlong
      if (j >= n || s.charAt(j) != ';') return 0
      if (code < 1 || code > 0x10FFFF ||
        (code >= 0xD800 && code <= 0xDFFF)) return 0
      sb.appendCodePoint(code)
      j - i + 1
    } else { // named
      var j = i + 1
      if (!Character.isLetter(s.charAt(j))) return 0
      val from = j
      while (j < n && j - from < 32 && Character.isLetterOrDigit(s.charAt(j)))
        j += 1
      if (j >= n || s.charAt(j) != ';') return 0
      val v = named.get(s.substring(from, j))
      if (v == null) return 0
      sb.append(v)
      j - i + 1
    }
  }
}

/** string → string: decode HTML character references, single pass
  * ([[HtmlUnescapeKernel]]). Null-safe, codegen'd — the hot path of a
  * crawl extraction chain never crosses a UDF boundary.
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_unescape requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlUnescapeKernel.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HtmlUnescapeKernel$$.MODULE$$.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
  override def prettyName: String = "html_unescape"
}
