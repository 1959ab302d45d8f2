package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML→text extraction kernel — the step between a crawl and
  * every text-quality/dedup operator. One walk over the markup:
  *
  *  - tags are stripped and counted; `script`/`style` elements are
  *    consumed WITH their content (code and CSS must never leak into the
  *    training text) and count as one tag; comments (`<!-- -->`) vanish;
  *    a `<` not followed by a letter, `/` or `!` is literal text per the
  *    HTML parsing rules; `>` inside a quoted attribute value does not
  *    terminate the tag;
  *  - `<a>` openers carrying an `href` attribute are counted as links;
  *  - character references decode: the core named set (amp, lt, gt, quot,
  *    apos, nbsp) plus numeric `&#NNN;` / `&#xHH;` forms (appended as
  *    code points); anything unrecognized stays literal;
  *  - every tag boundary acts as a word separator and whitespace runs
  *    collapse to single spaces, leading/trailing trimmed — so the output
  *    feeds tokenizers and shingles directly.
  *
  * No DOM, no allocation beyond the output builder: O(n) per document and
  * codegen-friendly (a static call inside whole-stage codegen, the
  * [[PiiScrubKernel]] shape).
  */
object HtmlKernel {

  def extract(s: UTF8String): InternalRowT = {
    val html = s.toString
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var nTags = 0L
    var nLinks = 0L
    var needSpace = false
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (sb.length > 0) needSpace = true
      } else {
        if (needSpace) { sb.append(' '); needSpace = false }
        sb.append(c)
      }
    }
    // decoded references collapse under the SAME set as raw characters
    // (the RE2 \s set the oracles replay: tab nl ff cr space) plus &nbsp;
    // which IS a space semantically — NOT Character.isWhitespace, whose
    // wider set (\v, unicode spaces) would make '&#11;' behave unlike a
    // raw ''
    def emitCp(cp: Int): Unit =
      if (cp == 0xa0 || cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
        cp == '\f') {
        if (sb.length > 0) needSpace = true
      } else {
        if (needSpace) { sb.append(' '); needSpace = false }
        sb.appendCodePoint(cp)
      }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) { // comment: vanish entirely
          // search from i+2, NOT i+4: the closer may OVERLAP the opener's
          // dashes — the spec's abruptly-closed comments <!--> and <!--->
          // are complete comments, and starting past them swallowed the
          // entire rest of the document into the "unclosed comment" arm
          val end = html.indexOf("-->", i + 2)
          i = if (end < 0) n else end + 3
          if (sb.length > 0) needSpace = true
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          // scan the tag, honoring quoted attribute values
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          var quote = 0.toChar
          var hasHref = false
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val t = html.charAt(j)
            if (quote != 0) { if (t == quote) quote = 0.toChar }
            else if (t == '"' || t == '\'') quote = t
            else if (!closing && (t == 'h' || t == 'H') &&
              html.regionMatches(true, j, "href", 0, 4) &&
              // attribute NAME position only: preceded by whitespace, a
              // closing quote (missing-whitespace-between-attributes —
              // browsers still honor <a class="x"href=u>), or '/', and
              // followed by '=', whitespace or the tag end — 'data-href'
              // and class=hrefbox must not count
              j > 0 && {
                val b = html.charAt(j - 1)
                Character.isWhitespace(b) || b == '"' || b == '\'' || b == '/'
              } && {
                val a = j + 4
                a >= n || html.charAt(a) == '=' || html.charAt(a) == '>' ||
                  html.charAt(a) == '/' || Character.isWhitespace(html.charAt(a))
              }) hasHref = true
            j += 1
          }
          val selfClosed = j > i && html.charAt(j - 1) == '/'
          i = if (j < n) j + 1 else n
          nTags += 1
          if (sb.length > 0) needSpace = true
          if (!closing && name == "a" && hasHref) nLinks += 1
          // the self-closing flag is IGNORED on script/style (HTML only
          // honors it on void/foreign elements): <script src=x/> still
          // opens a raw-text element, and skipping the body consumption
          // here leaked the script's code into the training text
          if (!closing && (name == "script" || name == "style")) {
            // consume the raw-text element body through the EARLIEST end
            // tag, case-insensitively — a case-sensitive fast path that
            // skips '</SCRIPT>' to a later '</script>' would swallow the
            // text in between
            val endTag = "</" + name
            var k = -1
            var m = i
            while (k < 0 && m + endTag.length <= n) {
              if (html.regionMatches(true, m, endTag, 0, endTag.length)) k = m
              m += 1
            }
            if (k < 0) i = n
            else {
              var e = k + endTag.length
              while (e < n && html.charAt(e) != '>') e += 1
              i = if (e < n) e + 1 else n
            }
          }
        } else { emit('<'); i += 1 } // literal '<' (e.g. "a < b")
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          val cp: Int = ent match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => 0xa0
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              try {
                val v = if (ent.length > 2 && (ent.charAt(1) == 'x' || ent.charAt(1) == 'X'))
                  Integer.parseInt(ent.substring(2), 16)
                else Integer.parseInt(ent.substring(1))
                // HTML parsing rules: NUL, surrogates and out-of-range
                // references decode to U+FFFD (a lone surrogate would emit
                // invalid UTF-8); a non-numeric body stays literal
                if (v <= 0 || v > 0x10ffff ||
                  (v >= 0xd800 && v <= 0xdfff)) 0xfffd
                else v
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (cp >= 0) { emitCp(cp); i = semi + 1 }
          else { emit('&'); i += 1 } // unrecognized: literal
        } else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    val out = new Array[Any](3)
    out(0) = UTF8String.fromString(sb.toString)
    out(1) = nTags
    out(2) = nLinks
    new GenericInternalRow(out)
  }

  type InternalRowT = org.apache.spark.sql.catalyst.InternalRow
}

/** `htmlExtract(html)` → struct(text, n_tags, n_links) as a native codegen
  * expression: whole-stage codegen emits one static call, so
  * scan → extract → quality/shingle stays a single generated loop. */
case class HtmlExtractExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_tags", LongType, nullable = false),
    StructField("n_links", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"html_extract expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    HtmlKernel.extract(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HtmlKernel.extract($s)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): HtmlExtractExpr =
    copy(child = newChild)
}

object HtmlExtractExpr {
  def apply(html: Column): Column =
    ColumnBridge.column(new HtmlExtractExpr(ColumnBridge.expression(html)))
}
