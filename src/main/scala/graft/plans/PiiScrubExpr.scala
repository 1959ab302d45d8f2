package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII redaction kernel: ONE compiled alternation of the
  * redaction classes (each alternative in its own capture group, in
  * priority order — email, IP, card, phone), walked once per document.
  * The participating group of each match decides its token and its class
  * counter, so the scrub and all per-class counts come out of a single
  * scan instead of the former 4 replace + 4 count passes (8 full regex
  * traversals per document).
  *
  * Class priority at the SAME start position follows the alternation
  * order, which is also the old fold's application order; the classes and
  * pattern strings are [[graft.functions.TextFunctions.piiPatterns]],
  * verbatim, in the Java-regex ∩ RE2 subset — the DuckDB oracle rebuilds
  * the identical pass from the same combined pattern via group-wise
  * regexp_extract_all + split reassembly.
  */
object PiiScrubKernel {

  private def patterns = graft.functions.TextFunctions.piiPatterns

  val combinedRegex: String = patterns.map { case (_, p) => s"($p)" }.mkString("|")

  private lazy val compiled: Pattern = Pattern.compile(combinedRegex)
  private lazy val tokens: Array[String] = patterns.map(_._1).toArray

  /** (clean_text, count per class) in one matcher walk. */
  def scrub(s: UTF8String): InternalRow = {
    val text = s.toString
    val m = compiled.matcher(text)
    val nClasses = tokens.length
    val counts = new Array[Long](nClasses)
    val sb = new java.lang.StringBuilder(text.length)
    var last = 0
    while (m.find()) {
      sb.append(text, last, m.start())
      var k = 0
      var found = -1
      while (found < 0 && k < nClasses) {
        if (m.group(k + 1) != null) found = k
        k += 1
      }
      sb.append(tokens(found))
      counts(found) += 1
      last = m.end()
    }
    sb.append(text, last, text.length)
    val out = new Array[Any](1 + nClasses)
    out(0) = UTF8String.fromString(sb.toString)
    var i = 0
    while (i < nClasses) { out(i + 1) = counts(i); i += 1 }
    new GenericInternalRow(out)
  }
}

/** `piiScrub(text)` → struct(clean_text, n_<class>s…) as a native codegen
  * expression: whole-stage codegen emits a static call into the kernel, so
  * the scan → scrub → project pipeline stays one generated loop. */
case class PiiScrubExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(
    StructField("clean_text", StringType, nullable = false) +:
      graft.functions.TextFunctions.piiPatterns.map { case (tok, _) =>
        StructField(graft.functions.TextFunctions.piiCountName(tok),
          LongType, nullable = false)
      })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pii_scrub expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    PiiScrubKernel.scrub(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.PiiScrubKernel.scrub($s)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PiiScrubExpr =
    copy(child = newChild)
}

object PiiScrubExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(new PiiScrubExpr(ColumnBridge.expression(text)))
}
