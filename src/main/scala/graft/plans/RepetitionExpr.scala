package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style within-document repetition signals as ONE primitive pass —
  * the codegen kernel behind
  * [[graft.functions.TextFunctions.repetitionMetrics]].
  *
  * The array-builtin formulation (split → zip_with bigrams → array_sort →
  * run fold) allocates a UTF8String per bigram and sorts strings; this
  * kernel instead interns words into per-document integer ids (exact
  * string equality — a HashMap, not hashing, so no collision risk),
  * packs each bigram into one long `(idA << 32) | idB`, and takes the max
  * equal-neighbor run of the sorted longs. Bigram-string equality ⟺
  * id-pair equality because words cannot contain whitespace, and max-run
  * is sort-order-independent — so the output is value-identical to the
  * array formulation (and the DuckDB oracle), just on primitives.
  *
  * Rounding matches Spark's `round(x, 4)` exactly:
  * `BigDecimal(x).setScale(4, HALF_UP)` (toString-based, like
  * BigDecimal.valueOf).
  */
object RepetitionKernel {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Space-only trim — Spark's `trim()` (and DuckDB's) strip 0x20 ONLY;
    * Java's String.trim strips every char <= U+0020 and would silently
    * diverge on leading/trailing tabs or newlines. */
  private def trimSpaces(t: String): String = {
    var from = 0
    var to = t.length
    while (from < to && t.charAt(from) == ' ') from += 1
    while (to > from && t.charAt(to - 1) == ' ') to -= 1
    t.substring(from, to)
  }

  /** (n_words, dup_word_ratio, top_bigram_share) — split semantics mirror
    * `split(trim(text), "\\s+")` (limit -1; space-only trim, so a leading
    * tab/newline yields a leading empty word exactly as in the column
    * formulation; empty text yields the single empty word, n = 1). */
  def stats(s: UTF8String): InternalRow = {
    val words = trimSpaces(s.toString).split("\\s+", -1)
    val n = words.length
    val idOf = new java.util.HashMap[String, Integer](math.max(4, n * 2))
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) {
      val w = words(i)
      var id = idOf.get(w)
      if (id == null) { id = Integer.valueOf(idOf.size()); idOf.put(w, id) }
      ids(i) = id.intValue()
      i += 1
    }
    val dup =
      if (n > 0) round4(1.0 - idOf.size().toDouble / n) else 0.0
    var share = 0.0
    if (n >= 2) {
      val bg = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        bg(i) = (ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL)
        i += 1
      }
      java.util.Arrays.sort(bg)
      var best = 1
      var run = 1
      i = 1
      while (i < bg.length) {
        if (bg(i) == bg(i - 1)) run += 1 else run = 1
        if (run > best) best = run
        i += 1
      }
      share = round4(best.toDouble / (n - 1))
    }
    new GenericInternalRow(Array[Any](n.toLong, dup, share))
  }
}

/** `repetitionStats(text)` → struct(n_words_r, dup_word_ratio,
  * top_bigram_share) as a native codegen expression. */
case class RepetitionStatsExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words_r", LongType, nullable = false),
    StructField("dup_word_ratio", DoubleType, nullable = false),
    StructField("top_bigram_share", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_stats expects string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    RepetitionKernel.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.RepetitionKernel.stats($s)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(new RepetitionStatsExpr(ColumnBridge.expression(text)))
}
