package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (columnNodeSupport.scala); this bridge re-exports the two conversions
  * for the engine's native expressions — the same package-escape pattern
  * ecosystem libraries use for custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Top-level column names an unresolved Column refers to.
    * `expression(c)` returns a LAZY `ColumnNodeExpression` proxy whose
    * Catalyst tree only materializes at analysis, so collecting
    * `UnresolvedAttribute`s on it finds nothing — this converts the
    * column-node tree eagerly (the same converter the analyzer runs) and
    * walks the real tree. Multi-part (struct-field / qualified) refs
    * return their FULL dotted name, which callers can use to detect that
    * the ref is not a plain top-level column. */
  def referencedNames(c: Column): Seq[String] = {
    val converted =
      org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
    converted.collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.mkString(".")
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.name
    }
  }
}
