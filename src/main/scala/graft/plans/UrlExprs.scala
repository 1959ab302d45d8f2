package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel behind [[graft.operators.Web.registeredDomain]].
  *
  * The Column formulation of the PSL lookup (a `when` chain over
  * `substring_index` label suffixes feeding eight `InSet` probes) is
  * row-local and codegen-friendly at RUNTIME, but its expression TREE
  * substitutes the host subtree into every suffix guard — ~25 copies when
  * the host is itself a derived expression — and the analyzer/optimizer
  * re-walk that tree on every plan build. Round 12 measured the damage on
  * `web_domain_cap`: 1.3 s wall of which only 0.4 s was task time; the
  * rest was driver-side plan analysis of the blown-up tree. One opaque
  * expression node holding the rule sets as a reference object collapses
  * the tree to `host + 1 node` and runs the whole lookup as one backward
  * scan + at most eight hash probes per row.
  */
object UrlKernel {

  /** The PSL rule classes as constant-time membership sets. One instance
    * per distinct rule snapshot, shared by reference into generated code
    * (`CodegenContext.addReferenceObj`) — the codegen analog of a
    * broadcast map, exactly like the InSet sets it replaces. */
  final class PslSets(
      val lit2: java.util.HashSet[String], val lit3: java.util.HashSet[String],
      val lit4: java.util.HashSet[String],
      val wild2: java.util.HashSet[String], val wild3: java.util.HashSet[String],
      val wild4: java.util.HashSet[String],
      val exc2: java.util.HashSet[String], val exc3: java.util.HashSet[String])
    extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case p: PslSets =>
        lit2 == p.lit2 && lit3 == p.lit3 && lit4 == p.lit4 &&
          wild2 == p.wild2 && wild3 == p.wild3 && wild4 == p.wild4 &&
          exc2 == p.exc2 && exc3 == p.exc3
      case _ => false
    }
    override def hashCode(): Int = lit2.size * 31 + lit3.size * 7 + wild2.size
  }

  def pslSets(lit2: Seq[String], lit3: Seq[String], lit4: Seq[String],
              wild2: Seq[String], wild3: Seq[String], wild4: Seq[String],
              exc2: Seq[String], exc3: Seq[String]): PslSets = {
    def hs(s: Seq[String]) = { val h = new java.util.HashSet[String](s.size * 2 + 4)
      s.foreach(h.add); h }
    new PslSets(hs(lit2), hs(lit3), hs(lit4), hs(wild2), hs(wild3), hs(wild4),
      hs(exc2), hs(exc3))
  }

  /** Registered domain under the PSL algorithm (precedence: exception >
    * longest rule > default), value-identical to the retired Column chain:
    * `lastK` is the last-k-label suffix when the host has ≥ k−1 dots
    * (the whole host at exactly k−1), '' otherwise — matching the old
    * `when(nDots >= k-1, substring_index(host, ".", -k))` guards, trailing
    * dots and all. A bare public suffix falls back to itself; a
    * single-label host yields ''. */
  def registeredDomain(host: UTF8String, r: PslSets): UTF8String = {
    val h = host.toString
    val len = h.length
    // positions of the last 5 dots, from the end; nd = total dot count
    val dot = new Array[Int](5)
    var nd = 0
    var i = len - 1
    while (i >= 0) {
      if (h.charAt(i) == '.') { if (nd < 5) dot(nd) = i; nd += 1 }
      i -= 1
    }
    def lastK(k: Int): String =
      if (nd >= k) h.substring(dot(k - 1) + 1)
      else if (nd == k - 1) h
      else ""
    val last1 = lastK(1); val last2 = lastK(2); val last3 = lastK(3)
    val last4 = lastK(4); val last5 = lastK(5)
    val out =
      if (r.exc3.contains(last3)) last3
      else if (r.exc2.contains(last2)) last2
      // wildN needs lastN non-empty: a bare (N−1)-label host equal to a
      // wildcard BASE is not matched by the wildcard (rule longer than
      // host) and falls through to a shorter rule
      else if (r.lit4.contains(last4) ||
          (r.wild4.contains(last3) && last4.nonEmpty))
        (if (last5.nonEmpty) last5 else last4)
      else if (r.lit3.contains(last3) ||
          (r.wild3.contains(last2) && last3.nonEmpty))
        (if (last4.nonEmpty) last4 else last3)
      else if (r.lit2.contains(last2) || r.wild2.contains(last1))
        (if (last3.nonEmpty) last3 else last2)
      else last2
    if (out.length == len) host else UTF8String.fromString(out)
  }
}

/** `registeredDomain(host)` as ONE Catalyst node — see [[UrlKernel]]. */
case class RegisteredDomainExpr(child: Expression, rules: UrlKernel.PslSets)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"registered_domain expects string, got $t")
  }

  override protected def nullSafeEval(h: Any): Any =
    UrlKernel.registeredDomain(h.asInstanceOf[UTF8String], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslSets", rules,
      classOf[UrlKernel.PslSets].getName)
    defineCodeGen(ctx, ev, h => s"graft.plans.UrlKernel.registeredDomain($h, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegisteredDomainExpr {
  def apply(host: Column, rules: UrlKernel.PslSets): Column =
    ColumnBridge.column(new RegisteredDomainExpr(
      ColumnBridge.expression(host), rules))
}
