package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Embedding-math kernels over Spark's internal ArrayData — the per-row
  * inner loops of the similarity/dedup family (cosine rerank, SemDeDup
  * pair checks, IVF assignment). Each mirrors a specific HOF composition
  * (`aggregate(zip_with(...))` left fold, seed 0.0, ascending index) so the
  * IEEE operation order — and therefore every oracle comparison — is
  * bit-identical; the HOFs themselves evaluate interpreted and allocate an
  * intermediate array per row, which dominates when the expression runs
  * once per candidate PAIR.
  */
object VectorKernel {

  /** Σ a(i)·b(i), ascending i — bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` for equal-length inputs. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** √Σ v(i)², ascending — bit-identical to
    * `sqrt(aggregate(transform(v, x => x*x), 0.0, _+_))`. */
  def l2Norm(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Per-centroid squared L2 distance, centroid order preserved; each
    * distance is the same ascending-dimension left fold of (x−c)² the
    * k-means/IVF oracles unroll. */
  def sqDists(v: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = v.getDouble(i) - cent(i); s += d * d; i += 1 }
      out(c) = s
      c += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `dot(a, b)` as a native codegen expression. */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernel.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new DotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `l2Norm(v)` as a native codegen expression. */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_norm expects array<double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernel.l2Norm(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorKernel.l2Norm($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2NormExpr {
  def apply(v: Column): Column =
    ColumnBridge.column(new L2NormExpr(ColumnBridge.expression(v)))
}

/** Squared distances to a broadcast-literal centroid table (array<double>,
  * one entry per centroid, order preserved). The matrix rides along as a
  * reference object in generated code — never rebuilt per row, unlike a
  * `typedLit` touched inside a HOF lambda.
  *
  * The case-class field is the VALUE-comparable IndexedSeq form (the
  * UrlKernel.PslSets convention): an Array field compares by reference,
  * so two bindings of the same centroid table would never canonicalize
  * equal and Catalyst's subexpression elimination could not dedup the
  * per-row distance loop. The Array form the kernel wants is derived once
  * lazily.
  */
case class SqDistsExpr(child: Expression, cents: IndexedSeq[IndexedSeq[Double]])
  extends UnaryExpression {

  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_sq_dists expects array<double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorKernel.sqDists(v.asInstanceOf[ArrayData], centsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", centsArr, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorKernel.sqDists($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqDistsExpr {
  def apply(v: Column, cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(new SqDistsExpr(
      ColumnBridge.expression(v), cents.map(_.toIndexedSeq).toIndexedSeq))
}
