package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.DotExpr

/** Distributed top-principal-component fit via power iteration — the
  * "project embeddings onto their dominant direction" step of embedding
  * curation (outlier pruning, 1-D curriculum ordering, drift monitoring).
  * Uncentered PCA: the iterate is `w ← (1/n)·Σ x·(x·w)` — the leading
  * eigenvector of the Gram matrix `XᵀX/n`, which for the usual
  * mean-free/normalized embedding tables coincides with PCA's PC1.
  *
  * Bit-reproducibility is designed in exactly like
  * [[Classifier.fitHardSigmoid]], so an external engine can replay the
  * fit and hash-match every weight:
  *  - each per-row, per-dimension update term `(x·w)·x_j` is floored onto
  *    the dyadic 2⁻²⁰ grid and summed as a LONG — an integer sum is
  *    fold-order-free across any partitioning;
  *  - the row dot `x·w` is an ascending-index left fold ([[DotExpr]]),
  *    the same operation order as an oracle's `list_inner_product`;
  *  - the update `w_j = (g_j/2²⁰)/n` and the final unit normalization
  *    `w/√(w·w)` (again an ascending fold) are fixed IEEE expression
  *    trees over exact-integer inputs — identical on any engine.
  *  The long accumulator bounds the corpus at `n·max|{(x·w)·x_j}|·2²⁰ <
  *  2⁶³` rows per round (~10¹² unit-normalized rows); shard or rescale
  *  past that.
  *
  * Scale shape: each round is ONE scan + ONE `dim`-group aggregation —
  * partial sums combine map-side, so the shuffle carries `dim ×
  * partitions` longs, never rows; the driver holds only the
  * `dim`-element iterate between rounds (the k-means k·d precedent).
  * The apply side ([[project]]) is a pure codegen scan expression.
  */
object Pca {

  /** 2²⁰ — the update-term quantization grid (see class doc). */
  val GridScale = 1048576.0

  /** One power-iteration round as a LAZY aggregate frame:
    * `(pos BIGINT, g LONG, n LONG)` where `g = Σ floor((x·w)·x_pos·2²⁰)`
    * over the corpus. `vecCol` must already be `array<double>`. */
  def iterFrame(df: DataFrame, vecCol: String, w: Array[Double]): DataFrame =
    df.select(DotExpr(col(vecCol), typedLit(w.toSeq)).as("d"),
        col(vecCol).as("__v"))
      .select(col("d"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(sum(floor(col("d") * col("x") * lit(GridScale))).as("g"),
        count(lit(1)).as("n"))

  /** Run `iters` rounds from the all-ones start; returns the RAW
    * (unnormalized) iterate of each round — round k's vector is exactly
    * `(g/2²⁰)/n` of its aggregate, so callers can re-derive any round's
    * frame lazily. One collect of `dim` longs per round. */
  def fitRounds(df: DataFrame, vecCol: String, dim: Int,
                iters: Int): Seq[Array[Double]] = {
    require(dim > 0 && iters >= 1, "need dim > 0 and iters >= 1")
    var w = Array.fill(dim)(1.0)
    (1 to iters).map { _ =>
      val rows = iterFrame(df, vecCol, w).collect()
      require(rows.nonEmpty, "pca fit: cannot fit on an empty frame")
      val next = new Array[Double](dim)
      rows.foreach { r =>
        next(r.getLong(0).toInt) =
          (r.getLong(1).toDouble / GridScale) / r.getLong(2)
      }
      w = next
      w
    }
  }

  /** Ascending-index left-fold dot — the scalar twin of [[DotExpr]] /
    * an oracle's `list_inner_product`, for driver-side normalization. */
  private def foldDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** `w/√(w·w)` with the fold order pinned (see class doc). */
  def unitize(w: Array[Double]): Array[Double] = {
    val norm = math.sqrt(foldDot(w, w))
    require(norm > 0.0, "pca unitize: zero vector")
    w.map(_ / norm)
  }

  /** Per-row PC1 projection in 2⁻²⁰ fixed point (LONG — hash-exact):
    * `floor((x·w)·2²⁰)` for a trained unit component, pure codegen. */
  def project(vecCol: Column, wUnit: Array[Double]): Column =
    floor(DotExpr(vecCol, typedLit(wUnit.toSeq)) * lit(GridScale))
      .cast("long")
}
