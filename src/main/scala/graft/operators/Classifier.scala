package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of a linear quality classifier — the "train a
  * fastText-style quality filter over the corpus" step of CCNet/FineWeb
  * pipelines, expressed as full-batch gradient descent where each
  * iteration is ONE map-side-combined aggregation over the corpus.
  *
  * Determinism is designed in so an external engine can replay training
  * bit-for-bit (the k-means-fit precedent):
  *  - the activation is the HARD sigmoid `clamp(0.5 + z/4, 0, 1)` — only
  *    +, ×, min, max, no exp/log, so per-row values are IEEE-identical on
  *    any engine;
  *  - each per-row gradient term is floored onto the dyadic 2⁻²⁰ grid
  *    (multiply/divide by a power of two is EXACT in binary floating
  *    point, floor is exact) and summed as a LONG — an integer sum is
  *    fold-order-free, so partial aggregation across any number of
  *    partitions gives the identical gradient; the one long→double
  *    conversion afterwards is IEEE round-to-nearest on both engines;
  *  - the weight update `w − lr·(g/n)` is the same literal expression
  *    everywhere.
  *  The long gradient accumulator bounds the corpus at ~2×10¹² rows per
  *  fit (|term| ≤ 4 ⇒ |Σ| ≤ 4n·2²⁰ must stay below 2⁶³); past that,
  *  shard the fit or raise the grid — the 100 TB swap is per-partition
  *  grid sums combined as exact integers either way.
  *
  * Scale shape: one aggregation job per iteration; the driver holds only
  * the (features+1)-element weight vector between iterations (like
  * k-means' k·d centroids). The corpus is never collected.
  */
object Classifier {

  /** 2²⁰ — the gradient quantization grid (see class doc). */
  val GridScale = 1048576.0

  private def hardSigmoid(z: Column): Column =
    least(greatest(lit(0.5) + z / lit(4.0), lit(0.0)), lit(1.0))

  private def dot(xs: Seq[Column], w: Array[Double]): Column =
    xs.zip(w).map { case (x, wi) => x * lit(wi) }.reduce(_ + _)

  /** One training run; returns (weights incl. bias at index 0, rows). */
  def fitHardSigmoid(df: DataFrame, label: Column, features: Seq[Column],
                     lr: Double, iters: Int): (Array[Double], Long) = {
    require(features.nonEmpty && iters >= 1, "need >=1 feature and iteration")
    val xs = lit(1.0) +: features // bias rides as feature 0
    var w = Array.fill(xs.size)(0.0)
    var n = 0L
    (0 until iters).foreach { _ =>
      val p = hardSigmoid(dot(xs, w))
      val gs = xs.zipWithIndex.map { case (x, i) =>
        // Spark's floor(double) is already LongType — the exact grid sum
        sum(floor((p - label) * x * lit(GridScale))).as(s"g$i")
      }
      val row = df.agg(gs.head, (gs.tail :+ count(lit(1)).as("n")): _*).head()
      n = row.getLong(xs.size)
      // empty frame ⇒ the gradient sums are NULL and n = 0 — fail loudly
      // instead of NPE-ing on getLong / dividing by zero
      require(n > 0, "fitHardSigmoid: cannot fit on an empty frame")
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - lr * ((row.getLong(i).toDouble / GridScale) / n)
      }
    }
    (w, n)
  }

  /** Per-row model score p ∈ [0, 1] for a trained weight vector — the
    * apply-side column (row-local codegen, no shuffle). */
  def score(features: Seq[Column], w: Array[Double]): Column =
    hardSigmoid(dot(lit(1.0) +: features, w))

  /** Training-set accuracy of a weight vector (predict 1 ⟺ p ≥ 0.5). */
  def accuracy(df: DataFrame, label: Column, features: Seq[Column],
               w: Array[Double]): DataFrame = {
    val p = score(features, w)
    df.agg(
      count(when((p >= 0.5).cast("double") === label, 1)).as("n_correct"),
      count(lit(1)).as("n"))
  }
}
