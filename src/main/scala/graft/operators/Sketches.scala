package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming-friendly summary sketches for corpus statistics at 100 TB:
  * count-min for heavy hitters (frequent tokens / boilerplate phrases /
  * hot URLs), HyperLogLog for cardinalities, quantile sketches for score
  * distributions. All three aggregate map-side into fixed-size state — the
  * shuffle ships sketch cells, never raw occurrences.
  */
object Sketches {

  /** Kirsch–Mitzenmacher double-hashing bucket for CMS row `j`:
    * `(h1 + j·h2) mod width`, h1/h2 the corpus fingerprint polynomial of the
    * term and of term+"#". `width` must be a power of two so Java's silent
    * 64-bit wrap in `h1 + j·h2` is congruent to the unsigned sum mod width
    * (2⁶⁴ ≡ 0 mod 2^k) — which is also what lets the DuckDB oracle compute
    * the same bucket in HUGEINT. */
  private def bucket(term: Column, j: Int, width: Int): Column =
    pmod(TextFunctions.fingerprint64Udf(term) +
      lit(j.toLong) * TextFunctions.fingerprint64Udf(concat(term, lit("#"))),
      lit(width.toLong))

  /** Count-min sketch cells over a token column: `depth × width` counters,
    * `cell(j, b) = Σ count(term) where bucket_j(term) = b`.
    *
    * Two-level aggregation: occurrences first collapse to (term, count) —
    * ONE corpus-wide shuffle keyed by term with map-side partials — and
    * only the vocabulary-sized frame is hashed (the fingerprint UDF runs
    * per distinct term × depth, never per occurrence) and re-aggregated
    * into the d·w cell grid. The cell table is the sketch: fixed size,
    * mergeable across shards/days by cell-wise addition.
    */
  def cmsCells(terms: DataFrame, termCol: String,
               depth: Int, width: Int): DataFrame =
    cellsFromCounts(terms.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("cnt")), depth, width)

  /** (j, bucket) explode + cell sum over a (term, cnt) frame. */
  private def cellsFromCounts(counts: DataFrame,
                              depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2 && (width & (width - 1)) == 0,
      s"need power-of-two width (got $width) and depth >= 1 (got $depth)")
    counts
      .select(col("cnt"), explode(jbArray(depth, width)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(sum("cnt").as("cell"))
  }

  /** The depth buckets of the `term` column as (j, b) structs. */
  private def jbArray(depth: Int, width: Int): Column =
    array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(col("term"), j, width).as("b"))): _*)

  /** Heavy hitters with their CMS estimate: tokens whose EXACT corpus count
    * meets `threshold`, alongside the count-min estimate `min_j cell(j,
    * bucket_j)` — `est ≥ exact` always (CMS never undercounts), and the gap
    * is the sketch's collision noise. Emitting both makes the one-sided
    * error auditable row by row (and lets the oracle certify the whole
    * sketch pipeline, not just the counts).
    *
    * The cell grid (depth·width rows) broadcasts onto the candidate list;
    * at scale the candidate list is vocabulary-sized, the grid is constant.
    */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, threshold: Long,
                      depth: Int = 4, width: Int = 1024): DataFrame = {
    val terms = docs.select(
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    // persisted: the exact-count subtree and the sketch subtree both read
    // the occurrence stream (released via CacheRegistry)
    val counts = graft.CacheRegistry.register(
      terms.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cells = cellsFromCounts(
      counts.select(col("term"), col("exact_cnt").as("cnt")), depth, width)
    val candidates = counts.filter(col("exact_cnt") >= threshold)
      .select(col("term"), col("exact_cnt"), explode(jbArray(depth, width)).as("jb"))
      .select(col("term"), col("exact_cnt"),
        col("jb.j").as("j"), col("jb.b").as("b"))
    candidates.join(broadcast(cells), Seq("j", "b"))
      .groupBy("term", "exact_cnt")
      .agg(min("cell").as("cms_est"))
      .select(col("term"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).as("never_undercounts"))
  }

  /** Per-group approximate distincts (HyperLogLog++) next to nothing else —
    * the constant-memory alternative to a13's exact count-distinct when the
    * key cardinality itself is huge. relativeSD 0.02 ≈ 1.5 KB of state per
    * group regardless of input size. */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  relativeSD: Double = 0.02): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(keyCol), relativeSD).as("approx_distinct"))

  /** Certification query for [[hllDistinct]]: the sketch estimate next to
    * the exact distinct count and a `within_bound` verdict (±`bound`
    * relative error — generous vs HLL++'s 2% standard deviation at
    * relativeSD 0.02). The approx value itself is folded into the boolean
    * so the row is hash-checkable against an exact-side oracle that cannot
    * reproduce HLL's register noise: `(group, exact_distinct, TRUE)`. One
    * aggregation computes both sides — the exact branch is the same single
    * shuffle a13 already pays; the audit is a bounded-cardinality frame. */
  def hllDistinctAudit(df: DataFrame, groupCol: String, keyCol: String,
                       relativeSD: Double = 0.02,
                       bound: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"),
        approx_count_distinct(col(keyCol), relativeSD).as("approx_distinct"))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct")).cast("double")
          <= lit(bound) * col("exact_distinct").cast("double"))
          .as("within_bound"))

  /** Per-group approximate quantiles (the Greenwald–Khanna sketch behind
    * `percentile_approx`) — mergeable fixed-size state, vs the exact
    * `percentile` which buffers every value per group. */
  def approxQuantiles(df: DataFrame, groupCol: String, valCol: String,
                      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valCol),
        typedLit(probabilities), lit(accuracy)).as("quantiles"))

  /** Certification query for [[approxQuantiles]]: one row per (group, p)
    * with the EXACT interpolated quantile and a GK rank-error verdict.
    *
    * Hash-checkability without rounding: `exact_q` is assembled from two
    * ranked values as `vlo + (vhi − vlo)·frac` with `frac = (n−1)·p − lo` —
    * the identical IEEE-double expression an oracle can evaluate from its
    * own row_number frame, so both sides agree to the last ulp (the
    * determinism rule in Queries.scala). The sketch's output never appears
    * raw: GK guarantees rank error ≤ n/accuracy, so the audit counts
    * values ≤ the approx quantile and folds |rank − p·n| ≤ n/accuracy + 1
    * into `within_bound` (the +1 absorbs rank discreteness).
    *
    * Scale shape: the sketch side is the mergeable one-pass aggregate; the
    * exact side (row_number per group) is the audit's cost and exists only
    * to certify — production code calls [[approxQuantiles]]. */
  def approxQuantilesAudit(df: DataFrame, groupCol: String, valCol: String,
                           probabilities: Seq[Double],
                           accuracy: Int = 10000): DataFrame = {
    val ev = df.select(col(groupCol), col(valCol).as("__v"))
    val grp = ev.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      percentile_approx(col("__v"), typedLit(probabilities), lit(accuracy))
        .as("__aq"))
    val tgt = grp
      .select(col(groupCol), col("__n"),
        posexplode(arrays_zip(typedLit(probabilities).as("p"),
          col("__aq").as("aq"))))
      .select(col(groupCol), col("__n"), col("col.p").as("p"),
        col("col.aq").as("__approx_q"))
      .withColumn("__idx", (col("__n") - 1).cast("double") * col("p"))
      .withColumn("__lo", floor(col("__idx")).cast("long"))
      .withColumn("__hi", ceil(col("__idx")).cast("long"))
    val ranked = ev.withColumn("__r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("__v"))).cast("long"))
    // GK's guarantee applies to SOME rank of the returned value; with
    // duplicates the value occupies the whole rank interval
    // [count(<q)+1, count(<=q)], so the audit measures the distance from
    // the target rank p·n to that interval — checking only its upper end
    // would flag legitimate answers whenever ties straddle the quantile
    ranked.join(broadcast(tgt), groupCol)
      .groupBy(col(groupCol), col("p"), col("__n"), col("__idx"),
        col("__lo"), col("__approx_q"))
      .agg(
        max(when(col("__r") === col("__lo") + 1, col("__v"))).as("__vlo"),
        max(when(col("__r") === col("__hi") + 1, col("__v"))).as("__vhi"),
        count(when(col("__v") < col("__approx_q"), 1)).as("__rkLt"),
        count(when(col("__v") <= col("__approx_q"), 1)).as("__rkLe"))
      .select(col(groupCol), col("p"),
        (col("__vlo") + (col("__vhi") - col("__vlo"))
          * (col("__idx") - col("__lo").cast("double"))).as("exact_q"),
        (greatest(
          (col("__rkLt") + 1).cast("double") - col("p") * col("__n").cast("double"),
          col("p") * col("__n").cast("double") - col("__rkLe").cast("double"),
          lit(0.0))
          <= col("__n").cast("double") / accuracy + 1).as("within_bound"))
  }
}
