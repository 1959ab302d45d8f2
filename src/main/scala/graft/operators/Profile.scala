package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column data-quality metrics over an arbitrary
  * schema — the "what did I just ingest" primitive of a pipeline.
  *
  * Single pass, NO Expand: n `countDistinct`s would make Catalyst rewrite
  * through an Expand that multiplies the scanned row stream ×n before the
  * shuffle; instead each column's exact distinct count is
  * `size(collect_set)` — one plain aggregate, map-side set partials, one
  * 1-row shuffle of n sets. Exact distincts must materialize each
  * column's value set somewhere; the set partials bound that by the
  * per-column CARDINALITY (not the row count ×n the Expand scans), and at
  * 100 TB, where a high-cardinality column's set itself is the problem,
  * swap in `approx_count_distinct` (HLL) — same one-job shape, constant
  * state. The 1×(3n) row is then unpivoted driver-side into n rows.
  */
object Profile {

  /** (column, n_rows, n_nulls, n_distinct) per profiled column.
    * `n_distinct` counts non-null distinct values (SQL COUNT(DISTINCT)
    * semantics — collect_set likewise skips nulls). Column order of the
    * output follows `cols`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        size(collect_set(col(c))).cast("long").as(s"__dist_$c"))
    }
    val wide = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // unpivot the single metrics row: stack(n, 'c1', rows1, nulls1, dist1, ...)
    val stackArgs = cols.map(c =>
      s"'$c', `__rows_$c`, `__nulls_$c`, `__dist_$c`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (col_name, n_rows, n_nulls, n_distinct)")
  }

  /** Snapshot diff: what changed between two corpus versions — the audit a
    * pipeline runs after every rebuild ("this refresh added X, dropped Y,
    * rewrote Z") and the input to incremental re-training decisions.
    *
    * Rows pair on `idCol`; change detection compares a 16-byte md5 of the
    * `contentCols` computed MAP-SIDE on each snapshot, so full content
    * never reaches the join shuffle — at 100 TB the exchange carries
    * (id, digest, dims), not documents. One full-outer hash join on the id,
    * then a partial-aggregated rollup by `dimCols` (taken from whichever
    * side has the row).
    *
    * Output: per dim-combination counts `n_added`, `n_removed`,
    * `n_changed`, `n_unchanged`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String], dimCols: Seq[String]): DataFrame = {
    def sided(df: DataFrame, tag: String): DataFrame =
      df.select(
        col(idCol).as(s"${tag}_id") +:
          unhex(md5(concat_ws("", contentCols.map(col): _*))).as(s"${tag}_sig") +:
          dimCols.map(c => col(c).as(s"${tag}_$c")): _*)
    val joined = sided(oldDf, "o")
      .join(sided(newDf, "n"), col("o_id") === col("n_id"), "full_outer")
    val dims = dimCols.map(c => coalesce(col(s"n_$c"), col(s"o_$c")).as(c))
    joined
      .select(dims :+
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("o_sig") =!= col("n_sig"), "changed")
          .otherwise("unchanged").as("__st"): _*)
      .groupBy(dimCols.map(col): _*)
      .agg(
        sum(when(col("__st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("__st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** The drift operators' shared quantization — floor is IEEE-deterministic
    * and both engines (and both operators' DuckDB oracles) must stay on
    * the SAME expression or bin keys silently desynchronize. */
  private def valueBin(valueCol: String, binsPerUnit: Int) =
    floor(col(valueCol) * binsPerUnit).cast("long")

  /** Two-sample Kolmogorov–Smirnov drift statistic between the `valueCol`
    * distributions of two groups — the batch-vs-batch distribution-shift
    * audit a training pipeline runs before admitting a new data drop.
    *
    * Exact integer arithmetic end-to-end: values are quantized to
    * `binsPerUnit` bins (floor, an IEEE-deterministic op both engines
    * share), both groups are counted in ONE hash aggregate (single
    * shuffle), and the ECDF gap is computed as `|cumA·nB − cumB·nA|` over
    * the BIN frame — whose cardinality is bounded by value-range ×
    * binsPerUnit, so the one total-order window is ranking-sized, never
    * corpus-sized (the quality_ccnet_buckets discipline). The supremum row
    * ships as exact integers plus a derived 1e-6-unit KS statistic;
    * `ks_e6 = |cumA·nB − cumB·nA| · 10⁶ / (nA·nB)` stays inside BIGINT for
    * nA·nB ≤ 9.2e12 — past that, flip the final division to DOUBLE (the
    * integer numerator is the part that must stay exact).
    *
    * Output (EXACTLY 1 row, even on empty input): n_a, n_b, ks_num,
    * bin_at_max (lowest bin attaining the supremum), ks_e6, valid. `valid`
    * is false when either group has ZERO rows — there ks_num degenerates
    * to 0 ("no drift") and ks_e6 to NULL, which is exactly the batch an
    * admission gate must NOT wave through on the ks columns alone (a
    * missing comparison sample is the most suspicious input there is, not
    * the least). When BOTH groups are absent the bin frame itself is empty;
    * a constant `valid=false` fallback row is unioned in so a gate reading
    * the flag always has a row to read.
    */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              groupA: String, groupB: String, binsPerUnit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .select(valueBin(valueCol, binsPerUnit).as("bin"),
        col(groupCol).as("__g"))
    val counts = binned.groupBy("bin").agg(
      sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("cb"))
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val top = counts
      .select(col("bin"),
        sum("ca").over(cum).as("cum_a"), sum("cb").over(cum).as("cum_b"),
        sum("ca").over(all).as("n_a"), sum("cb").over(all).as("n_b"))
      .select(col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")).as("ks_num"),
        col("bin").as("bin_at_max"))
      .orderBy(col("ks_num").desc, col("bin_at_max").asc)
      .limit(1)
      .withColumn("ks_e6",
        expr("ks_num * 1000000 div (n_a * n_b)"))
      .withColumn("valid", col("n_a") > 0 && col("n_b") > 0)
    // degenerate-input guard: empty bin frame → 0 rows upstream; union a
    // constant invalid row and keep the real row (when present) via a
    // 2-row marker sort — no driver-side isEmpty probe, no extra job
    val fallback = df.sparkSession.range(1).select(
      lit(0L).as("n_a"), lit(0L).as("n_b"), lit(0L).as("ks_num"),
      lit(null).cast("long").as("bin_at_max"),
      lit(null).cast("long").as("ks_e6"), lit(false).as("valid"))
    top.withColumn("__real", lit(1))
      .unionByName(fallback.withColumn("__real", lit(0)))
      .orderBy(col("__real").desc).limit(1).drop("__real")
  }

  /** Per-time-window histogram drift vs a REFERENCE distribution — the
    * monitor form of [[ksDrift]]: instead of one two-sample verdict, every
    * event-time window gets an L1 (total-variation) distance against the
    * reference, the dashboard line a pipeline alarms on when an arriving
    * source shifts.
    *
    * Exact integer arithmetic throughout. Per window w with bin counts
    * cnt(b) and reference counts ref(b):
    *   driftNum(w) = Σ_b |cnt(b)·refTot − ref(b)·winTot|
    * over the UNION of bins — bins present only in the reference are
    * folded in closed form ((refTot − Σ_matched ref)·winTot), so no outer
    * join materializes the bin union. tv_e6 = driftNum·10⁶/(2·winTot·refTot)
    * stays inside BIGINT while winTot·refTot ≤ 4.6e12 (driftNum ≤
    * 2·winTot·refTot) — past that, flip the final division to DOUBLE;
    * the integer numerator is the part that must stay exact.
    * ∈ [0, 10⁶] is the total-variation distance in 1e-6 units.
    *
    * Scale shape: ONE corpus aggregate to (window, bin) counts; everything
    * after runs on that bounded frame (windows × value-range·binsPerUnit),
    * with the reference bins broadcast. The (window, bin) aggregate is the
    * same shape Structured Streaming runs with a watermark, so the monitor
    * drops into a streaming pipeline unchanged downstream of it.
    */
  def histDriftWindows(monitored: DataFrame, reference: DataFrame,
                       valueCol: String, tsCol: String,
                       windowSeconds: Int, binsPerUnit: Int): DataFrame = {
    val refBins = reference.filter(col(valueCol).isNotNull)
      .groupBy(valueBin(valueCol, binsPerUnit).as("bin"))
      .agg(count(lit(1)).as("ref_n"))
    // 1-row total, carried onto the bounded bin frames as a literal-free
    // broadcast (cheaper than threading a scalar subquery through codegen)
    val refTotDf = refBins.agg(sum("ref_n").as("ref_tot"))
    val winBin = monitored.filter(col(valueCol).isNotNull)
      .groupBy(
        (floor(col(tsCol).cast("long") / windowSeconds) * windowSeconds)
          .cast("long").as("win_start"),
        valueBin(valueCol, binsPerUnit).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // win_tot via a win_start-PARTITIONED window over the already-aggregated
    // bin frame — not a second aggregate of winBin, whose deduplication
    // would otherwise hinge on ReuseExchange firing (and scan the corpus
    // twice when it doesn't)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("win_start")
    winBin
      .join(broadcast(refBins), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n"))
      .crossJoin(broadcast(refTotDf))
      .withColumn("win_tot", sum("cnt").over(wTot))
      .groupBy("win_start")
      .agg(
        first("win_tot").as("n"),
        first("ref_tot").as("__rt"),
        sum(abs(col("cnt") * col("ref_tot") - col("ref_n") * col("win_tot")))
          .as("__matched_abs"),
        sum(col("ref_n")).as("__matched_ref"))
      .select(col("win_start"), col("n"),
        (col("__matched_abs") +
          (col("__rt") - col("__matched_ref")) * col("n")).as("drift_num"),
        col("__rt"))
      .withColumn("tv_e6", expr("drift_num * 1000000 div (2 * n * __rt)"))
      // an empty/all-null reference yields NULL __rt → NULL drift columns;
      // the flag keeps the degenerate case loud (the ksDrift lesson: a
      // missing comparison sample must never read as "no drift")
      .withColumn("valid", col("__rt").isNotNull && col("__rt") > 0 && col("n") > 0)
      .drop("__rt")
  }
}
