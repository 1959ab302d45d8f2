package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-analytics operators: gap-based sessionization, ordered funnel
  * conversion, and cohort retention — the product-analytics trio every
  * event warehouse serves (reference analog: the API's timeseries/summary
  * endpoints aggregate the same events table, `api/main.py`; these extend
  * that surface to the stateful per-user shapes).
  *
  * Scale notes common to all three: every operator keys its windows and
  * joins on `user_id` alone, so the whole computation is ONE hash exchange
  * of the events table; follow-up groupBys on `(user_id, …)` refinements
  * satisfy their clustering from the same partitioning (HashPartitioning
  * on a subset satisfies ClusteredDistribution on the superset), and
  * per-user state never materializes more than the user's own rows.
  */
object Analytics {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DecimalType(38, 6))

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapSeconds`. One window (lag + running sum
    * over the SAME (user, order) spec → one sort, one exchange) numbers
    * sessions; the per-session rollup then groups by `(user, session_id)`,
    * which reuses the user-hash partitioning — the plan carries a single
    * Exchange end to end. Emits one row per session with span + exact
    * value total. `tieCol` breaks equal-timestamp orders so re-runs are
    * deterministic.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, valueCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        ((unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          / lit(1000000L)).cast("long").as("duration_s"),
        dsum(col(valueCol)).as("total_value"))
  }

  /** Ordered funnel: users must hit `steps(0)`, then `steps(1)` at or
    * after that first hit, and so on. Step k's per-user frontier is the
    * MIN qualifying timestamp, computed as one aggregate per step joined
    * back on `user_id` — every join and groupBy shares the user-hash key,
    * and each step's input is pre-filtered to that step's event type
    * before the shuffle (the filter reaches the scan). Emits one row per
    * step: users reaching it and conversion vs step 1.
    */
  def funnel(events: DataFrame, steps: Seq[String], typeCol: String,
             userCol: String, tsCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // per-user frontier frames, step k gated on step k-1's frontier; all
    // LAZY — the whole funnel is one job, no driver-side count loop
    val frontiers = steps.tail.scanLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))) {
      (prev, step) =>
        events.filter(col(typeCol) === step)
          .join(prev, userCol)
          .filter(col(tsCol) >= col("__t"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    val perStep = frontiers.zip(steps).zipWithIndex.map {
      case ((f, step), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_order"), lit(step).as("step"),
            col("n_users"))
    }
    val all = perStep.reduce(_.unionByName(_))
    val base = all.filter(col("step_order") === 1)
      .select(col("n_users").as("__base"))
    all.crossJoin(broadcast(base))
      .select(col("step_order"), col("step"), col("n_users"),
        round(lit(100.0) * col("n_users") / col("__base"), 4)
          .as("conv_pct"))
  }

  /** Cohort retention at weekly grain: cohort = Monday-truncated week of
    * the user's first event; a user is retained at offset k if they have
    * any event in cohort-week + k. First-touch and activity frames both
    * key on `user_id` (one exchange each, AQE-coalesced); the final
    * (cohort, offset) rollup is tiny (weeks², not users). Retention is
    * reported against the cohort's own size, exact.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .distinct()
    val cells = active.join(first, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("cohort_size"),
        round(lit(100.0) * col("n_users") / col("cohort_size"), 4)
          .as("retention_pct"))
  }
}
