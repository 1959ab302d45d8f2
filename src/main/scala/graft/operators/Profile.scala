package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column data-quality metrics over an arbitrary
  * schema — the "what did I just ingest" primitive of a pipeline.
  *
  * Single pass: one wide aggregate computes every column's metrics
  * simultaneously (Catalyst plans the n distinct aggregates as one Expand +
  * partial/final aggregation — one shuffle, map-side combined), then the
  * 1×(3n) row is unpivoted driver-side into n rows. Exact distinct counts
  * are what the correctness oracle can check; at 100 TB swap
  * `countDistinct` for `approx_count_distinct` (HLL) — the Expand factor n
  * on the fact table is the scale cost of exactness.
  */
object Profile {

  /** (column, n_rows, n_nulls, n_distinct) per profiled column.
    * `n_distinct` counts non-null distinct values (SQL COUNT(DISTINCT)
    * semantics). Column order of the output follows `cols`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single metrics row: stack(n, 'c1', rows1, nulls1, dist1, ...)
    val stackArgs = cols.map(c =>
      s"'$c', `__rows_$c`, `__nulls_$c`, `__dist_$c`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) as (col_name, n_rows, n_nulls, n_distinct)")
  }
}
