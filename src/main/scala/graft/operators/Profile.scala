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
}
