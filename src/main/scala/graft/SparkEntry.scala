package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full query inventory lives in [[Queries]]; this object is the stable
  * entry-point surface the harness invokes.
  */
object SparkEntry {

  /** Session settings every entry point needs: ANSI off (the reference's
    * semantics are permissive — casts/parses yield NULL on failure, e.g.
    * `coalesce(view_ts::date, file_date)` in sql/marts/10_*.sql:38), UTC,
    * and shuffle parallelism sized for local[32], not the 200 default.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS); map to long nanos instead of
    // failing the scan (converted back to µs timestamps in the reader).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // v2 file-output commit: task outputs move to the destination at task
    // commit instead of a second serial job-commit rename pass — the
    // many-small-writes pipeline rows are commit-bound, and the v1 pass
    // buys nothing on a non-atomic-rename filesystem anyway (the engine's
    // idempotent left-anti/overwrite semantics, not commit atomicity, are
    // what make re-runs safe — pipeline_idempotent pins that).
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    spark
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    configure(spark)
    Queries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(configure(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (custom hashes, LSH, heuristic classifiers) → rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
